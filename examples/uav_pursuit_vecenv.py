"""Batched UAV-car pursuit with visual servo — the native fast path.

Counterpart of /root/reference/test/test06_isaacgym_vecenv.py and
test10_servo_vecenv.py, expressed as one jitted scan (no tensor round-trips).
"""
import numpy as np

from _common import check, example_args
import jax
import jax.numpy as jnp

from test_isaacgym_tpu.envs.uav_car import UavCarEnv

args = example_args("uav pursuit vecenv", steps=600, num_envs=8)

env = UavCarEnv(num_envs=args.num_envs)
final, (pixels, rpy) = jax.jit(lambda s: env.rollout(args.steps, s))(env.init_state)

car = final.sim.root_pos[:, env.car_slot]
r = np.asarray(jnp.linalg.norm(car[:, :2] - env.target_w[:, :2], axis=1))
print("loiter radii:", r.round(2))
check(np.allclose(r, env.car_radius, atol=0.5), "cars loiter the target circle")

pix = np.asarray(env.car_pixel(final))
err = np.linalg.norm(pix - [env.cam_width / 2, env.cam_height / 2], axis=1)
print("servo pixel error:", err.round(3))
check((err < 2.0).all(), "visual servo keeps the car centered in every env")
print("uav_pursuit_vecenv OK")
