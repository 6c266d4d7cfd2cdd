"""Runtime per-env actor scaling.

Counterpart of /root/reference/examples/actor_scaling.py:126 — the same asset
instanced at a different scale per env; heavier (bigger) balls are verified
through the mass params and the contact behavior.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("actor scaling", steps=120, num_envs=4)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
ball = gym.create_sphere(sim, 0.2, gymapi.AssetOptions())
envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 3), 2)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 1.5)), "ball", i, 0)
    envs.append(env)
    gym.set_actor_scale(env, 0, 0.5 + 0.5 * i)  # scales 0.5, 1.0, 1.5, 2.0

masses = [gym.get_actor_rigid_body_properties(e, 0)[0].mass for e in envs]
print("masses:", masses)
check(abs(masses[3] / masses[1] - 8.0) < 1e-3, "mass scales with scale^3")

for _ in range(args.steps):
    gym.simulate(sim)
root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
gym.refresh_actor_root_state_tensor(sim)
rest_z = np.asarray(root[:, 2])
print("rest heights:", rest_z)
expected = 0.2 * np.array([0.5, 1.0, 1.5, 2.0])
check(np.allclose(rest_z, expected, atol=0.05), "rest height tracks scaled radius")
print("actor_scaling OK")
