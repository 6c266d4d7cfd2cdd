"""Domain randomization: physics params, colors, lights, camera pose, images.

Counterpart of /root/reference/examples/domain_randomization.py:163-197
(every N frames: randomize camera pose, per-body colors, lights, dump an
image), plus the physics-side randomization the TPU build adds (PhysParams
are arrays, so mass/friction DR is a pure array update).
"""
import os

import numpy as np

from _common import check, example_args
import jax

from test_isaacgym_tpu import gymapi, randomize

args = example_args("domain randomization", steps=90, num_envs=2)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
ball = gym.create_sphere(sim, 0.25, gymapi.AssetOptions())
envs, cams = [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 3), 2)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 0.5)), "ball", i, 0)
    cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=64, height=48))
    gym.set_camera_location(cam, env, gymapi.Vec3(2, 0, 1), gymapi.Vec3(0, 0, 0.4))
    envs.append(env)
    cams.append(cam)
sim._ensure_built()

key = jax.random.PRNGKey(0)
out = "/tmp/tpu_gym_dr_images"
os.makedirs(out, exist_ok=True)
frames = []
f0 = np.asarray(sim.sim.params.shape_friction).copy()

for step in range(args.steps):
    if step % 30 == 0:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        # physics DR: friction + mass (pure array update on PhysParams)
        sim.sim.params = randomize.randomize_shape_friction(k1, sim.sim.params)
        sim.sim.params = randomize.randomize_body_mass(k2, sim.sim.params)
        # visual DR: colors, light, camera orbit pose
        sim._shape_color = np.asarray(randomize.randomize_colors(k3, sim._shape_color))
        color, ambient, d = randomize.randomize_light(k4)
        gym.set_light_parameters(
            sim, 0, gymapi.Vec3(*np.asarray(color)), gymapi.Vec3(*np.asarray(ambient)),
            gymapi.Vec3(*np.asarray(d)),
        )
        key, kc = jax.random.split(key)
        pos, tgt = randomize.randomize_camera_pose(kc, args.num_envs, (0, 0, 0.4))
        for e, env in enumerate(envs):
            gym.set_camera_location(
                cams[e], env, gymapi.Vec3(*np.asarray(pos[e])), gymapi.Vec3(*np.asarray(tgt[e]))
            )
        gym.render_all_camera_sensors(sim)
        img = gym.get_camera_image(sim, envs[0], cams[0], gymapi.IMAGE_COLOR)
        frames.append(img.copy())
        gym.write_camera_image_to_file(
            sim, envs[0], cams[0], gymapi.IMAGE_COLOR, f"{out}/frame_{step:04d}.png"
        )
    gym.simulate(sim)

check(len(frames) == 3, "rendered at each randomization epoch")
check(not np.array_equal(frames[0], frames[1]), "randomization changed the image")
f1 = np.asarray(sim.sim.params.shape_friction)
check(not np.allclose(f0, f1), "physics params randomized")
print("domain_randomization OK")
