"""Torch interop + GPU-pipeline camera tensors.

Counterpart of /root/reference/examples/interop_torch.py: forced GPU
pipeline (:47), camera image tensors via get_camera_image_gpu_tensor →
torch views (:115-120), start/end_access_image_tensors (:174,208), tensor
data_address (:136), FPS telemetry (:199-206). Here "GPU pipeline" is the
accelerator-resident pytree; wrap_tensor returns torch views of it.
"""
import time

import numpy as np
import torch

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("torch interop", steps=60, num_envs=4)

gym = gymapi.acquire_gym()
params = gymapi.SimParams()
params.use_gpu_pipeline = True  # interop_torch.py:47 forces it
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, params)
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions()
opts.density = 200.0
ball = gym.create_sphere(sim, 0.2, opts)
envs, cams = [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "ball", i, 0)
    cam_props = gymapi.CameraProperties(width=128, height=128, enable_tensors=True)
    cam = gym.create_camera_sensor(env, cam_props)
    gym.set_camera_location(cam, env, gymapi.Vec3(1.5, 0, 1), gymapi.Vec3(0, 0, 0.6))
    envs.append(env)
    cams.append(cam)

gym.prepare_sim(sim)
root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
check(isinstance(root, torch.Tensor), "wrap_tensor returns a torch view")
check(root.shape == (args.num_envs, 13), f"root state shape {tuple(root.shape)}")

frames = 0
t0 = time.time()
for step in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.step_graphics(sim)
    gym.render_all_camera_sensors(sim)
    gym.start_access_image_tensors(sim)
    img_t = gymtorch.wrap_tensor(
        gym.get_camera_image_gpu_tensor(sim, envs[0], cams[0], gymapi.IMAGE_COLOR)
    )
    gym.end_access_image_tensors(sim)
    frames += 1
fps = frames / (time.time() - t0)
print(f"rendered {frames} frames at {fps:.1f} fps (128x128, {args.num_envs} envs)")

check(tuple(img_t.shape) == (128, 128, 4), f"image tensor shape {tuple(img_t.shape)}")
check(img_t.dtype == torch.uint8, "RGBA8 image tensor")
addr = gym.get_camera_image_gpu_tensor(sim, envs[0], cams[0], gymapi.IMAGE_COLOR).data_address
check(addr != 0, f"tensor data_address exposed ({addr:#x})")
gym.refresh_actor_root_state_tensor(sim)
check(float(root[0, 2]) < 0.25, "ball fell to rest (torch view sees sim state)")
print("interop_torch OK")
