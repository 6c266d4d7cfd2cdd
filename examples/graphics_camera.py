"""Camera sensors: color/depth/segmentation, textures, lights, image files.

Counterpart of /root/reference/examples/graphics.py:96-238 and
test/test02_isaacgym_camera.py (fixed + body-attached cameras, IMAGE_DEPTH
with -inf no-hit handling, texture from numpy buffer, light params).
"""
import os

import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("graphics", steps=30, num_envs=2)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions()
ball = gym.create_sphere(sim, 0.25, opts)
envs, fixed_cams, follow_cams = [], [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 3), 2)
    envs.append(env)
    a = gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 1.2)), "ball", i, 0, seg_id=7)
    # two cameras per env: one fixed, one following the ball (graphics.py:156-182)
    cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=96, height=64))
    gym.set_camera_location(cam, env, gymapi.Vec3(2.5, 0, 1.2), gymapi.Vec3(0, 0, 1.0))
    fixed_cams.append(cam)
    cam2 = gym.create_camera_sensor(env, gymapi.CameraProperties(width=64, height=64))
    body = gym.get_actor_rigid_body_handle(env, a, 0)
    gym.attach_camera_to_body(
        cam2, env, body, gymapi.Transform(gymapi.Vec3(-1.0, 0, 0.2)), gymapi.FOLLOW_TRANSFORM
    )
    follow_cams.append(cam2)

# texture from a numpy buffer (graphics.py:107-122) + per-body color
tex = np.zeros((8, 8, 4), np.uint8)
tex[:, :, 0] = 255
tex[:, :, 3] = 255
tex_id = gym.create_texture_from_buffer(sim, 8, 8, tex)
gym.set_rigid_body_texture(envs[0], 0, 0, gymapi.MESH_VISUAL, tex_id)
gym.set_rigid_body_color(envs[1], 0, 0, gymapi.MESH_VISUAL, gymapi.Vec3(0.1, 0.9, 0.1))
gym.set_light_parameters(
    sim, 0, gymapi.Vec3(0.9, 0.9, 0.9), gymapi.Vec3(0.2, 0.2, 0.2), gymapi.Vec3(-0.2, -0.3, -1)
)

for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.step_graphics(sim)
    gym.render_all_camera_sensors(sim)

rgb0 = gym.get_camera_image(sim, envs[0], fixed_cams[0], gymapi.IMAGE_COLOR).reshape(64, 96, 4)
rgb1 = gym.get_camera_image(sim, envs[1], fixed_cams[1], gymapi.IMAGE_COLOR).reshape(64, 96, 4)
check(not np.array_equal(rgb0, rgb1), "texture/color assignment differs across envs")

depth = gym.get_camera_image(sim, envs[0], fixed_cams[0], gymapi.IMAGE_DEPTH)
fin = np.isfinite(depth)
check((~fin).any(), "sky pixels are -inf (graphics.py:225-231 convention)")
check((depth[fin] < 0).all(), "depth values are negative view depth")

seg = gym.get_camera_image(sim, envs[0], fixed_cams[0], gymapi.IMAGE_SEGMENTATION)
check((seg == 7).any(), "segmentation image contains the actor's seg id")

follow = gym.get_camera_image(sim, envs[0], follow_cams[0], gymapi.IMAGE_DEPTH)
# body-attached camera rides 1 m behind / 0.2 m above the ball: the center
# ray grazes the ball at 1 - sqrt(r^2 - 0.2^2) = 0.85 m wherever the ball is
check(abs(-follow[32, 32] - 0.85) < 0.08, "attached camera tracks its body")

out = "/tmp/tpu_gym_example_images"
os.makedirs(out, exist_ok=True)
gym.write_camera_image_to_file(sim, envs[0], fixed_cams[0], gymapi.IMAGE_COLOR, f"{out}/cam0.png")
check(
    os.path.exists(f"{out}/cam0.png") or os.path.exists(f"{out}/cam0.png.npy"),
    "image written to file",
)
print("graphics_camera OK")
