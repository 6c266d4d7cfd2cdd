"""Mesh-material loading: use_mesh_materials on/off pairs.

Counterpart of /root/reference/examples/graphics_materials.py:77-88
(same asset loaded twice, once trusting the mesh file's materials and once
overriding) and mesh_normal_mode COMPUTE_PER_VERTEX (:30). The v1 renderer
shades one albedo per shape, so mesh materials reduce to the MTL's mean
diffuse color; normals are analytic (per-kind exact), so normal modes are
accepted and documented as equivalent-or-better.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("graphics materials", steps=2, num_envs=2)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())

ASSET_ROOT = "/root/reference/assets"
FILE = "urdf/objects/cube_multicolor.urdf"

opts_on = gymapi.AssetOptions()
opts_on.fix_base_link = True
opts_on.use_mesh_materials = True
opts_on.mesh_normal_mode = gymapi.COMPUTE_PER_VERTEX
opts_off = gymapi.AssetOptions()
opts_off.fix_base_link = True
opts_off.use_mesh_materials = False

a_on = gym.load_asset(sim, ASSET_ROOT, FILE, opts_on)
a_off = gym.load_asset(sim, ASSET_ROOT, FILE, opts_off)

# one env with the on/off pair side by side (reference pairs them :77-88)
env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 1), 1)
gym.create_actor(env, a_on, gymapi.Transform(gymapi.Vec3(0, -0.12, 0.2)), "cube_on", 0, 0)
gym.create_actor(env, a_off, gymapi.Transform(gymapi.Vec3(0, 0.12, 0.2)), "cube_off", 0, 2)

cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=96, height=48))
gym.set_camera_location(cam, env, gymapi.Vec3(0.5, 0, 0.25), gymapi.Vec3(0, 0, 0.2))
gym.simulate(sim)
gym.fetch_results(sim, True)
gym.step_graphics(sim)
gym.render_all_camera_sensors(sim)

img = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR).reshape(48, 96, 4)
d = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_DEPTH)
cube_px = np.isfinite(d) & (d > -0.55)
check(cube_px.sum() > 50, f"camera sees the cubes ({cube_px.sum()} px)")
# the materials cube (left half of the image, -y side) vs default (right)
on_px = img[:, :48, :3][cube_px[:, :48]].astype(int)
off_px = img[:, 48:, :3][cube_px[:, 48:]].astype(int)
check(len(on_px) > 20 and len(off_px) > 20, "both cubes visible")
check(
    np.abs(on_px.mean(0) - off_px.mean(0)).max() > 10,
    "use_mesh_materials changes the rendered albedo (MTL mean Kd vs default)",
)
print("graphics_materials OK")
