"""Procedural terrain: 8 generators, trimesh conversion, balls on terrain.

Counterpart of /root/reference/examples/terrain_creation.py:99-119.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch
from test_isaacgym_tpu import terrain_utils as tu

args = example_args("terrain", steps=200, num_envs=1)
np.random.seed(17)

hs, vs = 0.25, 0.005
rows = cols = 32


def new_sub():
    return tu.SubTerrain(width=rows, length=cols, vertical_scale=vs, horizontal_scale=hs)


# all 8 generators, stacked along x like the reference
fields = [
    tu.random_uniform_terrain(new_sub(), -0.2, 0.2, 0.2, 0.5),
    tu.sloped_terrain(new_sub(), slope=-0.5),
    tu.pyramid_sloped_terrain(new_sub(), slope=-0.5),
    tu.discrete_obstacles_terrain(new_sub(), 0.5, 1.0, 2.0, 20),
    tu.wave_terrain(new_sub(), num_waves=2.0, amplitude=1.0),
    tu.stairs_terrain(new_sub(), step_width=0.75, step_height=-0.5),
    tu.pyramid_stairs_terrain(new_sub(), step_width=0.75, step_height=-0.5),
    tu.stepping_stones_terrain(new_sub(), 1.0, 1.0, 0.5, platform_size=0.0),
]
heightfield = np.concatenate([f.height_field_raw for f in fields], axis=0)
print("heightfield:", heightfield.shape, heightfield.min(), heightfield.max())

verts, tris = tu.convert_heightfield_to_trimesh(heightfield, hs, vs, slope_threshold=1.5)
print("trimesh:", verts.shape, tris.shape)
check(len(verts) == heightfield.size and tris.max() < len(verts), "trimesh well-formed")

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
tm = gymapi.TriangleMeshParams()
tm.nb_vertices, tm.nb_triangles = verts.shape[0], tris.shape[0]
gym.add_triangle_mesh(sim, verts.flatten(), tris.flatten(), tm)

# drop a grid of balls over the pyramid-bowl section
ball = gym.create_sphere(sim, 0.2, gymapi.AssetOptions())
env = gym.create_env(sim, gymapi.Vec3(0, 0, 0), gymapi.Vec3(64, 8, 8), 1)
n = 0
for dx in (-1.0, 0.0, 1.0):
    for dy in (-1.0, 0.0, 1.0):
        x = 2 * rows * hs + rows * hs / 2 + dx  # pyramid_sloped section
        gym.create_actor(
            env, ball, gymapi.Transform(gymapi.Vec3(x, cols * hs / 2 + dy, 3.0)), f"b{n}", 0, 0
        )
        n += 1

root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
for _ in range(args.steps):
    gym.simulate(sim)
gym.refresh_actor_root_state_tensor(sim)
z = np.asarray(root[:, 2])
hf = sim.sim.scene.heightfield
print("final z:", z.round(3))
check((z > hf.data.min() - 0.05).all(), "no ball fell through the terrain")
check((z < 3.0).all(), "balls settled onto the terrain")
print("terrain_creation OK")
