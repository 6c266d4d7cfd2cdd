"""FEM soft body: URDF `<fem>` link + rigid press mechanism.

Counterpart of /root/reference/examples/soft_body.py: the icosphere.urdf
asset (prismatic rail press + tet-mesh FEM sphere), per-env randomized
Young's/Poisson/damping materials (:120-133, random.seed(7) :34), and the
tet/tri introspection loop computing per-triangle surface force density from
the parent tet's stress (:160-186). The FleX solver params (:40-44) map onto
the XPBD iteration budget (physics/soft.py).

Headless PASS checks: the sphere drops and settles on the ground plane,
materials randomize per env, and stress x normal force densities are finite.
"""
import math
import random

import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("FEM Soft Body Example", steps=180, num_envs=4)

gym = gymapi.acquire_gym()

random.seed(7)  # reference :34

sim_params = gymapi.SimParams()
sim_params.dt = 1.0 / 60.0
sim_params.substeps = 3
sim_params.up_axis = gymapi.UP_AXIS_Y  # FleX examples run Y-up
sim_params.gravity = gymapi.Vec3(0.0, -9.8, 0.0)
sim_params.flex.solver_type = 5
sim_params.flex.num_outer_iterations = 4
sim_params.flex.num_inner_iterations = 20
sim_params.flex.relaxation = 0.8
sim_params.flex.warm_start = 0.75
sim_params.stress_visualization = True
sim_params.stress_visualization_min = 0.0
sim_params.stress_visualization_max = 1.0e5

sim = gym.create_sim(0, 0, gymapi.SIM_FLEX, sim_params)

plane_params = gymapi.PlaneParams()
plane_params.normal = gymapi.Vec3(0, 1, 0)
gym.add_ground(sim, plane_params)

asset_root = "/root/reference/assets"
soft_asset_file = "urdf/icosphere.urdf"

soft_thickness = 0.1  # reference :77 — collision margin vs interpenetration

asset_options = gymapi.AssetOptions()
asset_options.fix_base_link = True
asset_options.thickness = soft_thickness
asset_options.default_dof_drive_mode = gymapi.DOF_MODE_POS

soft_asset = gym.load_asset(sim, asset_root, soft_asset_file, asset_options)

asset_soft_body_count = gym.get_asset_soft_body_count(soft_asset)
asset_soft_materials = gym.get_asset_soft_materials(soft_asset)
check(asset_soft_body_count == 1, f"asset has 1 soft body ({asset_soft_body_count})")
mat0 = asset_soft_materials[0]
check(
    abs(mat0.youngs - 1e5) < 1 and abs(mat0.poissons - 0.45) < 1e-6,
    f"URDF materials parsed (youngs {mat0.youngs} poissons {mat0.poissons})",
)

num_envs = args.num_envs
spacing = 3.0
env_lower = gymapi.Vec3(-spacing, 0.0, -spacing)
env_upper = gymapi.Vec3(spacing, spacing, spacing)

envs, soft_actors = [], []
num_per_row = int(math.sqrt(num_envs))
for i in range(num_envs):
    env = gym.create_env(sim, env_lower, env_upper, num_per_row)
    envs.append(env)
    pose = gymapi.Transform()
    pose.p = gymapi.Vec3(0.0, 2.0, 0.0)
    soft_actor = gym.create_actor(env, soft_asset, pose, "soft", i, 1)
    soft_actors.append(soft_actor)
    # hold the press rail at its target (the reference relies on the FleX
    # backend's implicit joint hold; here the PD drive is explicit)
    props = gym.get_actor_dof_properties(env, soft_actor)
    props["driveMode"][:] = gymapi.DOF_MODE_POS
    props["stiffness"][:] = 1.0e7
    props["damping"][:] = 1.0e5
    props["effort"][:] = 1.0e6  # rail URDF has no <limit effort> (parses 0)
    gym.set_actor_dof_properties(env, soft_actor, props)
    gym.set_joint_target_position(
        env, gym.get_joint_handle(env, "soft", "rail"), 0.0
    )

# randomize materials around the asset defaults (reference :120-133)
for i, env in enumerate(envs):
    mats = gym.get_actor_soft_materials(env, soft_actors[i])
    for j in range(asset_soft_body_count):
        mats[j].youngs = random.uniform(mats[j].youngs * 0.2, mats[j].youngs * 2.4)
        mats[j].poissons = random.uniform(mats[j].poissons * 0.8, mats[j].poissons * 1.2)
        mats[j].damping = random.uniform(0.0, 0.08) ** 2
    ok = gym.set_actor_soft_materials(env, soft_actors[i], mats)
    check(ok, f"set_actor_soft_materials env {i}")

ys = [gym.get_actor_soft_materials(env, a)[0].youngs for env, a in zip(envs, soft_actors)]
check(len(set(round(y) for y in ys)) > 1, f"materials randomized per env ({[round(y) for y in ys]})")

for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)

# the reference's pressure loop (:160-186): per-surface-triangle force
# density = parent tet stress . normal
tet_indices, tet_stress = gym.get_sim_tetrahedra(sim)
tri_indices, tri_parents, tri_normals = gym.get_sim_triangles(sim)
check(len(tet_indices) == 427 * 4 * num_envs, f"tet indices ({len(tet_indices)})")
check(len(tet_stress) == 427 * num_envs, f"tet stress ({len(tet_stress)})")

forces = []
for env_i, env in enumerate(envs):
    tet_range = gym.get_actor_tetrahedra_range(env, soft_actors[env_i], 0)
    tri_range = gym.get_actor_triangle_range(env, soft_actors[env_i], 0)
    check(tet_range.count == 427 and tri_range.count == 320,
          f"env {env_i} ranges tets {tet_range.count} tris {tri_range.count}")
    for i in range(tri_range.start, tri_range.start + min(tri_range.count, 8)):
        parent = tri_parents[i]
        stress = np.asarray(tet_stress[parent])
        normal = np.asarray(tri_normals[i])
        forces.append(stress @ normal)
forces = np.asarray(forces)
check(np.isfinite(forces).all(), "surface force densities finite")

# settled on the plane: lowest vertex near the thickness margin, not sunk
soft_pos = np.asarray(sim.sim.state.soft_pos)
y_min = soft_pos[..., 1].min(axis=-1)
check(bool((y_min > -0.05).all() and (y_min < 0.35).all()),
      f"spheres rest on the plane (y_min {np.round(y_min, 3)})")
check(bool(np.isfinite(soft_pos).all()), "soft state finite")
print("soft_body OK")
