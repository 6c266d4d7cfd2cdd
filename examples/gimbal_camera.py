"""Gimbal camera on a 3-revolute DOF chain, POS-driven, with an attached
camera sensor and net-contact-force reads.

Counterpart of /root/reference/test12_add_joint.py.py: the custom
dof_test_camera.urdf (3 revolute joints base->yaw->pitch->camera :98-120),
DOF_MODE_POS drive (:75), camera attached to a gimbal body (:119), per-step
rigid-body-state and net-contact-force tensor reads (:128-194).
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("gimbal camera", steps=120, num_envs=4)

gym = gymapi.acquire_gym()
params = gymapi.SimParams()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, params)
gym.add_ground(sim, gymapi.PlaneParams())

opts = gymapi.AssetOptions()
opts.fix_base_link = True
opts.default_dof_drive_mode = gymapi.DOF_MODE_POS
asset = gym.load_asset(sim, "/root/reference/assets", "urdf/dof_test_camera.urdf", opts)
n_dofs = gym.get_asset_dof_count(asset)
check(n_dofs == 3, f"gimbal chain has 3 DOFs (got {n_dofs})")

envs, actors, cams = [], [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, -1), gymapi.Vec3(1, 1, 1), 2)
    a = gym.create_actor(
        env, asset, gymapi.Transform(gymapi.Vec3(0, 2.0, 3.0)), "gimbal", i, 1
    )
    props = gym.get_actor_dof_properties(env, a)
    props["driveMode"][:] = gymapi.DOF_MODE_POS
    props["stiffness"][:] = 400.0
    props["damping"][:] = 40.0
    gym.set_actor_dof_properties(env, a, props)
    cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=64, height=48))
    body = gym.get_actor_rigid_body_handle(env, a, 2)
    gym.attach_camera_to_body(
        cam, env, body, gymapi.Transform(), gymapi.FOLLOW_TRANSFORM
    )
    envs.append(env)
    actors.append(a)
    cams.append(cam)

gym.prepare_sim(sim)
rb = gymtorch.wrap_tensor(gym.acquire_rigid_body_state_tensor(sim))
ncf = gymtorch.wrap_tensor(gym.acquire_net_contact_force_tensor(sim))
yaw_dof = gym.find_actor_dof_handle(envs[0], actors[0], "camera_joint")
check(yaw_dof >= 0, "find_actor_dof_handle resolves the yaw joint")

yaw_target = np.deg2rad(60.0)
for step in range(args.steps):
    targets = np.zeros((args.num_envs, 3), np.float32)
    targets[:, 0] = yaw_target * min(1.0, step / 60.0)  # ramp the yaw
    gym.set_dof_position_target_tensor(sim, targets)
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.refresh_rigid_body_state_tensor(sim)

gym.step_graphics(sim)
gym.render_all_camera_sensors(sim)

# yaw link orientation follows the target (rigid body state read, test12:158)
from scipy.spatial.transform import Rotation as R

bodies_per_env = gym.get_actor_rigid_body_count(envs[0], actors[0])
q_yaw = np.asarray(rb[1, 3:7])  # body 1 = first gimbal link, env 0
yaw = R.from_quat(q_yaw).as_euler("xyz")[2]
check(abs(yaw - yaw_target) < 0.05, f"gimbal yaw tracked the POS target ({np.rad2deg(yaw):.1f} deg)")

# camera followed the gimbal body: its view axis yawed with the link
t = gym.get_camera_transform(sim, envs[0], cams[0])
cam_yaw = R.from_quat([t.r.x, t.r.y, t.r.z, t.r.w]).as_euler("xyz")[2]
check(abs(cam_yaw - yaw_target) < 0.08, f"attached camera yawed with the body ({np.rad2deg(cam_yaw):.1f} deg)")

# net contact force tensor: readable, finite, ~zero (fixed base in the air)
f = np.asarray(ncf)
check(np.isfinite(f).all(), "net contact force tensor is finite")
check(np.abs(f).max() < 1.0, f"no spurious contact on the airborne gimbal (max {np.abs(f).max():.3f})")

img = gym.get_camera_image(sim, envs[0], cams[0], gymapi.IMAGE_COLOR)
check(img.shape == (48, 64 * 4), "attached camera renders")
print("gimbal_camera OK")
