"""Franka OSC circle tracking through the tensor API.

Counterpart of /root/reference/examples/franka_osc.py:215-245: per-env Franka
in EFFORT mode; jacobian + mass-matrix tensors drive an operational-space
controller tracking a circle with the hand. This script uses the
reference-style facade loop (torch on wrapped tensors); the native fast path
for the same workload is `test_isaacgym_tpu.envs.franka.FrankaOscEnv`
(bench.py).
"""
import numpy as np
import torch

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("franka OSC", steps=300, num_envs=4)
kp, kv = 5.0, 2.0 * np.sqrt(5.0)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions(fix_base_link=True)
opts.disable_gravity = True
franka = gym.load_asset(
    sim, "/root/reference/assets", "urdf/franka_description/robots/franka_panda.urdf", opts
)

default_dof = np.zeros(9, gymapi.DofState.dtype)
default_dof["pos"] = [0.0, 0.0, 0.0, -1.57, 0.0, 1.87, 0.0, 0.02, 0.02]

envs, hand_idxs, init_pos = [], [], []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
    envs.append(env)
    a = gym.create_actor(env, franka, gymapi.Transform(), "franka", i, 1)
    gym.set_actor_dof_states(env, a, default_dof, gymapi.STATE_ALL)
    props = gym.get_actor_dof_properties(env, a)
    props["driveMode"][:7] = gymapi.DOF_MODE_EFFORT
    props["stiffness"][:7] = 0.0
    props["damping"][:7] = 0.0
    props["driveMode"][7:] = gymapi.DOF_MODE_POS
    props["stiffness"][7:] = 800.0
    props["damping"][7:] = 40.0
    gym.set_actor_dof_properties(env, a, props)
    hand = gym.find_actor_rigid_body_handle(env, a, "panda_hand")
    pose = gym.get_rigid_transform(env, hand)
    init_pos.append([pose.p.x, pose.p.y, pose.p.z])
    hand_idxs.append(gym.find_actor_rigid_body_index(env, a, "panda_hand", gymapi.DOMAIN_SIM))

gym.prepare_sim(sim)
rb = gymtorch.wrap_tensor(gym.acquire_rigid_body_state_tensor(sim))
dof = gymtorch.wrap_tensor(gym.acquire_dof_state_tensor(sim))
jac = gymtorch.wrap_tensor(gym.acquire_jacobian_tensor(sim, "franka"))
mm = gymtorch.wrap_tensor(gym.acquire_mass_matrix_tensor(sim, "franka"))
hand_row = gym.get_asset_rigid_body_dict(franka)["panda_hand"] - 1  # fixed base
init_pos = torch.tensor(init_pos)

errs = []
for itr in range(args.steps):
    gym.refresh_rigid_body_state_tensor(sim)
    gym.refresh_dof_state_tensor(sim)
    gym.refresh_jacobian_tensors(sim)
    gym.refresh_mass_matrix_tensors(sim)

    pos_cur = rb[hand_idxs, :3]
    pos_des = init_pos.clone()
    pos_des[:, 0] -= 0.1
    pos_des[:, 1] += np.sin(itr / 50) * 0.15
    pos_des[:, 2] += np.cos(itr / 50) * 0.15

    j_eef = jac[:, hand_row, :, :7]
    mm7 = mm[:, :7, :7]
    dof_vel = dof.view(args.num_envs, 9, 2)[:, :7, 1:2]
    m_inv = torch.inverse(mm7)
    m_eef = torch.inverse(j_eef @ m_inv @ j_eef.transpose(1, 2))
    dpose = torch.zeros(args.num_envs, 6, 1)
    dpose[:, :3, 0] = kp * (pos_des - pos_cur)
    u7 = j_eef.transpose(1, 2) @ m_eef @ (kp * dpose) - kv * mm7 @ dof_vel
    u = torch.zeros(args.num_envs, 9)
    u[:, :7] = u7.squeeze(-1)
    gym.set_dof_actuation_force_tensor(sim, gymtorch.unwrap_tensor(u))

    gym.simulate(sim)
    gym.fetch_results(sim, True)
    if itr > 150:
        errs.append(float((pos_des - pos_cur).norm(dim=1).mean()))

err = float(np.mean(errs))
check(err < 0.12, f"OSC tracked the circle (mean error {err:.3f} m after settle)")
print("franka_osc OK")
