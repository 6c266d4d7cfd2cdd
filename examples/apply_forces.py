"""Force/torque application through the tensor API.

Counterpart of /root/reference/examples/apply_forces.py:117 and
apply_forces_at_pos.py:127.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("apply forces", steps=60, num_envs=4)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions()
opts.density = 100.0
box = gym.create_box(sim, 0.4, 0.4, 0.4, opts)
envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
    gym.create_actor(env, box, gymapi.Transform(gymapi.Vec3(0, 0, 1)), "box", i, 0)
    envs.append(env)

gym.prepare_sim(sim)
root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
rb = gymtorch.wrap_tensor(gym.acquire_rigid_body_state_tensor(sim))
mass = gym.get_actor_rigid_body_properties(envs[0], 0)[0].mass

# counteract gravity exactly + spin torque, re-applied every step (the
# reference applies per frame; forces are one-shot per simulate)
for _ in range(args.steps):
    f = np.zeros((args.num_envs, 3), np.float32)
    f[:, 2] = mass * 9.8
    t = np.zeros((args.num_envs, 3), np.float32)
    t[:, 2] = 2.0
    gym.apply_rigid_body_force_tensors(sim, f, t, gymapi.ENV_SPACE)
    gym.simulate(sim)
    gym.fetch_results(sim, True)

gym.refresh_actor_root_state_tensor(sim)
check(abs(float(root[0, 2]) - 1.0) < 0.02, f"anti-gravity force held altitude (z={float(root[0,2]):.3f})")
check(float(root[0, 12]) > 1.0, f"torque spun the box (wz={float(root[0,12]):.2f})")

# force at position: push at a top corner -> induces both lin + ang velocity
gym.refresh_rigid_body_state_tensor(sim)
pos = np.asarray(rb[:, :3]).copy()
pos[:, 2] += 0.2  # top of the box
f = np.zeros((args.num_envs, 3), np.float32)
f[:, 0] = 50.0
gym.apply_rigid_body_force_at_pos_tensors(sim, f, pos, gymapi.ENV_SPACE)
gym.simulate(sim)
gym.refresh_actor_root_state_tensor(sim)
check(float(root[0, 7]) > 0.0, "offset force produced linear velocity")
check(abs(float(root[0, 11])) > 0.0, "offset force produced angular velocity")
print("apply_forces OK")
