"""Franka hand tracking a moving attractor target.

Counterpart of /root/reference/examples/franka_attractor.py:89-173: a 6-DOF
virtual spring-damper (stiffness 5e5, damping 5e3) on panda_hand, target
swept along a sine path per frame via set_attractor_target.
"""
import math

import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("franka attractor", steps=240, num_envs=1)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions(fix_base_link=True)
opts.disable_gravity = True
franka = gym.load_asset(
    sim, "/root/reference/assets", "urdf/franka_description/robots/franka_panda.urdf", opts
)
env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
actor = gym.create_actor(env, franka, gymapi.Transform(), "franka", 0, 1)
hand = gym.find_actor_rigid_body_handle(env, actor, "panda_hand")

st = gym.get_actor_dof_states(env, actor, gymapi.STATE_ALL)
st["pos"][:] = [0.0, 0.0, 0.0, -1.2, 0.0, 1.5, 0.0, 0.02, 0.02]
gym.set_actor_dof_states(env, actor, st, gymapi.STATE_ALL)
base_pose = gym.get_rigid_transform(env, hand)

props = gymapi.AttractorProperties()
props.stiffness = 5e5
props.damping = 5e3
props.axes = gymapi.AXIS_ALL
props.rigid_handle = hand
props.target = base_pose
att = gym.create_rigid_body_attractor(env, props)

errs = []
for step in range(args.steps):
    t = gym.get_sim_time(sim)
    target = gymapi.Transform(
        gymapi.Vec3(
            base_pose.p.x,
            base_pose.p.y + 0.1 * math.sin(1.5 * t),
            base_pose.p.z + 0.1 * math.cos(1.5 * t) - 0.1,
        ),
        base_pose.r,
    )
    gym.set_attractor_target(env, att, target)
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    if step > 120:
        cur = gym.get_rigid_transform(env, hand)
        errs.append(
            np.linalg.norm(
                [cur.p.x - target.p.x, cur.p.y - target.p.y, cur.p.z - target.p.z]
            )
        )

err = float(np.mean(errs))
check(err < 0.03, f"attractor tracked the moving target (mean err {err*1000:.1f} mm)")
print("franka_attractor OK")
