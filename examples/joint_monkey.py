"""DOF animation across the asset zoo: drive every DOF across its limits.

Counterpart of /root/reference/examples/joint_monkey.py:108-262 (cycles each
DOF between lower and upper limit with a position drive; prints DOF props;
queries get_dof_frame).
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("joint monkey", steps=200, num_envs=1)

ASSETS = [
    "urdf/franka_description/robots/franka_panda.urdf",
    "urdf/cartpole.urdf",
    "mjcf/nv_ant.xml",
]

gym = gymapi.acquire_gym()
for f in ASSETS:
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions(fix_base_link=True)
    opts.disable_gravity = True
    asset = gym.load_asset(sim, "/root/reference/assets", f, opts)
    nd = gym.get_asset_dof_count(asset)
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 3), 1)
    actor = gym.create_actor(env, asset, gymapi.Transform(gymapi.Vec3(0, 0, 1.5)), "a", 0, 0)

    props = gym.get_actor_dof_properties(env, actor)
    print(f"{f}: {nd} dofs")
    print("  hasLimits:", props["hasLimits"])
    lower = np.where(props["hasLimits"], props["lower"], -np.pi / 4)
    upper = np.where(props["hasLimits"], props["upper"], np.pi / 4)
    props["driveMode"][:] = gymapi.DOF_MODE_POS
    props["stiffness"][:] = 800.0
    props["damping"][:] = 80.0
    gym.set_actor_dof_properties(env, actor, props)

    # sweep each dof to mid, then upper, then lower (joint_monkey's animation)
    mids = 0.5 * (lower + upper)
    worst = 0.0
    for phase, target in (("upper", upper), ("lower", lower), ("mid", mids)):
        gym.set_actor_dof_position_targets(env, actor, target.astype(np.float32))
        for _ in range(args.steps):
            gym.simulate(sim)
        st = gym.get_actor_dof_states(env, actor, gymapi.STATE_ALL)
        err = np.abs(st["pos"] - target).max()
        worst = max(worst, float(err))
    check(worst < 0.2, f"{f}: all dofs reach commanded limits (worst err {worst:.3f})")

    frame = gym.get_dof_frame(env, gym.get_actor_dof_handle(env, actor, 0))
    ax = np.array([frame.axis.x, frame.axis.y, frame.axis.z])
    check(abs(np.linalg.norm(ax) - 1) < 1e-4, "get_dof_frame returns a unit axis")
print("joint_monkey OK")
