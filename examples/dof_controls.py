"""Cartpole under each DOF drive mode, one env per mode.

Counterpart of /root/reference/examples/dof_controls.py:91-181: env0 POS
drive on the pole, env1 VEL drive on the pole, env2 VEL drive on the cart,
env3 EFFORT (bang-bang feedback) on the cart.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("dof controls", steps=240)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
asset = gym.load_asset(
    sim,
    "/root/reference/assets",
    "urdf/cartpole.urdf",
    gymapi.AssetOptions(fix_base_link=True),
)

envs, actors = [], []
for i in range(4):
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 3), 2)
    a = gym.create_actor(env, asset, gymapi.Transform(gymapi.Vec3(0, 0, 2)), "cartpole", i, 0)
    envs.append(env)
    actors.append(a)

names = gym.get_asset_dof_names(asset)
slider = names.index("slider_to_cart")
pole = names.index("cart_to_pole")

# env0: pole POS drive to 0.25 rad
p = gym.get_actor_dof_properties(envs[0], actors[0])
p["driveMode"][pole] = gymapi.DOF_MODE_POS
p["stiffness"][pole] = 1000.0
p["damping"][pole] = 200.0
gym.set_actor_dof_properties(envs[0], actors[0], p)
gym.set_dof_target_position(envs[0], gym.get_actor_dof_handle(envs[0], actors[0], pole), 0.25)

# env1: pole VEL drive at 0.6 rad/s
p = gym.get_actor_dof_properties(envs[1], actors[1])
p["driveMode"][pole] = gymapi.DOF_MODE_VEL
p["damping"][pole] = 600.0
gym.set_actor_dof_properties(envs[1], actors[1], p)
gym.set_dof_target_velocity(envs[1], gym.get_actor_dof_handle(envs[1], actors[1], pole), 0.6)

# env2: cart VEL drive
p = gym.get_actor_dof_properties(envs[2], actors[2])
p["driveMode"][slider] = gymapi.DOF_MODE_VEL
p["damping"][slider] = 800.0
gym.set_actor_dof_properties(envs[2], actors[2], p)
gym.set_dof_target_velocity(envs[2], gym.get_actor_dof_handle(envs[2], actors[2], slider), 0.3)

# env3: cart EFFORT bang-bang keeping the cart near x=0
p = gym.get_actor_dof_properties(envs[3], actors[3])
p["driveMode"][slider] = gymapi.DOF_MODE_EFFORT
p["stiffness"][slider] = 0.0
p["damping"][slider] = 0.0
gym.set_actor_dof_properties(envs[3], actors[3], p)
h3 = gym.get_actor_dof_handle(envs[3], actors[3], slider)

dt = 1 / 60
for step in range(args.steps):
    x = gym.get_dof_position(envs[3], h3)
    gym.apply_dof_effort(envs[3], h3, -50.0 if x > 0 else 50.0)
    gym.simulate(sim)
    gym.fetch_results(sim, True)

pos0 = gym.get_dof_position(envs[0], gym.get_actor_dof_handle(envs[0], actors[0], pole))
check(abs(pos0 - 0.25) < 0.05, f"POS drive reached target (pole angle {pos0:.3f})")
vel1 = gym.get_dof_velocity(envs[1], gym.get_actor_dof_handle(envs[1], actors[1], pole))
check(abs(vel1 - 0.6) < 0.45, f"VEL drive spinning the pole (vel {vel1:.3f})")
pos2 = gym.get_dof_position(envs[2], gym.get_actor_dof_handle(envs[2], actors[2], slider))
check(pos2 > 0.3, f"VEL-driven cart moved (x {pos2:.3f})")
x3 = gym.get_dof_position(envs[3], h3)
check(abs(x3) < 1.0, f"EFFORT bang-bang kept the cart bounded (x {x3:.3f})")
print("dof_controls OK")
