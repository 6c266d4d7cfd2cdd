"""Large-mass-ratio box stacks: 10x density per level, solver stress test.

Counterpart of /root/reference/examples/large_mass_ratio.py:106-131 (Z-up
port): a 5-box stack whose densities span 1..10^4 kg/m^3, simulated with
substeps=6 and 100 position iterations, must stand for the whole run.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("large mass ratio", steps=300, num_envs=4)

gym = gymapi.acquire_gym()
sp = gymapi.SimParams()
sp.substeps = 6
sp.physx.num_position_iterations = 100
sp.physx.num_velocity_iterations = 0
sp.physx.rest_offset = 0.001
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, sp)
gym.add_ground(sim, gymapi.PlaneParams())

box_size = 0.5
displacement = 0.002
density = 1.0
boxes = []
for _ in range(5):
    opts = gymapi.AssetOptions()
    opts.density = density
    boxes.append(gym.create_box(sim, box_size, box_size, box_size, opts))
    density *= 10.0

envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-4.5, -4.5, 0), gymapi.Vec3(4.5, 4.5, 4.5), 2)
    envs.append(env)
    for b, asset in enumerate(boxes):
        pose = gymapi.Transform(
            gymapi.Vec3(0, 0, 0.5 * box_size + (box_size + displacement) * b + 0.001)
        )
        h = gym.create_actor(env, asset, pose, f"box_{b}", i, 0)
        gym.set_rigid_body_color(
            env, h, 0, gymapi.MESH_VISUAL, gymapi.Vec3(0.2, 0.75 - 0.15 * b, 0.18)
        )

gym.prepare_sim(sim)
for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)

top = []
for i, env in enumerate(envs):
    states = gym.get_actor_rigid_body_states(
        env, gym.get_actor_handle(env, 4), gymapi.STATE_POS
    )
    top.append(states["pose"]["p"]["z"][0])
top = np.asarray(top)
print("top-box heights:", np.round(top, 3))
check(bool((np.abs(top - 2.258) < 0.2).all()), "10^4:1 mass-ratio stack stands")
