"""Shape & body property control: friction, restitution, gravity flags.

Counterpart of /root/reference/examples/body_physics_props.py:119-194.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("body physics props", steps=150, num_envs=3)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
plane = gymapi.PlaneParams()
plane.restitution = 0.6
gym.add_ground(sim, plane)
ball = gym.create_sphere(sim, 0.2, gymapi.AssetOptions())
envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 3), 2)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "ball", i, 0)
    envs.append(env)

# env0 bouncy, env1 dead, env2 gravity disabled (floats)
sp = gym.get_actor_rigid_shape_properties(envs[0], 0)
sp[0].restitution = 1.0
gym.set_actor_rigid_shape_properties(envs[0], 0, sp)
sp = gym.get_actor_rigid_shape_properties(envs[1], 0)
sp[0].restitution = 0.0
gym.set_actor_rigid_shape_properties(envs[1], 0, sp)
bp = gym.get_actor_rigid_body_properties(envs[2], 0)
bp[0].flags = gymapi.RIGID_BODY_DISABLE_GRAVITY
gym.set_actor_rigid_body_properties(envs[2], 0, bp)

root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
max_z_after_bounce = [0.0, 0.0]
bounced = [False, False]
for step in range(args.steps):
    gym.simulate(sim)
    gym.refresh_actor_root_state_tensor(sim)
    for e in range(2):
        vz = float(root[e, 9])
        z = float(root[e, 2])
        if vz > 0.5:
            bounced[e] = True
        if bounced[e]:
            max_z_after_bounce[e] = max(max_z_after_bounce[e], z)

print("rebound heights:", max_z_after_bounce)
check(bounced[0] and max_z_after_bounce[0] > 0.4, "high-restitution ball bounced back up")
check(max_z_after_bounce[1] < 0.3, "zero-restitution ball stayed down")
check(abs(float(root[2, 2]) - 1.0) < 1e-3, "gravity-disabled ball floats")
print("body_physics_props OK")
