"""Projectile firing via injected viewer events.

Counterpart of /root/reference/examples/projectiles.py:66-168: SPACE fires a
box from the viewer camera pose; a pool of projectiles is recycled; KEY_R
resets the scene snapshot.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("projectiles", steps=150, num_envs=2)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
gym.add_ground(sim, gymapi.PlaneParams())
opts = gymapi.AssetOptions()
opts.density = 200.0
box = gym.create_box(sim, 0.2, 0.2, 0.2, opts)
proj = gym.create_box(sim, 0.1, 0.1, 0.1, opts)

envs = []
n_proj = 3
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-3, -3, 0), gymapi.Vec3(3, 3, 3), 2)
    envs.append(env)
    gym.create_actor(env, box, gymapi.Transform(gymapi.Vec3(0, 0, 0.2)), "target", i, 0)
    for k in range(n_proj):
        gym.create_actor(
            env, proj, gymapi.Transform(gymapi.Vec3(-2.5 + 0.3 * k, -2.5, 0.1)), f"p{k}", i, 0
        )

viewer = gym.create_viewer(sim, gymapi.CameraProperties())
gym.subscribe_viewer_keyboard_event(viewer, gymapi.KEY_SPACE, "shoot")
# flat shot from 0.3 m: 12 m/s over 2 m drops ~0.14 m -> hits the box face
gym.viewer_camera_look_at(viewer, None, gymapi.Vec3(-2, 0, 0.3), gymapi.Vec3(0, 0, 0.3))

snapshot = np.copy(gym.get_sim_rigid_body_states(sim, gymapi.STATE_ALL))
root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
next_proj = 0
hit = False
for step in range(args.steps):
    if step % 40 == 5:
        viewer.inject_event(gymapi.KEY_SPACE)
    for ev in gym.query_viewer_action_events(viewer):
        if ev.action == "shoot" and ev.value > 0:
            t = gym.get_viewer_camera_transform(viewer, None)
            fwd = t.r.rotate(gymapi.Vec3(1, 0, 0))
            for env in envs:
                st = gym.get_actor_rigid_body_states(env, 1 + next_proj, gymapi.STATE_ALL)
                st["pose"]["p"][0] = (t.p.x, t.p.y, t.p.z)
                st["vel"]["linear"][0] = (fwd.x * 12, fwd.y * 12, fwd.z * 12)
                gym.set_actor_rigid_body_states(env, 1 + next_proj, st, gymapi.STATE_ALL)
            next_proj = (next_proj + 1) % n_proj
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.refresh_actor_root_state_tensor(sim)
    # target box got knocked away from origin?
    if float(root[0, :2].norm()) > 0.15:
        hit = True

check(hit, "a projectile knocked the target box")
print("projectiles OK")
