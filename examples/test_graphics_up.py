"""Same ball-drop scene under UP_AXIS_Y vs UP_AXIS_Z.

Counterpart of /root/reference/examples/test_graphics_up.py:42-43,108-120:
the up-axis choice flips default gravity, the ground-plane normal, the env
grid's horizontal plane, and the camera's roll reference. Headless: run
both conventions and check the balls rest on the matching plane.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("up axis", steps=90, num_envs=4)

for up_z in (True, False):
    gym = gymapi.acquire_gym()
    params = gymapi.SimParams()
    if up_z:
        params.up_axis = gymapi.UP_AXIS_Z
        params.gravity = gymapi.Vec3(0.0, 0.0, -9.8)
        plane = gymapi.PlaneParams()  # default normal +z
        drop = gymapi.Vec3(0, 0, 1.0)
        up_i = 2
    else:
        params.up_axis = gymapi.UP_AXIS_Y
        params.gravity = gymapi.Vec3(0.0, -9.8, 0.0)
        plane = gymapi.PlaneParams()
        plane.normal = gymapi.Vec3(0.0, 1.0, 0.0)
        drop = gymapi.Vec3(0, 1.0, 0)
        up_i = 1
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, params)
    gym.add_ground(sim, plane)
    opts = gymapi.AssetOptions()
    opts.density = 200.0
    ball = gym.create_sphere(sim, 0.2, opts)
    envs = []
    for i in range(args.num_envs):
        env = gym.create_env(sim, gymapi.Vec3(-1, -1, -1), gymapi.Vec3(1, 1, 1), 2)
        gym.create_actor(env, ball, gymapi.Transform(drop), "ball", i, 0)
        envs.append(env)
    cam = gym.create_camera_sensor(envs[0], gymapi.CameraProperties(width=64, height=48))
    eye = gymapi.Vec3(1.5, 0.5, 0.5) if up_z else gymapi.Vec3(1.5, 0.5, 0.5)
    gym.set_camera_location(cam, envs[0], eye, gymapi.Vec3(0, drop.y * 0.2, drop.z * 0.2))

    for _ in range(args.steps):
        gym.simulate(sim)
        gym.fetch_results(sim, True)
    gym.step_graphics(sim)
    gym.render_all_camera_sensors(sim)

    from test_isaacgym_tpu import gymtorch

    gym.prepare_sim(sim)
    root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
    gym.refresh_actor_root_state_tensor(sim)
    local = np.asarray(root[:, :3])  # env-local root positions
    origins = np.asarray(sim.sim.scene.env_origins)
    pos = local + origins  # world = env origin + local
    name = "UP_AXIS_Z" if up_z else "UP_AXIS_Y"
    # env-local heights: subtract per-env origins along non-up axes
    h = pos[:, up_i]
    check(
        np.all(np.abs(h - 0.2) < 0.02),
        f"{name}: balls rest at height 0.2 along axis {up_i} (got {np.round(h, 3)})",
    )
    # env grid must tile the two horizontal axes only
    other = [a for a in range(3) if a != up_i]
    spread = [np.ptp(pos[:, a]) for a in (0, 1, 2)]
    check(spread[up_i] < 0.01, f"{name}: no env spread along the up axis")
    check(max(spread[a] for a in other) > 1.0, f"{name}: envs tile horizontally")
    d = gym.get_camera_image(sim, envs[0], cam, gymapi.IMAGE_DEPTH)
    check(np.isfinite(d).sum() > 100, f"{name}: camera sees the scene")

print("test_graphics_up OK")
