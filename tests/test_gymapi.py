"""Facade parity tests: the reference scripts' call patterns, headless.

Each test mirrors a reference script's usage (cited per test) — these are the
"integration tests" SURVEY.md §4 says the numbered reference scripts really
are, turned into assertions.
"""
import numpy as np
import pytest

import test_isaacgym_tpu  # noqa: F401  (forces CPU platform before jax init)
from test_isaacgym_tpu import gymapi, gymtorch, gymutil

ASSET_ROOT = "/root/reference/assets"


@pytest.fixture
def gym():
    return gymapi.acquire_gym()


def _ball_scene(gym, num_envs=2, z=1.0):
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions()
    opts.density = 100.0
    ball = gym.create_sphere(sim, 0.2, opts)
    envs = []
    for i in range(num_envs):
        env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
        gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, z)), "ball", i, 0)
        envs.append(env)
    return sim, envs


# -- math types (examples/maths.py) -----------------------------------------
def test_vec3_algebra():
    a = gymapi.Vec3(1, 2, 3)
    b = gymapi.Vec3(4, 5, 6)
    assert (a + b).to_list() == [5, 7, 9]
    assert (b - a).to_list() == [3, 3, 3]
    assert a.dot(b) == 32
    assert a.cross(b).to_list() == [-3, 6, -3]
    assert abs(gymapi.Vec3(3, 4, 0).length() - 5) < 1e-9
    n = gymapi.Vec3(3, 4, 0).normalize()
    assert abs(n.length() - 1) < 1e-9


def test_quat_roundtrip():
    q = gymapi.Quat.from_euler_zyx(0.3, -0.2, 0.9)
    r, p, y = q.to_euler_zyx()
    assert abs(r - 0.3) < 1e-6 and abs(p + 0.2) < 1e-6 and abs(y - 0.9) < 1e-6
    v = gymapi.Vec3(1, 0, 0)
    qz = gymapi.Quat.from_axis_angle(gymapi.Vec3(0, 0, 1), np.pi / 2)
    rv = qz.rotate(v)
    assert abs(rv.x) < 1e-6 and abs(rv.y - 1) < 1e-6
    # inverse * q == identity
    qi = (q.inverse() * q).normalize()
    assert abs(qi.w) > 1 - 1e-6


def test_transform_ops():
    t = gymapi.Transform(
        gymapi.Vec3(1, 2, 3), gymapi.Quat.from_axis_angle(gymapi.Vec3(0, 0, 1), np.pi / 2)
    )
    p = t.transform_point(gymapi.Vec3(1, 0, 0))
    assert abs(p.x - 1) < 1e-6 and abs(p.y - 3) < 1e-6
    inv = t.inverse()
    back = inv.transform_point(p)
    assert abs(back.x - 1) < 1e-6 and abs(back.y) < 1e-6
    buf = gymapi.Transform.from_buffer(np.array([1, 2, 3, 0, 0, 0, 1.0]))
    assert buf.p.z == 3


# -- introspection (test/test01_isaacgym_asset.py:12-101) --------------------
def test_asset_introspection_franka(gym):
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    asset = gym.load_asset(
        sim,
        ASSET_ROOT,
        "urdf/franka_description/robots/franka_panda.urdf",
        gymapi.AssetOptions(),
    )
    assert gym.get_asset_dof_count(asset) == 9
    names = gym.get_asset_rigid_body_names(asset)
    assert "panda_hand" in names
    d = gym.get_asset_rigid_body_dict(asset)
    assert d["panda_link0"] == 0
    props = gym.get_asset_dof_properties(asset)
    assert props.shape == (9,)
    assert props["hasLimits"].all()
    jt = gym.get_asset_joint_type(asset, 0)
    assert gym.get_joint_type_string(jt) in ("JOINT_REVOLUTE", "JOINT_FIXED")
    assert gym.get_dof_type_string(gym.get_asset_dof_type(asset, 0)) == "DOF_ROTATION"


def test_actor_handles_and_domains(gym):
    sim, envs = _ball_scene(gym, num_envs=3)
    assert gym.get_actor_count(envs[0]) == 1
    assert gym.get_actor_name(envs[0], 0) == "ball"
    h = gym.get_actor_rigid_body_handle(envs[1], 0, 0)
    assert h == 0
    i_sim = gym.get_actor_rigid_body_index(envs[1], 0, 0, gymapi.DOMAIN_SIM)
    assert i_sim == 1  # env 1 x 1 body per env


# -- classic loop + snapshot/reset (1080_balls_of_solitude.py:150-158) -------
def test_classic_loop_and_reset(gym):
    sim, envs = _ball_scene(gym)
    snapshot = np.copy(gym.get_sim_rigid_body_states(sim, gymapi.STATE_ALL))
    for _ in range(30):
        gym.simulate(sim)
        gym.fetch_results(sim, True)
    st = gym.get_actor_rigid_body_states(envs[0], 0, gymapi.STATE_ALL)
    assert st["pose"]["p"]["z"][0] < 1.0  # fell under gravity
    gym.set_sim_rigid_body_states(sim, snapshot, gymapi.STATE_ALL)
    st = gym.get_actor_rigid_body_states(envs[0], 0, gymapi.STATE_ALL)
    assert abs(st["pose"]["p"]["z"][0] - 1.0) < 1e-5


# -- tensor API (test06:417-442, interop_torch.py:131-149) -------------------
def test_tensor_api_root_state(gym):
    sim, envs = _ball_scene(gym)
    handle = gym.acquire_actor_root_state_tensor(sim)
    buf = gymtorch.wrap_tensor(handle)
    assert tuple(buf.shape) == (2, 13)
    assert handle.data_address != 0
    for _ in range(10):
        gym.simulate(sim)
    gym.refresh_actor_root_state_tensor(sim)
    z0 = float(buf[0, 2])
    assert z0 < 1.0
    # write back: teleport up with zero velocity
    buf[:, 2] = 2.0
    buf[:, 7:13] = 0.0
    gym.set_actor_root_state_tensor(sim, gymtorch.unwrap_tensor(buf))
    gym.refresh_actor_root_state_tensor(sim)
    assert abs(float(buf[0, 2]) - 2.0) < 1e-6


def test_contact_force_tensor(gym):
    sim, envs = _ball_scene(gym, z=0.19)
    cf = gymtorch.wrap_tensor(gym.acquire_net_contact_force_tensor(sim))
    for _ in range(20):
        gym.simulate(sim)
    gym.refresh_net_contact_force_tensor(sim)
    # resting ball: normal force ~ m*g upward
    assert float(cf[0, 2]) > 0.0


# -- DOF drive modes (examples/dof_controls.py:91-150) -----------------------
def test_dof_position_drive_cartpole(gym):
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    asset = gym.load_asset(
        sim, ASSET_ROOT, "urdf/cartpole.urdf", gymapi.AssetOptions(fix_base_link=True)
    )
    env = gym.create_env(sim, gymapi.Vec3(-2, -2, 0), gymapi.Vec3(2, 2, 2), 1)
    actor = gym.create_actor(env, asset, gymapi.Transform(gymapi.Vec3(0, 0, 2)), "cartpole", 0, 0)
    props = gym.get_actor_dof_properties(env, actor)
    props["driveMode"][:] = gymapi.DOF_MODE_POS
    props["stiffness"][:] = 400.0
    props["damping"][:] = 40.0
    gym.set_actor_dof_properties(env, actor, props)
    dof = gym.get_actor_dof_handle(env, actor, 0)
    gym.set_dof_target_position(env, dof, 0.3)
    for _ in range(120):
        gym.simulate(sim)
    assert abs(gym.get_dof_position(env, dof) - 0.3) < 0.05


# -- attractor (examples/franka_attractor.py:89-173) --------------------------
@pytest.mark.slow
def test_franka_attractor_tracks_target(gym):
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions(fix_base_link=True)
    opts.disable_gravity = True
    asset = gym.load_asset(
        sim, ASSET_ROOT, "urdf/franka_description/robots/franka_panda.urdf", opts
    )
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
    actor = gym.create_actor(env, asset, gymapi.Transform(), "franka", 0, 1)
    hand = gym.find_actor_rigid_body_handle(env, actor, "panda_hand")
    # default pose so the arm isn't singular
    st = gym.get_actor_dof_states(env, actor, gymapi.STATE_ALL)
    st["pos"][:] = [0.0, 0.0, 0.0, -1.2, 0.0, 1.5, 0.0, 0.02, 0.02]
    gym.set_actor_dof_states(env, actor, st, gymapi.STATE_ALL)
    hand_pose = gym.get_rigid_transform(env, hand)

    props = gymapi.AttractorProperties()
    props.stiffness = 5e5
    props.damping = 5e3
    props.axes = gymapi.AXIS_ALL
    props.rigid_handle = hand
    props.target = hand_pose
    att = gym.create_rigid_body_attractor(env, props)

    # move target 5 cm up and simulate
    target = gymapi.Transform(
        gymapi.Vec3(hand_pose.p.x, hand_pose.p.y, hand_pose.p.z + 0.05), hand_pose.r
    )
    gym.set_attractor_target(env, att, target)
    for _ in range(120):
        gym.simulate(sim)
    cur = gym.get_rigid_transform(env, hand)
    err = np.array([cur.p.x - target.p.x, cur.p.y - target.p.y, cur.p.z - target.p.z])
    assert np.linalg.norm(err) < 0.02, err


# -- runtime scaling (examples/actor_scaling.py:126) --------------------------
def test_set_actor_scale(gym):
    sim, envs = _ball_scene(gym)
    gym.set_actor_scale(envs[1], 0, 2.0)
    sim._ensure_built()
    p = sim.sim.params
    assert float(p.shape_size[1, 0, 0]) == pytest.approx(0.4)
    assert float(p.body_mass[1, 0]) == pytest.approx(float(p.body_mass[0, 0]) * 8.0)


# -- body/shape properties (examples/body_physics_props.py) -------------------
def test_shape_and_body_properties(gym):
    sim, envs = _ball_scene(gym)
    sp = gym.get_actor_rigid_shape_properties(envs[0], 0)
    sp[0].friction = 0.1
    sp[0].restitution = 0.9
    gym.set_actor_rigid_shape_properties(envs[0], 0, sp)
    bp = gym.get_actor_rigid_body_properties(envs[0], 0)
    bp[0].flags = gymapi.RIGID_BODY_DISABLE_GRAVITY
    gym.set_actor_rigid_body_properties(envs[0], 0, bp)
    for _ in range(30):
        gym.simulate(sim)
    root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
    gym.refresh_actor_root_state_tensor(sim)
    assert abs(float(root[0, 2]) - 1.0) < 1e-3  # env0 ball floats (no gravity)
    assert float(root[1, 2]) < 0.9  # env1 ball fell


# -- forces (examples/apply_forces.py:117) ------------------------------------
def test_apply_rigid_body_force_tensors(gym):
    sim, envs = _ball_scene(gym)
    sim._ensure_built()
    bp = gym.get_actor_rigid_body_properties(envs[0], 0)
    m = bp[0].mass
    n_bodies = 2
    f = np.zeros((n_bodies, 3), np.float32)
    f[:, 2] = m * 9.8 * 2  # 2g upward
    gym.apply_rigid_body_force_tensors(sim, f, None, gymapi.ENV_SPACE)
    gym.simulate(sim)
    root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
    gym.refresh_actor_root_state_tensor(sim)
    assert float(root[0, 9]) > 0  # moving up
    vz1 = float(root[0, 9])
    gym.simulate(sim)  # force was one-shot: now decelerating under gravity
    gym.refresh_actor_root_state_tensor(sim)
    assert float(root[0, 9]) < vz1


# -- cameras (test02:226-344, graphics.py) ------------------------------------
def test_camera_images_and_matrices(gym):
    sim, envs = _ball_scene(gym)
    cams = []
    for env in envs:
        cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=64, height=48))
        gym.set_camera_location(cam, env, gymapi.Vec3(2, 0, 1), gymapi.Vec3(0, 0, 1))
        cams.append(cam)
    gym.render_all_camera_sensors(sim)
    img = gym.get_camera_image(sim, envs[0], cams[0], gymapi.IMAGE_COLOR)
    assert img.shape == (48, 64 * 4) and img.dtype == np.uint8
    depth = gym.get_camera_image(sim, envs[0], cams[0], gymapi.IMAGE_DEPTH)
    fin = np.isfinite(depth)
    assert fin.any() and (depth[fin] < 0).all()  # negative view depth
    # the center pixel sees the ball front face, 1.8m ahead (camera at x=2,
    # ball surface at x=0.2, both at z=1)
    assert abs(-depth[24, 32] - 1.8) < 0.05
    P = gym.get_camera_proj_matrix(sim, envs[0], cams[0])
    V = gym.get_camera_view_matrix(sim, envs[0], cams[0])
    assert P.shape == (4, 4) and V.shape == (4, 4)
    # view matrix maps the ball (world 0,0,1) in front of the camera
    p_gl = np.array([0, 0, 1.0, 1.0]) @ V
    assert p_gl[2] < 0  # GL forward is -z
    t = gym.get_camera_transform(sim, envs[0], cams[0])
    assert abs(t.p.x - 2) < 1e-5


def test_camera_attached_to_body(gym):
    sim, envs = _ball_scene(gym)
    cam = gym.create_camera_sensor(envs[0], gymapi.CameraProperties(width=32, height=32))
    body = gym.get_actor_rigid_body_handle(envs[0], 0, 0)
    gym.attach_camera_to_body(
        cam, envs[0], body, gymapi.Transform(gymapi.Vec3(0, 0, 0.5)), gymapi.FOLLOW_TRANSFORM
    )
    sim._ensure_built()
    t0 = gym.get_camera_transform(sim, envs[0], cam)
    for _ in range(20):
        gym.simulate(sim)
    t1 = gym.get_camera_transform(sim, envs[0], cam)
    assert t1.p.z < t0.p.z  # followed the falling ball


# -- viewer + events (examples/projectiles.py:66-168) -------------------------
def test_viewer_headless_events(gym):
    sim, envs = _ball_scene(gym)
    viewer = gym.create_viewer(sim, gymapi.CameraProperties())
    gym.subscribe_viewer_keyboard_event(viewer, gymapi.KEY_R, "reset")
    gym.subscribe_viewer_mouse_event(viewer, gymapi.MOUSE_LEFT_BUTTON, "shoot")
    assert not gym.query_viewer_has_closed(viewer)
    viewer.inject_event(gymapi.KEY_R)
    viewer.inject_event(gymapi.MOUSE_LEFT_BUTTON)
    evs = gym.query_viewer_action_events(viewer)
    assert [e.action for e in evs] == ["reset", "shoot"]
    assert gym.query_viewer_action_events(viewer) == []
    gym.viewer_camera_look_at(viewer, None, gymapi.Vec3(5, 5, 3), gymapi.Vec3(0, 0, 0))
    t = gym.get_viewer_camera_transform(viewer, None)
    assert abs(t.p.x - 5) < 1e-6
    gym.destroy_viewer(viewer)
    assert gym.query_viewer_has_closed(viewer)


# -- gymutil ------------------------------------------------------------------
def test_gymutil_parse_arguments():
    args = gymutil.parse_arguments(
        "t",
        custom_parameters=[
            {"name": "--num_envs", "type": int, "default": 16, "help": "n"}
        ],
        args=["--num_envs", "8", "--flex", "--pipeline", "cpu"],
    )
    assert args.num_envs == 8
    assert args.physics_engine == gymapi.SIM_FLEX
    assert not args.use_gpu_pipeline
    assert args.compute_device_id == 0


def test_gymutil_geometry(gym):
    sim, envs = _ball_scene(gym)
    viewer = gym.create_viewer(sim, gymapi.CameraProperties())
    axes = gymutil.AxesGeometry(0.5)
    sphere = gymutil.WireframeSphereGeometry(0.1, 4, 4)
    gymutil.draw_lines(axes, gym, viewer, envs[0])
    gymutil.draw_lines(sphere, gym, viewer, envs[0])
    assert len(viewer.lines) == 2
    gym.clear_lines(viewer)
    assert viewer.lines == []


# -- terrain (examples/terrain_creation.py:99-119) -----------------------------
def test_terrain_heightfield_contact(gym):
    from test_isaacgym_tpu.terrain_utils import (
        SubTerrain,
        convert_heightfield_to_trimesh,
        )

    from test_isaacgym_tpu.terrain_utils import pyramid_sloped_terrain

    np.random.seed(17)
    sub = SubTerrain(width=32, length=32, vertical_scale=0.005, horizontal_scale=0.25)
    # inverted pyramid (bowl): the ball settles inside the grid
    hf = pyramid_sloped_terrain(sub, slope=-0.5).height_field_raw
    verts, tris = convert_heightfield_to_trimesh(hf, 0.25, 0.005, slope_threshold=1.5)

    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    tm = gymapi.TriangleMeshParams()
    tm.nb_vertices, tm.nb_triangles = verts.shape[0], tris.shape[0]
    tm.transform.p.x = 0.0
    gym.add_triangle_mesh(sim, verts.flatten(), tris.flatten(), tm)

    ball = gym.create_sphere(sim, 0.2, gymapi.AssetOptions())
    env = gym.create_env(sim, gymapi.Vec3(0, 0, 0), gymapi.Vec3(8, 8, 4), 1)
    gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(3.0, 4.0, 3.0)), "ball", 0, 0)
    root = gymtorch.wrap_tensor(gym.acquire_actor_root_state_tensor(sim))
    for _ in range(300):
        gym.simulate(sim)
    gym.refresh_actor_root_state_tensor(sim)
    # terrain height at the ball's resting xy, from the heightfield itself
    hfld = sim.sim.scene.heightfield
    x, y = float(root[0, 0]), float(root[0, 1])
    i = int(round((x - hfld.offset_x) / hfld.horizontal_scale))
    j = int(round((y - hfld.offset_y) / hfld.horizontal_scale))
    assert 0 <= i < 32 and 0 <= j < 32  # stayed on the terrain (bowl)
    ground_z = float(hfld.data[i, j])
    assert float(root[0, 2]) > ground_z - 0.05  # not through the terrain
    assert float(root[0, 2]) < ground_z + 0.45  # resting near it


def test_terrain_generators_shapes():
    from test_isaacgym_tpu import terrain_utils as tu

    np.random.seed(3)
    mk = lambda: tu.SubTerrain(width=40, length=40, vertical_scale=0.005, horizontal_scale=0.1)
    outs = [
        tu.random_uniform_terrain(mk(), -0.2, 0.2, 0.2, 0.5),
        tu.sloped_terrain(mk(), slope=-0.5),
        tu.pyramid_sloped_terrain(mk(), slope=-0.5),
        tu.discrete_obstacles_terrain(mk(), 0.5, 1.0, 2.0, 20),
        tu.wave_terrain(mk(), num_waves=2.0, amplitude=1.0),
        tu.stairs_terrain(mk(), step_width=0.75, step_height=-0.5),
        tu.pyramid_stairs_terrain(mk(), step_width=0.75, step_height=-0.5),
        tu.stepping_stones_terrain(mk(), stone_size=1.0, stone_distance=1.0, max_height=0.5, platform_size=0.0),
    ]
    for t in outs:
        assert t.height_field_raw.shape == (40, 40)
        assert t.height_field_raw.dtype == np.int16
    assert outs[1].height_field_raw.std() > 0  # slope is nonconstant
    v, f = tu.convert_heightfield_to_trimesh(outs[0].height_field_raw, 0.1, 0.005, 1.5)
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert f.max() < len(v)
