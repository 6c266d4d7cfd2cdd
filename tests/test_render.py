"""Renderer round-out (VERDICT r2 item 5): texture sampling, per-env runtime
FOV, supersampling, and the coarse frustum cull.

Reference behaviors: texture load + per-body assignment
(/root/reference/examples/graphics.py:96-122,185-196), per-env camera zoom
(test11_servo_vecenv_camerazoom.py:327-335,409-410), supersampling props
(test/test02_isaacgym_camera.py:226-235), big scenes (test08.py:281-284).
"""
import numpy as np
import pytest

import test_isaacgym_tpu  # noqa: F401  (forces CPU platform before jax init)
from test_isaacgym_tpu import gymapi


@pytest.fixture
def gym():
    return gymapi.acquire_gym()


def _ball_scene(gym, num_envs=2, z=1.0, radius=0.2):
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions()
    opts.density = 100.0
    ball = gym.create_sphere(sim, radius, opts)
    envs = []
    for i in range(num_envs):
        env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 2)
        gym.create_actor(env, ball, gymapi.Transform(gymapi.Vec3(0, 0, z)), "ball", i, 0)
        envs.append(env)
    return sim, envs


def test_texture_sampling(gym):
    """A red/blue checker texture must show BOTH colors in the rendered
    image of the textured env and neither in the untextured one."""
    sim, envs = _ball_scene(gym, num_envs=2)
    # checker: left half red, right half blue
    buf = np.zeros((8, 8, 4), np.uint8)
    buf[:, :4] = [255, 30, 30, 255]
    buf[:, 4:] = [30, 30, 255, 255]
    tex = gym.create_texture_from_buffer(sim, 8, 8, buf)
    gym.set_rigid_body_texture(envs[0], 0, 0, 0, tex)
    cams = []
    for env in envs:
        cam = gym.create_camera_sensor(
            env, gymapi.CameraProperties(width=64, height=48)
        )
        gym.set_camera_location(cam, env, gymapi.Vec3(1.0, 0, 1), gymapi.Vec3(0, 0, 1))
        cams.append(cam)
    gym.render_all_camera_sensors(sim)
    img0 = gym.get_camera_image(sim, envs[0], cams[0], gymapi.IMAGE_COLOR)
    img0 = img0.reshape(48, 64, 4).astype(np.int32)
    img1 = gym.get_camera_image(sim, envs[1], cams[0], gymapi.IMAGE_COLOR)
    img1 = img1.reshape(48, 64, 4).astype(np.int32)
    reddish = (img0[..., 0] > img0[..., 2] + 40).sum()
    bluish = (img0[..., 2] > img0[..., 0] + 40).sum()
    assert reddish > 20 and bluish > 20, (reddish, bluish)
    # untextured env: the ball region stays gray (R ~ B); mask via depth
    # (sky/ground pixels are legitimately tinted)
    d1 = np.asarray(gym.get_camera_image(sim, envs[1], cams[1], gymapi.IMAGE_DEPTH))
    ball = np.isfinite(d1) & (d1 > -1.2)  # ball face ~0.8m from the camera
    assert ball.sum() > 50
    assert (np.abs(img1[..., 0] - img1[..., 2])[ball] > 40).sum() == 0


def test_per_env_fov_zoom(gym):
    """set_camera_horizontal_fov zooms one env: the ball covers MORE pixels
    at 20 deg than at the default 90 deg (test11's zoom semantics)."""
    sim, envs = _ball_scene(gym, num_envs=2)
    for i, env in enumerate(envs):
        gym.set_rigid_body_segmentation_id(env, 0, 0, 7)
    cam = gym.create_camera_sensor(
        envs[0], gymapi.CameraProperties(width=64, height=48)
    )
    for env in envs:
        gym.set_camera_location(cam, env, gymapi.Vec3(2, 0, 1), gymapi.Vec3(0, 0, 1))
    gym.set_camera_horizontal_fov(cam, envs[1], 20.0)
    gym.render_all_camera_sensors(sim)
    seg0 = gym.get_camera_image(sim, envs[0], cam, gymapi.IMAGE_SEGMENTATION)
    seg1 = gym.get_camera_image(sim, envs[1], cam, gymapi.IMAGE_SEGMENTATION)
    n0 = (np.asarray(seg0) == 7).sum()
    n1 = (np.asarray(seg1) == 7).sum()
    assert n0 > 3 and n1 > 3 * n0, (n0, n1)


def test_supersampling_smooths_edges(gym):
    """supersampling_horizontal/vertical=4 must produce intermediate edge
    colors (anti-aliasing) that the 1x render lacks."""
    sim, envs = _ball_scene(gym, num_envs=1)
    p1 = gymapi.CameraProperties(width=48, height=36)
    p4 = gymapi.CameraProperties(
        width=48, height=36, supersampling_horizontal=4, supersampling_vertical=4
    )
    c1 = gym.create_camera_sensor(envs[0], p1)
    c4 = gym.create_camera_sensor(envs[0], p4)
    for c in (c1, c4):
        gym.set_camera_location(c, envs[0], gymapi.Vec3(2, 0, 1), gymapi.Vec3(0, 0, 1))
    gym.render_all_camera_sensors(sim)
    i1 = gym.get_camera_image(sim, envs[0], c1, gymapi.IMAGE_COLOR).reshape(36, 48, 4)
    i4 = gym.get_camera_image(sim, envs[0], c4, gymapi.IMAGE_COLOR).reshape(36, 48, 4)
    assert i1.shape == i4.shape
    # 4x supersampling produces strictly more distinct shades along edges
    assert len(np.unique(i4[..., 0])) > len(np.unique(i1[..., 0]))


def test_frustum_cull_matches_uncull():
    """A >256-shape scene rendered with the cull must match the unculled
    image exactly (the cull is conservative)."""
    import jax.numpy as jnp

    from test_isaacgym_tpu.render.raster import render_camera_batch

    rng = np.random.RandomState(0)
    S = 400
    sp = rng.uniform(-5, 5, (1, S, 3)).astype(np.float32)
    sp[..., 2] = rng.uniform(0.2, 3, (1, S))
    # put 220 shapes BEHIND the camera (culled; <=180 visible < cull_max)
    sp[0, 180:, 0] = rng.uniform(12.0, 20.0, 220)
    sq = np.tile(np.array([0, 0, 0, 1], np.float32), (1, S, 1))
    ssz = np.tile(np.array([0.15, 0.0, 0.0], np.float32), (1, S, 1))
    kind = np.zeros(S, np.int32)  # spheres
    color = rng.uniform(0.2, 0.9, (S, 3)).astype(np.float32)
    seg = np.arange(1, S + 1, dtype=np.int32)
    ground = np.array([0, 0, 1, 0], np.float32)
    cam_pos = np.array([[8.0, 0, 2]], np.float32)
    cam_quat = np.array([[0, 0, 1, 0]], np.float32)  # yaw 180: look -x
    args = (
        cam_pos, cam_quat, sp, sq, ssz, kind, color, seg, ground,
        np.array([0.3, 0.3, -0.9], np.float32) / np.linalg.norm([0.3, 0.3, 0.9]),
        np.ones(3, np.float32) * 0.8,
        np.ones(3, np.float32) * 0.2,
        np.array([0.3, 0.4, 0.6], np.float32),
        60.0,
    )
    full = render_camera_batch(*args, width=64, height=48, far=100.0, cull_max=512)
    culled = render_camera_batch(*args, width=64, height=48, far=100.0, cull_max=256)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(culled[0]))
    np.testing.assert_array_equal(np.asarray(full[2]), np.asarray(culled[2]))


def test_mesh_renders_as_hull_not_box(gym):
    """A convex mesh (octahedron) must render as its hull: the image
    silhouette is smaller than the bounding-box render, and corner rays that
    would hit the AABB corners miss the octahedron (VERDICT r3 item 5 —
    meshes rendered as boxes)."""
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    # octahedron: AABB corners are NOT part of the hull
    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    ) * 0.3
    from test_isaacgym_tpu.assets import create_mesh_asset

    f = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32
    )
    mesh = create_mesh_asset("oct", v, f, density=100.0, fix_base_link=True)
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
    gym.create_actor(env, mesh, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "oct", 0, 0)
    cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=96, height=96))
    gym.set_camera_location(cam, env, gymapi.Vec3(1.2, 0, 1.0), gymapi.Vec3(0, 0, 1.0))
    gym.render_all_camera_sensors(sim)
    d = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_DEPTH)
    hit = np.isfinite(d) & (d > -2.0)
    assert hit.sum() > 100, hit.sum()
    # the bounding box of an octahedron seen face-on covers ~a square; the
    # octahedron's silhouette is the inscribed diamond ~ half the area
    box_area_px = hit.any(0).sum() * hit.any(1).sum()
    assert hit.sum() < 0.72 * box_area_px, (hit.sum(), box_area_px)


def test_optical_flow(gym):
    """IMAGE_OPTICAL_FLOW: a ball moving +y across the camera (looking -x)
    produces horizontal pixel flow with the right sign, zero on background
    (graphics.py:225-238 image-type surface; VERDICT r3 item 5)."""
    sim, envs = _ball_scene(gym, num_envs=1, z=1.0)
    env = envs[0]
    cam = gym.create_camera_sensor(env, gymapi.CameraProperties(width=64, height=48))
    gym.set_camera_location(cam, env, gymapi.Vec3(1.5, 0, 1.0), gymapi.Vec3(0, 0, 1.0))
    # give the ball a sideways velocity via the root state tensor
    st = gym.acquire_actor_root_state_tensor(sim)
    gym.refresh_actor_root_state_tensor(sim)
    arr = np.asarray(st.buf).reshape(1, 13).copy()
    arr[0, 8] = 2.0  # +y linvel
    gym.set_actor_root_state_tensor(sim, arr)
    gym.render_all_camera_sensors(sim)
    flow = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_OPTICAL_FLOW)
    assert flow.shape == (48, 64, 2)
    d = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_DEPTH)
    # depth band + upper image isolates BALL pixels (static ground shows in
    # the lower half at similar view depths with flow 0)
    ball = np.isfinite(d) & (d > -1.45) & (d < -1.1)
    ball[28:] = False
    assert ball.sum() > 30
    # camera looks -x; +y world motion moves the image of the ball to the
    # camera's LEFT... sign check: in-plane du is nonzero and consistent
    du_ball = flow[..., 0][ball]
    assert np.abs(du_ball).mean() > 0.5, np.abs(du_ball).mean()
    assert (np.sign(du_ball) == np.sign(du_ball.mean())).mean() > 0.9
    sky = ~np.isfinite(d)  # true background: no hit at all
    assert np.abs(flow[..., 0][sky]).max() < 1e-4


@pytest.mark.slow
def test_hires_render_time(gym):
    """test08-class 1600x900 render completes and is timed (<10 s on the
    CPU test platform; the TPU number is the `render_1600x900 ms/frame`
    extra produced by `bench.py --config render`)."""
    import time

    sim, envs = _ball_scene(gym, num_envs=1)
    cam = gym.create_camera_sensor(
        envs[0], gymapi.CameraProperties(width=1600, height=900)
    )
    gym.set_camera_location(cam, envs[0], gymapi.Vec3(2, 0, 1.2), gymapi.Vec3(0, 0, 1))
    gym.render_all_camera_sensors(sim)  # compile+render
    t0 = time.perf_counter()
    gym.render_all_camera_sensors(sim)
    dt = time.perf_counter() - t0
    img = gym.get_camera_image(sim, envs[0], cam, gymapi.IMAGE_COLOR)
    assert img.shape == (900, 1600 * 4)
    assert dt < 10.0, f"1600x900 render took {dt:.2f}s"


def test_concave_mesh_silhouette_differs_from_hull(gym):
    """True visual-mesh rendering (VERDICT r4 item 4): an L-shaped prism's
    notch must show in the image — rays through the notch miss the mesh —
    while the convex hull (round-4's LOD) fills it in. We assert both that
    the notch pixels miss and that the L itself hits."""
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    # L-shaped prism in the xz plane, extruded along y: outline
    # (0,0)-(2,0)-(2,1)-(1,1)-(1,2)-(0,2), notch = the (1..2)x(1..2) square
    out2d = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], np.float32
    ) * 0.3
    tris2d = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 5]], np.int64)
    v = []
    for y in (-0.15, 0.15):
        for p in out2d:
            v.append([p[0], y, p[1]])
    v = np.asarray(v, np.float32)
    f = []
    f += [[a, b, c] for a, b, c in tris2d]  # back face (y=-)
    f += [[a + 6, c + 6, b + 6] for a, b, c in tris2d]  # front face
    for i in range(6):  # side walls
        j = (i + 1) % 6
        f += [[i, j, 6 + j], [i, 6 + j, 6 + i]]
    from test_isaacgym_tpu.assets import create_mesh_asset

    mesh = create_mesh_asset(
        "lprism", v, np.asarray(f, np.int32), density=100.0,
        fix_base_link=True,
    )
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
    gym.create_actor(
        env, mesh, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "L", 0, 0
    )
    cam = gym.create_camera_sensor(
        env, gymapi.CameraProperties(width=96, height=96)
    )
    # look along -y (the prism axis), aimed at the mesh AABB center (the
    # actor origin is the outline's corner; the mesh spans x,z in [0,0.6])
    gym.set_camera_location(
        cam, env, gymapi.Vec3(0.3, 1.2, 1.3), gymapi.Vec3(0.3, 0, 1.3)
    )
    gym.render_all_camera_sensors(sim)
    d = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_DEPTH)
    hit = np.isfinite(d) & (d > -2.5)
    assert hit.sum() > 200, hit.sum()
    cols = np.where(hit.any(0))[0]
    rows = np.where(hit.any(1))[0]
    r0, r1 = rows.min(), rows.max()
    c0, c1 = cols.min(), cols.max()
    rm, cm = (r0 + r1) // 2, (c0 + c1) // 2
    # notch quadrant: upper part of the bounding box on the notch side.
    # Determine notch side from the data (camera handedness-proof): one
    # upper quadrant must be mostly empty, the other mostly full.
    q_left = hit[r0:rm, c0:cm].mean()
    q_right = hit[r0:rm, cm:c1].mean()
    lo, hi = sorted([q_left, q_right])
    assert lo < 0.25, (q_left, q_right)  # notch visible (hull would fill it)
    assert hi > 0.7, (q_left, q_right)  # solid arm of the L


def test_add_lines_rasterize(gym):
    """add_lines segments appear in camera images (VERDICT r4 item 2 of
    'missing'; reference gymutil.draw_lines —
    /root/reference/test/test01_isaacgym_asset.py:218-219)."""
    sim, envs = _ball_scene(gym, num_envs=1)
    env = envs[0]
    cam = gym.create_camera_sensor(
        env, gymapi.CameraProperties(width=96, height=64)
    )
    gym.set_camera_location(
        cam, env, gymapi.Vec3(1.5, 0, 1.0), gymapi.Vec3(0, 0, 1.0)
    )
    gym.render_all_camera_sensors(sim)
    base = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR).copy()
    viewer = gym.create_viewer(sim, gymapi.CameraProperties())
    verts = np.array([[0, -0.6, 1.0], [0, 0.6, 1.0]], np.float32)
    gym.add_lines(
        viewer, env, 1, verts, np.array([[1.0, 0.0, 0.0]], np.float32)
    )
    gym.render_all_camera_sensors(sim)
    lined = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR)
    changed = (lined != base).reshape(64, 96, 4).any(-1)
    assert changed.sum() > 10, changed.sum()
    # the changed pixels are the line's color (red-dominant)
    px = lined.reshape(64, 96, 4)[changed]
    assert (px[:, 0].astype(int) > px[:, 1].astype(int) + 40).mean() > 0.8
    # clear_lines removes them
    gym.clear_lines(viewer)
    gym.render_all_camera_sensors(sim)
    again = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR)
    assert np.array_equal(np.asarray(again), np.asarray(base))


def test_mesh_normal_mode_flat_vs_smooth(gym):
    """mesh_normal_mode: COMPUTE_PER_VERTEX (default) smooth-shades the
    visual mesh; FROM_ASSET renders flat face normals
    (/root/reference/examples/graphics_materials.py:30)."""
    from test_isaacgym_tpu.assets import create_mesh_asset

    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    ) * 0.3
    f = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32
    )
    imgs = {}
    for mode in (0, 1):
        sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
        mesh = create_mesh_asset("octn", v, f, density=100.0, fix_base_link=True)
        mesh.mesh_normal_mode = mode
        env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
        gym.create_actor(
            env, mesh, gymapi.Transform(gymapi.Vec3(0, 0, 1.0)), "o", 0, 0
        )
        cam = gym.create_camera_sensor(
            env, gymapi.CameraProperties(width=64, height=64)
        )
        gym.set_camera_location(
            cam, env, gymapi.Vec3(1.0, 0.4, 1.2), gymapi.Vec3(0, 0, 1.0)
        )
        gym.render_all_camera_sensors(sim)
        imgs[mode] = (
            gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR)
            .reshape(64, 64, 4)[..., 0]
            .astype(np.int32)
        )
    # smooth shading produces many more distinct intensities across the
    # octahedron than 8 flat faces do
    assert len(np.unique(imgs[0])) > len(np.unique(imgs[1])) + 8, (
        len(np.unique(imgs[0])), len(np.unique(imgs[1])),
    )
