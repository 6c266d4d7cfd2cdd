"""FEM soft-body tests (SURVEY.md N11; physics/soft.py).

Reference behavior modeled: /root/reference/examples/soft_body.py — a tet
icosphere under gravity, Young's/Poisson materials, tet/tri introspection.
"""
import jax
import numpy as np
import pytest

from test_isaacgym_tpu.assets import load_urdf
from test_isaacgym_tpu.core.config import PlaneParams, SimParams, UP_AXIS_Y
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.sim import Simulator
from test_isaacgym_tpu.physics.soft import load_tet, surface_triangles

ASSET_ROOT = "/root/reference/assets"


def test_load_tet():
    v, t = load_tet(ASSET_ROOT + "/urdf/icosphere.tet")
    assert v.shape == (162, 3)
    assert t.shape == (427, 4)
    # unit icosphere
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= 1.0 + 1e-5


def test_surface_triangles_closed():
    v, t = load_tet(ASSET_ROOT + "/urdf/icosphere.tet")
    tris, parents, _ = surface_triangles(t)
    # a closed surface: every edge shared by exactly 2 boundary faces
    edges = {}
    for tri in tris:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = tuple(sorted((tri[a], tri[b])))
            edges[key] = edges.get(key, 0) + 1
    assert all(c == 2 for c in edges.values())
    assert parents.max() < len(t)


def _make_sim(num_envs=2, youngs=None, substeps=3, height=1.2):
    sp = SimParams(dt=1 / 60, substeps=substeps, gravity=(0.0, -9.8, 0.0))
    sp.up_axis = UP_AXIS_Y
    sp.flex.num_outer_iterations = 4
    sp.flex.num_inner_iterations = 20
    sp.flex.relaxation = 0.8
    a = load_urdf(ASSET_ROOT, "urdf/icosphere.urdf", fix_base_link=True)
    a.thickness = 0.1
    b = SceneBuilder(sp)
    pp = PlaneParams()
    pp.normal = (0, 1, 0)
    b.add_ground(pp)
    for e in range(num_envs):
        b.create_env((-3, 0, -3), (3, 3, 3), int(np.sqrt(num_envs)) or 1)
        b.create_actor(e, a, pos=(0, height, 0), name="soft", group=e, filter=1)
    sim = Simulator(*b.finalize())
    # hold the press rail at 0 (the reference's PD-driven rail joint,
    # soft_body.py:137 — without a drive the arm free-falls onto the sphere)
    p0 = sim.params
    sim.params = p0._replace(
        dof_stiffness=p0.dof_stiffness.at[:].set(1e7),
        dof_damping=p0.dof_damping.at[:].set(1e5),
        dof_drive_mode=p0.dof_drive_mode.at[:].set(1),
        # the rail URDF carries no <limit effort>, which parses as 0 and
        # clips the drive to nothing — give the press a real motor
        dof_max_effort=p0.dof_max_effort.at[:].set(1e6),
        # slow press: one-way position projection tunnels if the plate
        # moves more than its half-thickness per substep
        dof_max_velocity=p0.dof_max_velocity.at[:].set(0.5),
    )
    if youngs is not None:
        p = sim.params
        sim.params = p._replace(
            soft_youngs=p.soft_youngs.at[:].set(
                np.asarray(youngs, np.float32)[:, None]
            )
        )
    return sim


@pytest.mark.slow
def test_soft_drop_settles():
    """The tet sphere falls, rests on the plane at the thickness margin,
    keeps most of its height, and doesn't blow up."""
    sim = _make_sim(num_envs=2)
    st = sim.state
    roll = jax.jit(sim.stepper.rollout, static_argnums=3)
    st = roll(st, sim.actions, sim.params, 240)
    p = np.asarray(st.soft_pos)
    assert np.isfinite(p).all()
    y_min = p[..., 1].min(axis=-1)
    y_max = p[..., 1].max(axis=-1)
    # rests near the 0.1 thickness margin, not sunk through the plane
    assert (y_min > -0.02).all() and (y_min < 0.3).all(), y_min
    # a stiff-ish E=1e5 ball keeps the bulk of its 2.0 diameter
    assert (y_max - y_min > 1.0).all(), (y_min, y_max)
    # volume roughly conserved (Neo-Hookean hydrostatic term)
    soft = sim.scene.soft
    tets = soft.tets
    x0 = p[:, tets[:, 0]]
    d0 = p[:, tets[:, 1]] - x0
    d1 = p[:, tets[:, 2]] - x0
    d2 = p[:, tets[:, 3]] - x0
    vol = np.abs(np.einsum("ntj,ntj->nt", np.cross(d0, d1), d2)) / 6.0
    ratio = vol.sum(-1) / soft.rest_vol.sum()
    assert ((ratio > 0.75) & (ratio < 1.1)).all(), ratio


@pytest.mark.slow
def test_soft_stiffness_ordering():
    """Stiffer Young's modulus -> less squash at rest (the material mapping
    the reference randomizes, soft_body.py:120-133)."""
    sim = _make_sim(num_envs=2, youngs=[3e4, 6e5])
    roll = jax.jit(sim.stepper.rollout, static_argnums=3)
    st = roll(sim.state, sim.actions, sim.params, 240)
    p = np.asarray(st.soft_pos)
    h = p[..., 1].max(-1) - p[..., 1].min(-1)
    assert h[1] > h[0] + 0.05, h  # stiff ball stays taller


def test_soft_stress_and_ranges():
    sim = _make_sim(num_envs=2)
    roll = jax.jit(sim.stepper.rollout, static_argnums=3)
    st = roll(sim.state, sim.actions, sim.params, 60)
    stress = np.asarray(
        jax.jit(sim.stepper.soft.tet_stress)(st.soft_pos, sim.params)
    )
    assert stress.shape == (2, 427, 3, 3)
    assert np.isfinite(stress).all()
    # stress tensor symmetric (Cauchy)
    assert np.abs(stress - np.swapaxes(stress, -1, -2)).max() < 1e-2
    n = np.asarray(jax.jit(sim.stepper.soft.tri_normals)(st.soft_pos))
    assert n.shape[1] == len(sim.scene.soft.tris)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_soft_reset_restores():
    sim = _make_sim(num_envs=2)
    roll = jax.jit(sim.stepper.rollout, static_argnums=3)
    sim.state = roll(sim.state, sim.actions, sim.params, 30)
    moved = np.abs(
        np.asarray(sim.state.soft_pos) - np.asarray(sim.initial_state.soft_pos)
    ).max()
    assert moved > 0.01
    sim.reset()
    assert (
        np.asarray(sim.state.soft_pos) == np.asarray(sim.initial_state.soft_pos)
    ).all()


@pytest.mark.slow
def test_soft_press_squeezes():
    """Drive the rail press down onto the settled sphere: contact with the
    press box flattens the top (one-way coupling, icosphere.urdf press)."""
    sim = _make_sim(num_envs=1, height=1.05)
    roll = jax.jit(sim.stepper.rollout, static_argnums=3)
    st = roll(sim.state, sim.actions, sim.params, 120)
    h_free = np.asarray(st.soft_pos)[0, :, 1].max()
    # now command the press down by 1.0
    act = sim.actions._replace(
        dof_pos_target=sim.actions.dof_pos_target.at[:].set(-1.0)
    )
    st2 = roll(st, act, sim.params, 240)
    p2 = np.asarray(st2.soft_pos)
    assert np.isfinite(p2).all()
    # the 2x2 m plate squeezes the (volume-conserving) sphere: material
    # UNDER the plate flattens below the plate bottom while the displaced
    # volume bulges out past the plate edges — so assert on the footprint,
    # not the global max height
    plate_bottom = (1.05 + 1.0 - 1.0) - 0.25 - 0.1  # rail -1: center-half-margin
    under = (np.abs(p2[0, :, 0]) < 0.75) & (np.abs(p2[0, :, 2]) < 0.75)
    if under.any():
        h_press = p2[0, under, 1].max()
        assert h_press < plate_bottom + 0.08, (h_free, h_press, plate_bottom)
    else:
        # frictionless plate: the whole ball squirted out sideways — the
        # press still did its (one-way) job; the ball must have been
        # DISPLACED, not tunneled through
        com = p2[0].mean(0)
        assert np.linalg.norm(com[[0, 2]]) > 0.5, com
    assert p2[0, :, 1].min() > -0.05


def test_soft_settles_on_sphere_capsule_hull():
    """Soft bodies settle on non-box rigid colliders (VERDICT r4 item 6 —
    sphere/capsule/hull in the soft projection loop; box-only before r5).
    Three soft icospheres drop onto (a) a rigid sphere, (b) a cradle of
    two horizontal capsules, (c) a convex-hull frustum pedestal; each must
    come to rest ON its pedestal, not fall through. The icosphere's fem
    origin is (0, -0.5, 0) in the actor frame (icosphere.urdf:40), so the
    actors spawn at y=+0.5 to center the solid over the pedestals."""
    from test_isaacgym_tpu.assets import (
        create_capsule,
        create_mesh_asset,
        create_sphere,
    )

    sp = SimParams(dt=1 / 60, substeps=3, gravity=(0.0, 0.0, -9.8))
    sp.flex.num_outer_iterations = 4
    sp.flex.num_inner_iterations = 20
    a = load_urdf(ASSET_ROOT, "urdf/icosphere.urdf", fix_base_link=True)
    a.thickness = 0.05
    ball = create_sphere(0.5, density=1000.0, fix_base_link=True)
    cap = create_capsule(0.3, 0.8, density=1000.0, fix_base_link=True)
    # squat convex frustum: wide base, flat 0.7-half-width top at z=0.4
    fv = np.array(
        [[sx, sy, 0.0] for sx in (-1, 1) for sy in (-1, 1)]
        + [[0.7 * sx, 0.7 * sy, 0.4] for sx in (-1, 1) for sy in (-1, 1)],
        np.float32,
    )
    ff = np.array(
        [[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7],
         [0, 4, 1], [1, 4, 5], [1, 5, 3], [3, 5, 7],
         [3, 7, 2], [2, 7, 6], [2, 6, 0], [0, 6, 4]], np.int32
    )
    frustum = create_mesh_asset("frustum", fv, ff, density=1000.0, fix_base_link=True)
    yq = (0.0, 0.70710678, 0.0, 0.70710678)  # capsule axis z -> x
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    b.create_env((-2, -2, 0), (8, 2, 4), 1)
    b.create_actor(0, ball, pos=(0, 0, 0.5), name="ball", group=0, filter=1)
    b.create_actor(0, cap, pos=(3.0, -0.35, 0.3), quat=yq, name="c1", group=0, filter=1)
    b.create_actor(0, cap, pos=(3.0, 0.35, 0.3), quat=yq, name="c2", group=0, filter=1)
    b.create_actor(0, frustum, pos=(6.0, 0, 0), name="frustum", group=0, filter=1)
    for x, z0 in ((0.0, 2.2), (3.0, 1.6), (6.0, 1.7)):
        b.create_actor(0, a, pos=(x, 0.5, z0), name=f"soft{x}", group=0, filter=1)
    sim = Simulator(*b.finalize())
    st = sim.state
    roll = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 10))
    V = None
    min_sph = np.inf
    for _ in range(15):  # 2.5 s, sampled every 10 steps
        st = roll(st)
        pos = np.asarray(st.soft_pos[0])
        assert np.isfinite(pos).all()
        V = pos.shape[0] // 3
        d = np.linalg.norm(pos[:V] - np.array([0, 0, 0.5]), axis=-1)
        # sphere projection: verts may touch the r+margin shell (0.55)
        # but NEVER penetrate the rigid sphere (one-way projection has no
        # collider friction, so the ball may slide off — penetration
        # freedom is the invariant, not balancing)
        assert d.min() > 0.5 - 5e-3, d.min()
        min_sph = min(min_sph, float(d.min()))
    assert min_sph < 0.60, min_sph  # it did land on the sphere
    pos = np.asarray(st.soft_pos[0])
    z_cap = pos[V : 2 * V, 2]
    z_hull = pos[2 * V :, 2]
    # geometric traps hold without friction: the capsule cradle and the
    # flat-topped frustum keep their balls off the ground
    assert z_cap.min() > 0.35, z_cap.min()  # capsule tops at 0.6
    assert z_hull.min() > 0.30, z_hull.min()  # frustum top at 0.4


def test_soft_surface_renders():
    """Soft surface triangles appear in camera images (VERDICT r4 item 6:
    'they render as nothing now'). The soft icosphere must occupy pixels
    whose depth differs from the background."""
    from test_isaacgym_tpu import gymapi

    gym = gymapi.acquire_gym()
    sp = gymapi.SimParams()
    sp.gravity = gymapi.Vec3(0, 0, -9.8)
    sim = gym.create_sim(0, 0, gymapi.SIM_FLEX, sp)
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions()
    opts.thickness = 0.05
    soft = gym.load_asset(sim, ASSET_ROOT, "urdf/icosphere.urdf", opts)
    env = gym.create_env(sim, gymapi.Vec3(-3, -3, 0), gymapi.Vec3(3, 3, 4), 1)
    gym.create_actor(
        env, soft, gymapi.Transform(gymapi.Vec3(0, 0, 1.2)), "soft", 0, 1
    )
    cam = gym.create_camera_sensor(
        env, gymapi.CameraProperties(width=96, height=72)
    )
    gym.set_camera_location(
        cam, env, gymapi.Vec3(3.0, 0, 1.2), gymapi.Vec3(0, 0, 1.2)
    )
    gym.prepare_sim(sim)
    gym.render_all_camera_sensors(sim)
    d = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_DEPTH)
    # the sphere sits dead center 3 m from the camera: a block of pixels
    # at depth ~-2 (vs ground/sky elsewhere)
    ball_px = np.isfinite(d) & (d > -2.5) & (d < -1.5)
    assert ball_px.sum() > 40, ball_px.sum()
    r0, r1 = 72 // 2 - 6, 72 // 2 + 6
    c0, c1 = 96 // 2 - 6, 96 // 2 + 6
    assert ball_px[r0:r1, c0:c1].mean() > 0.8
