import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_isaacgym_tpu.assets import create_box, create_sphere, load_urdf
from test_isaacgym_tpu.assets.types import DOF_MODE_POS
from test_isaacgym_tpu.core.config import PlaneParams, SimParams
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.state import zero_actions
from test_isaacgym_tpu.physics.step import Stepper

ROOT = "/root/reference/assets"


def build(assets_and_poses, num_envs=2, ground=True, dt=1 / 60, substeps=2,
          gravity=(0, 0, -9.8)):
    sp = SimParams(dt=dt, substeps=substeps, gravity=gravity)
    b = SceneBuilder(sp)
    if ground:
        b.add_ground(PlaneParams())
    for e in range(num_envs):
        b.create_env((-2, -2, 0), (2, 2, 0), 10)
        for k, (asset, pos) in enumerate(assets_and_poses):
            b.create_actor(e, asset, pos=pos, name=f"a{k}", group=e, filter=0)
    scene, state, params = b.finalize()
    stepper = Stepper(scene)
    state = stepper.refresh_body_state(state, params)
    actions = zero_actions(scene.num_envs, scene.num_dofs_per_env,
                           scene.num_bodies_per_env)
    return scene, stepper, state, actions, params


def run(stepper, state, actions, params, steps):
    step = jax.jit(stepper.step)
    for _ in range(steps):
        state = step(state, actions, params)
    return state


def test_free_fall_no_ground():
    ball = create_sphere(0.1, density=1000.0)
    scene, stepper, state, actions, params = build(
        [(ball, (0, 0, 10.0))], ground=False
    )
    t = 0.5
    state = run(stepper, state, actions, params, int(t * 60))
    z = np.asarray(state.root_pos)[0, 0, 2]
    expect = 10.0 - 0.5 * 9.8 * t * t
    assert abs(z - expect) < 0.05, (z, expect)
    vz = np.asarray(state.root_linvel)[0, 0, 2]
    assert abs(vz + 9.8 * t) < 0.05


def test_ball_rests_on_plane():
    ball = create_sphere(0.2, density=1000.0)
    scene, stepper, state, actions, params = build([(ball, (0, 0, 1.0))])
    state = run(stepper, state, actions, params, 120)
    z = np.asarray(state.root_pos)[:, 0, 2]
    np.testing.assert_allclose(z, 0.2, atol=0.02)
    v = np.asarray(state.root_linvel)[:, 0]
    assert np.all(np.abs(v) < 0.05)
    # contact force approximately balances gravity
    m = float(np.asarray(params.body_mass)[0, 0])
    fz = np.asarray(state.contact_force)[0, 0, 2]
    assert abs(fz - m * 9.8) / (m * 9.8) < 0.25, (fz, m * 9.8)


def test_box_rests_on_plane():
    box = create_box(0.4, 0.4, 0.4, density=500.0)
    scene, stepper, state, actions, params = build([(box, (0, 0, 0.5))])
    state = run(stepper, state, actions, params, 180)
    z = np.asarray(state.root_pos)[:, 0, 2]
    np.testing.assert_allclose(z, 0.2, atol=0.02)
    quat = np.asarray(state.root_quat)[0, 0]
    assert abs(quat[3]) > 0.99  # didn't topple


@pytest.mark.slow
def test_sphere_sphere_stack():
    ball = create_sphere(0.2, density=1000.0)
    scene, stepper, state, actions, params = build(
        [(ball, (0, 0, 0.3)), (ball, (0.0, 0.02, 0.75))]
    )
    state = run(stepper, state, actions, params, 240)
    z = np.asarray(state.root_pos)[0, :, 2]
    assert z[0] == pytest.approx(0.2, abs=0.03)
    # top ball rolled off or stacked; either way it's on the ground or on top
    assert z[1] < 0.65 and z[1] > 0.15


def test_collision_filter_disables_contact():
    ball = create_sphere(0.2, density=1000.0)
    sp = SimParams()
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    b.create_env((-2, -2, 0), (2, 2, 0), 10)
    # same filter bit set -> no mutual collision
    b.create_actor(0, ball, pos=(0, 0, 0.2), name="a", group=0, filter=1)
    b.create_actor(0, ball, pos=(0, 0, 0.6), name="b", group=0, filter=1)
    scene, state, params = b.finalize()
    stepper = Stepper(scene)
    state = stepper.refresh_body_state(state, params)
    actions = zero_actions(scene.num_envs, scene.num_dofs_per_env, scene.num_bodies_per_env)
    state = run(stepper, state, actions, params, 120)
    z = np.asarray(state.root_pos)[0, :, 2]
    # balls interpenetrate: both rest at radius height
    np.testing.assert_allclose(z, 0.2, atol=0.03)


def test_cartpole_pd_position_drive():
    cp = load_urdf(ROOT, "urdf/cartpole.urdf", fix_base_link=True)
    scene, stepper, state, actions, params = build(
        [(cp, (0, 0, 2.0))], ground=False, num_envs=4
    )
    params = params._replace(
        dof_stiffness=jnp.full_like(params.dof_stiffness, 200.0),
        dof_damping=jnp.full_like(params.dof_damping, 20.0),
        dof_drive_mode=jnp.full_like(params.dof_drive_mode, DOF_MODE_POS),
    )
    actions = actions._replace(
        dof_pos_target=jnp.tile(jnp.array([1.5, 0.0]), (4, 1))
    )
    state = run(stepper, state, actions, params, 300)
    q = np.asarray(state.dof_pos)
    np.testing.assert_allclose(q[:, 0], 1.5, atol=0.05)
    ang_err = np.abs((q[:, 1] + np.pi) % (2 * np.pi) - np.pi)
    np.testing.assert_allclose(ang_err, 0.0, atol=0.2)


@pytest.mark.slow
def test_stiff_pd_stable():
    """Stiffness 1e6 at dt=1/60 must not explode (implicit PD)."""
    fr = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf",
                   fix_base_link=True)
    scene, stepper, state, actions, params = build(
        [(fr, (0, 0, 0))], ground=False, num_envs=2
    )
    params = params._replace(
        dof_stiffness=jnp.full_like(params.dof_stiffness, 1e6),
        dof_damping=jnp.full_like(params.dof_damping, 1e3),
        dof_drive_mode=jnp.full_like(params.dof_drive_mode, DOF_MODE_POS),
    )
    target = jnp.tile(
        jnp.array([0.0, -0.5, 0.0, -2.0, 0.0, 2.0, 0.8, 0.02, 0.02]), (2, 1)
    )
    actions = actions._replace(dof_pos_target=target)
    state = run(stepper, state, actions, params, 120)
    q = np.asarray(state.dof_pos)
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q, np.asarray(target), atol=0.05)


def test_dof_limits_enforced():
    cp = load_urdf(ROOT, "urdf/cartpole.urdf", fix_base_link=True)
    scene, stepper, state, actions, params = build(
        [(cp, (0, 0, 2.0))], ground=False, num_envs=1
    )
    # drive the slider past its +-4 limit with velocity mode
    from test_isaacgym_tpu.assets.types import DOF_MODE_VEL

    params = params._replace(
        dof_damping=jnp.full_like(params.dof_damping, 500.0),
        dof_drive_mode=jnp.full_like(params.dof_drive_mode, DOF_MODE_VEL),
    )
    actions = actions._replace(dof_vel_target=jnp.array([[5.0, 0.0]]))
    state = run(stepper, state, actions, params, 240)
    q = np.asarray(state.dof_pos)
    assert q[0, 0] <= 4.0 + 1e-4


def test_rollout_scan_matches_loop():
    ball = create_sphere(0.1)
    scene, stepper, state, actions, params = build([(ball, (0, 0, 5.0))])
    s_loop = run(stepper, state, actions, params, 30)
    s_scan = jax.jit(lambda s: stepper.rollout(s, actions, params, 30))(state)
    np.testing.assert_allclose(
        np.asarray(s_loop.root_pos), np.asarray(s_scan.root_pos), atol=1e-5
    )
