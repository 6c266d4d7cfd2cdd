import jax.numpy as jnp
import numpy as np
import pytest

from test_isaacgym_tpu.assets import load_urdf
from test_isaacgym_tpu.assets.types import (
    AssetSpec,
    GeomSpec,
    JointSpec,
    LinkSpec,
)
from test_isaacgym_tpu.core.scene import SceneBuilder, expand_asset
from test_isaacgym_tpu.physics import dynamics, kinematics
from test_isaacgym_tpu.physics.kinematics import ArtTopo, fk, jacobian, topo_from_group

ROOT = "/root/reference/assets"


def make_topo(asset):
    b = SceneBuilder()
    b.create_env((-1, -1, 0), (1, 1, 0), 1)
    b.create_actor(0, asset, name="a")
    scene, state, params = b.finalize()
    return topo_from_group(scene.art_groups[0])


def pendulum_asset(length=1.0, mass=2.0, fixed=True, axis=(0, 1, 0)):
    """Point-ish mass at distance `length` below a revolute joint at the root."""
    import numpy as np

    root = LinkSpec(name="base", mass=1.0, inertia=np.eye(3) * 1e-2, explicit_inertial=True)
    bob = LinkSpec(
        name="bob",
        parent=0,
        joint=JointSpec(name="hinge", jtype="revolute", axis=axis),
        mass=mass,
        com=(0, 0, -length),
        inertia=np.eye(3) * 1e-6,
        explicit_inertial=True,
    )
    return AssetSpec(name="pendulum", links=[root, bob], fix_base_link=fixed)


def test_fk_single_revolute():
    topo = make_topo(pendulum_asset())
    rp = jnp.array([0.0, 0.0, 2.0])
    rq = jnp.array([0.0, 0.0, 0.0, 1.0])
    z3 = jnp.zeros(3)
    q = jnp.array([np.pi / 2])
    qd = jnp.array([0.0])
    pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, qd)
    # hinge about +y by 90deg: link frame rotated; com (0,0,-1) maps to (+1? ...)
    # Rotation about y by +90: z->x... vector (0,0,-1) -> (-1, 0, 0)
    from test_isaacgym_tpu.math import quat_rotate

    com_w = pos[1] + quat_rotate(quat[1], jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(pos[1]), [0, 0, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(com_w), [-1, 0, 2], atol=1e-5)


def test_fk_velocity_consistency():
    """linvel from FK must equal d(pos)/dq * qd (finite difference)."""
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf", fix_base_link=True)
    topo = make_topo(a)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1, 1, a.num_dofs), jnp.float32)
    qd = jnp.asarray(rng.uniform(-1, 1, a.num_dofs), jnp.float32)
    rp = jnp.zeros(3)
    rq = jnp.array([0.0, 0, 0, 1])
    z3 = jnp.zeros(3)
    pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, qd)
    eps = 1e-3
    pos2, _, _, _ = fk(topo, rp, rq, z3, z3, q + eps * qd, qd)
    fd = (np.asarray(pos2) - np.asarray(pos)) / eps
    np.testing.assert_allclose(np.asarray(lin), fd, atol=2e-2)


def test_jacobian_matches_fd():
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf", fix_base_link=True)
    topo = make_topo(a)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, a.num_dofs), jnp.float32)
    rp, rq, z3 = jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3)
    pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, jnp.zeros_like(q))
    J = jacobian(topo, pos, quat)
    # column i = link velocities for qd = e_i
    for i in range(a.num_dofs):
        qd = jnp.zeros(a.num_dofs).at[i].set(1.0)
        _, _, lin_i, ang_i = fk(topo, rp, rq, z3, z3, q, qd)
        np.testing.assert_allclose(np.asarray(J[..., 0:3, i]), np.asarray(lin_i), atol=1e-4)
        np.testing.assert_allclose(np.asarray(J[..., 3:6, i]), np.asarray(ang_i), atol=1e-4)


def test_mass_matrix_vs_jacobian_construction():
    """CRBA M must equal sum_b J_b^T [[mI,0],[0,RIR^T]] J_b with com jacobians."""
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf", fix_base_link=True)
    topo = make_topo(a)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-1, 1, a.num_dofs), jnp.float32)
    rp, rq, z3 = jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3)
    pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, jnp.zeros_like(q))
    M = np.asarray(dynamics.mass_matrix(topo, pos, quat))
    J = np.asarray(jacobian(topo, pos, quat))
    m, com_w, ic_w = (np.asarray(x) for x in dynamics.link_world_inertia(topo, quat))
    D = a.num_dofs
    M_ref = np.zeros((D, D))
    for b in range(topo.num_links):
        Jl, Ja = J[b, 0:3], J[b, 3:6]
        # shift linear jacobian to com: column k gives v_com = Jl[:,k] + Ja[:,k] x c
        c = com_w[b]
        Jc = Jl + np.cross(Ja, np.broadcast_to(c, (D, 3)).T, axis=0)
        M_ref += m[b] * Jc.T @ Jc + Ja.T @ ic_w[b] @ Ja
    np.testing.assert_allclose(M, M_ref, rtol=2e-3, atol=1e-4)
    # symmetry + positive definiteness
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_pendulum_gravity_torque():
    """Static pendulum: qdd = -m*g*L*sin(theta) / (m*L^2) for point mass."""
    L, m = 1.0, 2.0
    topo = make_topo(pendulum_asset(L, m))
    g = jnp.array([0.0, 0.0, -9.8])
    for theta in [0.0, 0.3, np.pi / 2, -0.7]:
        q = jnp.array([theta], jnp.float32)
        qd = jnp.array([0.0], jnp.float32)
        rp, rq, z3 = jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3)
        pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, qd)
        qdd, _ = dynamics.forward_dynamics(
            topo, pos, quat, lin, ang, qd,
            tau=jnp.zeros(1), h=0.0, d_eff=jnp.zeros(1), gravity=g,
        )
        # hinge +y at origin, com at (0,0,-L) rotated: angle theta about y moves
        # com to (-L sin, 0, -L cos); gravity torque about y: tau_y = (r x F)_y
        r = np.array([-L * np.sin(theta), 0, -L * np.cos(theta)])
        F = np.array([0, 0, -9.8 * m])
        tau = np.cross(r, F)[1]
        expect = tau / (m * L * L)
        np.testing.assert_allclose(np.asarray(qdd)[0], expect, rtol=1e-4, atol=1e-5)


def test_floating_base_free_fall():
    """Floating-base articulation in gravity: base linear acc = g, others 0."""
    a = load_urdf(ROOT, "urdf/franka_description/robots/franka_panda.urdf", fix_base_link=False)
    topo = make_topo(a)
    rng = np.random.default_rng(11)
    D = a.num_dofs
    q = jnp.asarray(rng.uniform(-0.5, 0.5, D), jnp.float32)
    qd = jnp.zeros(D, jnp.float32)
    rp, rq, z3 = jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3)
    pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, qd)
    g = jnp.array([0.0, 0.0, -9.8])
    qdd, _ = dynamics.forward_dynamics(
        topo, pos, quat, lin, ang, qd,
        tau=jnp.zeros(6 + D), h=0.0, d_eff=jnp.zeros(6 + D), gravity=g,
    )
    out = np.asarray(qdd)
    np.testing.assert_allclose(out[0:3], [0, 0, -9.8], atol=1e-3)
    np.testing.assert_allclose(out[3:6], 0, atol=1e-3)
    np.testing.assert_allclose(out[6:], 0, atol=2e-3)


def test_energy_conservation_pendulum():
    """Undamped pendulum integrated semi-implicitly holds energy to ~1%."""
    L, m = 1.0, 1.0
    topo = make_topo(pendulum_asset(L, m))
    g = jnp.array([0.0, 0.0, -9.8])
    h = 1e-3
    q = jnp.array([1.2], jnp.float32)
    qd = jnp.array([0.0], jnp.float32)
    rp, rq, z3 = jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3)

    import jax

    @jax.jit
    def step(q, qd):
        pos, quat, lin, ang = fk(topo, rp, rq, z3, z3, q, qd)
        qdd, _ = dynamics.forward_dynamics(
            topo, pos, quat, lin, ang, qd,
            tau=jnp.zeros(1), h=0.0, d_eff=jnp.zeros(1), gravity=g,
        )
        qd2 = qd + h * qdd
        return q + h * qd2, qd2

    def energy(q, qd):
        th, w = float(q[0]), float(qd[0])
        return 0.5 * m * L * L * w * w + m * 9.8 * (-L * np.cos(th))

    e0 = energy(q, qd)
    for _ in range(2000):
        q, qd = step(q, qd)
    e1 = energy(q, qd)
    assert abs(e1 - e0) / abs(e0) < 0.02, (e0, e1)


def test_dense_vs_unrolled_parity():
    """The two trace-time CRBA/RNEA forms (dense masked vs composite-unrolled,
    dynamics._use_unrolled) must agree on fixed- and floating-base chains."""
    import os

    import jax

    for fixed in (True, False):
        a = load_urdf(
            ROOT, "urdf/franka_description/robots/franka_panda.urdf", fix_base_link=fixed
        )
        topo = make_topo(a)
        key = jax.random.PRNGKey(3)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        D = topo.num_dofs
        rp = jnp.array([0.0, 0.0, 0.5])
        rq = jnp.array([0.0, 0.0, 0.0, 1.0])
        rl = jax.random.normal(k3, (3,)) * 0.1
        ra = jax.random.normal(k4, (3,)) * 0.1
        q = jax.random.normal(k1, (D,)) * 0.5
        qd = jax.random.normal(k2, (D,)) * 0.5
        pos, quat, lin, ang = fk(topo, rp, rq, rl, ra, q, qd)
        origin = pos[..., 0, :]
        m, com_w, ic_w = dynamics.link_world_inertia(topo, quat)
        com_rel = (pos - origin[..., None, :]) + com_w
        S = dynamics.motion_subspaces(topo, pos, quat, origin)
        vel_sp = dynamics.spatial_velocities(topo, pos, lin, ang, origin)
        g = jnp.array([0.0, 0.0, -9.8])

        os.environ["TIG_DYNAMICS_FORM"] = "dense"
        try:
            M_d = dynamics.crba(topo, S, m, com_rel, ic_w)
            C_d = dynamics.rnea_bias(topo, S, m, com_rel, ic_w, vel_sp, qd, g)
            os.environ["TIG_DYNAMICS_FORM"] = "unrolled"
            M_u = dynamics.crba(topo, S, m, com_rel, ic_w)
            C_u = dynamics.rnea_bias(topo, S, m, com_rel, ic_w, vel_sp, qd, g)
        finally:
            del os.environ["TIG_DYNAMICS_FORM"]
        scale = float(jnp.abs(M_u).max())
        np.testing.assert_allclose(
            np.asarray(M_d), np.asarray(M_u), atol=2e-5 * scale, rtol=2e-4
        )
        cs = float(jnp.abs(C_u).max()) + 1.0
        np.testing.assert_allclose(
            np.asarray(C_d), np.asarray(C_u), atol=2e-5 * cs, rtol=2e-4
        )
