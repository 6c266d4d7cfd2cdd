import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from test_isaacgym_tpu.math import (
    matrix_to_quat,
    orientation_error,
    quat_conjugate,
    quat_exp_map,
    quat_from_angle_axis,
    quat_from_euler_zyx,
    quat_identity,
    quat_inverse,
    quat_log_map,
    quat_mul,
    quat_rotate,
    quat_rotate_inverse,
    quat_to_angle_axis,
    quat_to_euler_zyx,
    quat_to_matrix,
    transform_apply,
    transform_inverse,
    transform_mul,
)

RNG = np.random.default_rng(17)


def rand_quats(n):
    q = RNG.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy():
    a, b = rand_quats(64), rand_quats(64)
    got = np.asarray(quat_mul(jnp.array(a), jnp.array(b)))
    want = (R.from_quat(a) * R.from_quat(b)).as_quat()
    # q and -q are the same rotation
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-5)


def test_quat_rotate_matches_scipy():
    q = rand_quats(64)
    v = RNG.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(quat_rotate(jnp.array(q), jnp.array(v)))
    np.testing.assert_allclose(got, R.from_quat(q).apply(v), atol=1e-4)
    back = np.asarray(quat_rotate_inverse(jnp.array(q), jnp.array(got)))
    np.testing.assert_allclose(back, v, atol=1e-4)


def test_quat_matrix_roundtrip():
    q = rand_quats(128)
    m = quat_to_matrix(jnp.array(q))
    np.testing.assert_allclose(np.asarray(m), R.from_quat(q).as_matrix(), atol=1e-5)
    q2 = np.asarray(matrix_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, sign * q, atol=1e-4)


def test_euler_zyx_matches_scipy_intrinsic():
    rpy = RNG.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    q = quat_from_euler_zyx(jnp.array(rpy[:, 0]), jnp.array(rpy[:, 1]), jnp.array(rpy[:, 2]))
    # intrinsic ZYX == scipy 'ZYX' with (yaw, pitch, roll) ordering
    want = R.from_euler("ZYX", rpy[:, ::-1]).as_quat()
    got = np.asarray(q)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-5)
    r2, p2, y2 = quat_to_euler_zyx(q)
    np.testing.assert_allclose(np.asarray(r2), rpy[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2), rpy[:, 1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), rpy[:, 2], atol=1e-4)


def test_angle_axis_roundtrip():
    angle = RNG.uniform(0.01, 3.0, size=32).astype(np.float32)
    axis = RNG.normal(size=(32, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    q = quat_from_angle_axis(jnp.array(angle), jnp.array(axis))
    a2, ax2 = quat_to_angle_axis(q)
    np.testing.assert_allclose(np.asarray(a2), angle, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ax2), axis, atol=1e-3)


def test_exp_log_roundtrip():
    v = RNG.normal(size=(32, 3)).astype(np.float32)
    v *= (2.8 / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 2.8)).astype(
        np.float32
    )  # log maps back into |v| < pi
    q = quat_exp_map(jnp.array(v))
    v2 = np.asarray(quat_log_map(q))
    np.testing.assert_allclose(v2, v, atol=1e-4)


def test_identity_inverse():
    q = rand_quats(8)
    e = np.asarray(quat_mul(jnp.array(q), quat_inverse(jnp.array(q))))
    np.testing.assert_allclose(e, np.tile([0, 0, 0, 1.0], (8, 1)), atol=1e-5)
    assert np.allclose(np.asarray(quat_identity((8,))), np.tile([0, 0, 0, 1.0], (8, 1)))
    np.testing.assert_allclose(
        np.asarray(quat_conjugate(jnp.array(q)))[:, :3], -q[:, :3]
    )


def test_orientation_error_zero_and_direction():
    q = jnp.array(rand_quats(8))
    np.testing.assert_allclose(np.asarray(orientation_error(q, q)), 0.0, atol=1e-6)
    # small rotation about z: error should be ~ +angle/2 * z toward desired
    dq = quat_from_angle_axis(jnp.array(0.1), jnp.array([0.0, 0.0, 1.0]))
    err = np.asarray(orientation_error(quat_mul(dq, q[0]), q[0]))
    assert err[2] > 0.04 and abs(err[0]) < 1e-3 and abs(err[1]) < 1e-3


def test_transform_compose_inverse():
    pa = jnp.array(RNG.normal(size=(16, 3)).astype(np.float32))
    qa = jnp.array(rand_quats(16))
    pb = jnp.array(RNG.normal(size=(16, 3)).astype(np.float32))
    qb = jnp.array(rand_quats(16))
    x = jnp.array(RNG.normal(size=(16, 3)).astype(np.float32))
    # (A*B)(x) == A(B(x))
    pc, qc = transform_mul(pa, qa, pb, qb)
    lhs = transform_apply(pc, qc, x)
    rhs = transform_apply(pa, qa, transform_apply(pb, qb, x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)
    # A^-1(A(x)) == x
    pi, qi = transform_inverse(pa, qa)
    back = transform_apply(pi, qi, transform_apply(pa, qa, x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
