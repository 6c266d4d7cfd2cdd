"""Vecenv suite tests: CCLVF guidance, visual servo, UAV-car env
(the reference's test04/test06/test10 behaviors — SURVEY.md §3.3)."""
import numpy as np
import pytest

import test_isaacgym_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from test_isaacgym_tpu.control.guidance import cclvf, heading_quat
from test_isaacgym_tpu.control.servo import (
    camera_matrix,
    pixel_to_ray,
    recenter_rotation,
    servo_ext_pixel,
)


def test_cclvf_converges_to_loiter_circle():
    """A particle following the field ends on the radius-10 circle moving at
    `speed` (the field's defining property — controller3.py:58-88)."""
    pos = jnp.array([[25.0, 3.0, 5.0], [-14.0, 8.0, 2.0], [0.5, 0.2, 0.0]])
    target = jnp.zeros((3, 3))
    dt = 1 / 60

    def step(p, _):
        v = cclvf(p, target, speed=10.0, radius=10.0)
        return p + dt * v, None

    p, _ = jax.lax.scan(step, pos, None, length=1200)
    r = jnp.linalg.norm(p[:, :2], axis=1)
    assert np.allclose(np.asarray(r), 10.0, atol=0.2), r
    v = cclvf(p, target, speed=10.0, radius=10.0)
    # on the circle, speed is `speed` and motion is tangential
    sp = jnp.linalg.norm(v[:, :2], axis=1)
    assert np.allclose(np.asarray(sp), 10.0, atol=0.2)
    radial = jnp.einsum("nk,nk->n", v[:, :2], p[:, :2]) / r
    assert np.all(np.abs(np.asarray(radial)) < 0.5)


def test_cclvf_speed_normalized_everywhere():
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(-50, 50, (64, 3)))
    v = cclvf(pos, jnp.zeros((64, 3)), speed=7.0, radius=5.0)
    sp = np.asarray(jnp.linalg.norm(v[:, :2], axis=1))
    assert np.allclose(sp, 7.0, atol=1e-3)


def test_heading_quat():
    v = jnp.array([[1.0, 1.0, 0.0]])
    q = heading_quat(v)
    yaw = 2 * np.arctan2(float(q[0, 2]), float(q[0, 3]))
    assert abs(yaw - np.pi / 4) < 1e-6


def test_servo_recenters_target():
    """After recenter_rotation the target ray reprojects to the image center
    (the property the reference's C++ original asserts —
    servo_controller.py:169-177)."""
    from test_isaacgym_tpu.render.camera import look_at_quat, quat_to_mat_np

    K = camera_matrix(640, 480, 90.0)
    rng = np.random.RandomState(1)
    R = jnp.asarray(
        np.stack([quat_to_mat_np(look_at_quat(np.zeros(3), rng.randn(3))) for _ in range(8)]),
        jnp.float32,
    )
    pix = jnp.asarray(rng.uniform(-200, 200, (8, 2)), jnp.float32)
    ray = pixel_to_ray(jnp.array([320.0, 240.0]) + pix, K)
    v_w = jnp.einsum("nij,nj->ni", R, ray)
    R2, rpy = recenter_rotation(R, pix, K)
    rel = jnp.einsum("nji,nj->ni", R2, v_w)
    u = 320 + K[0, 0] * (-rel[:, 1] / rel[:, 0])
    v = 240 + K[1, 1] * (-rel[:, 2] / rel[:, 0])
    assert float(jnp.abs(u - 320).max()) < 1.0  # sub-pixel (float32)
    assert float(jnp.abs(v - 240).max()) < 1.0
    # zero pixel error -> zero servo command
    rpy0 = servo_ext_pixel(R, jnp.zeros((8, 2)), K)
    assert float(jnp.abs(rpy0).max()) < 1e-5


def test_pixel_ray_projection_roundtrip():
    K = camera_matrix(320, 240, 75.0)
    pix = jnp.asarray(np.random.RandomState(2).uniform(0, 240, (16, 2)), jnp.float32)
    ray = pixel_to_ray(pix, K)
    u = K[0, 2] + K[0, 0] * (-ray[:, 1] / ray[:, 0])
    v = K[1, 2] + K[1, 1] * (-ray[:, 2] / ray[:, 0])
    assert np.allclose(np.asarray(u), np.asarray(pix[:, 0]), atol=1e-3)
    assert np.allclose(np.asarray(v), np.asarray(pix[:, 1]), atol=1e-3)


@pytest.fixture(scope="module")
def uav_env():
    from test_isaacgym_tpu.envs.uav_car import UavCarEnv

    return UavCarEnv(num_envs=4)


def test_uav_car_rollout(uav_env):
    """test06/test10 behavior: cars loiter their per-env target circle, the
    servo keeps every car near the image center."""
    final, (pixels, rpy) = jax.jit(lambda s: uav_env.rollout(600, s))(
        uav_env.init_state
    )
    # cars on their loiter circles (radius 10 around env target)
    car = final.sim.root_pos[:, uav_env.car_slot]
    r = jnp.linalg.norm(car[:, :2] - uav_env.target_w[:, :2], axis=1)
    assert np.allclose(np.asarray(r), 10.0, atol=0.5), r
    # servo converged: car's pixel is near the center at the end
    pix = uav_env.car_pixel(final)
    err = np.asarray(
        jnp.linalg.norm(
            pix - jnp.array([uav_env.cam_width / 2, uav_env.cam_height / 2]), axis=1
        )
    )
    assert (err < 2.0).all(), err


def test_torch_utils_matches_jax_quat():
    from test_isaacgym_tpu import torch_utils as tu
    from test_isaacgym_tpu.math.quat import quat_mul as jq_mul
    from test_isaacgym_tpu.math.quat import quat_rotate as jq_rot

    rng = np.random.RandomState(4)
    a = rng.randn(8, 4)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.randn(8, 4)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    v = rng.randn(8, 3)
    got = np.asarray(tu.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(jq_mul(jnp.asarray(a), jnp.asarray(b)))
    assert np.allclose(got, want, atol=1e-5)
    got_r = np.asarray(tu.quat_apply(jnp.asarray(a), jnp.asarray(v)))
    want_r = np.asarray(jq_rot(jnp.asarray(a), jnp.asarray(v)))
    assert np.allclose(got_r, want_r, atol=1e-5)
    # torch path agrees too
    import torch

    got_t = tu.quat_mul(torch.tensor(a), torch.tensor(b)).numpy()
    assert np.allclose(got_t, want, atol=1e-5)
    ang, ax = tu.quat_to_angle_axis(jnp.asarray(a))
    back = np.asarray(tu.quat_from_angle_axis(ang, ax))
    flip = np.sign(back[:, 3:4]) * np.sign(a[:, 3:4])
    assert np.allclose(back * flip, a, atol=1e-4)
