"""Visual-servo gimbal control, batched in JAX.

Re-derivation of the pixel-error -> gimbal-angle algorithm of the reference's
servo controllers (behavioral spec:
/root/reference/common/secondary_control_vecenv.py:99-200 `servo_ext_pixel`;
scalar original servo_controller.py:108-182, itself a port of a validated C++
Eigen routine). Given where the target currently lands on the image, compute
roll/pitch/yaw for the camera gimbal so the optical axis re-centers it.

Conventions here: camera body frame x-forward/y-left/z-up (the framework's
camera transform convention), pixel origin top-left, +u right, +v down.
`camera_matrix` is the 3x3 pinhole intrinsics (fx, fy, cx, cy).
"""
from __future__ import annotations

import jax.numpy as jnp


def camera_matrix(width: int, height: int, hfov_deg: float) -> jnp.ndarray:
    """Pinhole intrinsics matching the rasterizer/world_to_pixel chain
    (fx = w/2 / tan(hfov/2); the reference uses fx = width/2 at its default
    90-degree fov — controller6.py:151-155)."""
    t = jnp.tan(jnp.deg2rad(hfov_deg) / 2)
    fx = width / 2 / t
    return jnp.array(
        [[fx, 0.0, width / 2], [0.0, fx, height / 2], [0.0, 0.0, 1.0]]
    )


def pixel_to_ray(pixel, cam_matrix):
    """Pixel (..., 2) -> unit ray (..., 3) in the camera BODY frame
    (x forward, y left, z up). Inverse of the projection
    u = cx + fx*(-y/x), v = cy + fy*(-z/x)."""
    fx = cam_matrix[0, 0]
    fy = cam_matrix[1, 1]
    cx = cam_matrix[0, 2]
    cy = cam_matrix[1, 2]
    y = -(pixel[..., 0] - cx) / fx
    z = -(pixel[..., 1] - cy) / fy
    v = jnp.stack([jnp.ones_like(y), y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _yaw_of(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def servo_ext_pixel(cam_rot, pixel_move, cam_matrix):
    """Gimbal angles (..., 3) [roll, pitch, yaw] (radians) that rotate the
    camera so a target seen at center+pixel_move moves to the image center.

    cam_rot: (..., 3, 3) current camera rotation (world <- camera body).
    pixel_move: (..., 2) target pixel offset from the image center.

    Algorithm (the reference's, re-expressed in x-forward coordinates):
      1. ray to the target in camera frame, rotated to world: v_w
      2. yaw  = heading of v_w (rotate optical axis onto the target azimuth)
      3. pitch = elevation difference between the optical axis and v_w
      4. roll = 0 (the two-axis re-center is exact; the reference's roll term
         only compensates its zxy euler composition)
    Output convention matches a zyx (yaw-pitch) gimbal applied in world frame.
    """
    cx = cam_matrix[0, 2]
    cy = cam_matrix[1, 2]
    center = jnp.stack(
        [jnp.broadcast_to(cx, pixel_move[..., 0].shape),
         jnp.broadcast_to(cy, pixel_move[..., 1].shape)], axis=-1
    )
    ray_target = pixel_to_ray(center + pixel_move, cam_matrix)  # camera frame
    v_w = jnp.einsum("...ij,...j->...i", cam_rot, ray_target)  # world
    axis_w = cam_rot[..., :, 0]  # current optical axis in world

    yaw = _yaw_of(v_w) - _yaw_of(axis_w)
    # wrap to [-pi, pi]
    yaw = jnp.arctan2(jnp.sin(yaw), jnp.cos(yaw))
    pitch_target = jnp.arcsin(jnp.clip(v_w[..., 2], -1.0, 1.0))
    pitch_axis = jnp.arcsin(jnp.clip(axis_w[..., 2], -1.0, 1.0))
    # camera pitches DOWN with positive gimbal pitch about +y (left) axis
    pitch = pitch_axis - pitch_target
    roll = jnp.zeros_like(yaw)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def gimbal_rot(rpy):
    """World-frame yaw-pitch(-roll) gimbal increment: R = Rz(yaw) Ry(pitch).
    Applied as R_new = gimbal_rot(servo) @ R_cam — after which the target ray
    coincides with the optical axis (the property servo_controller.py:169-177's
    C++ original asserts with errorVector.norm() < 1e-6)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    Rz = jnp.stack(
        [
            jnp.stack([cy, -sy, jnp.zeros_like(cy)], -1),
            jnp.stack([sy, cy, jnp.zeros_like(cy)], -1),
            jnp.stack([jnp.zeros_like(cy), jnp.zeros_like(cy), jnp.ones_like(cy)], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cp, jnp.zeros_like(cp), sp], -1),
            jnp.stack([jnp.zeros_like(cp), jnp.ones_like(cp), jnp.zeros_like(cp)], -1),
            jnp.stack([-sp, jnp.zeros_like(cp), cp], -1),
        ],
        -2,
    )
    Rx = jnp.stack(
        [
            jnp.stack([jnp.ones_like(cr), jnp.zeros_like(cr), jnp.zeros_like(cr)], -1),
            jnp.stack([jnp.zeros_like(cr), cr, -sr], -1),
            jnp.stack([jnp.zeros_like(cr), sr, cr], -1),
        ],
        -2,
    )
    return Rz @ Ry @ Rx


def align_axis_to(cam_rot, v_w):
    """Minimal rotation taking the optical axis onto unit direction v_w
    (world frame): R' = R_align @ cam_rot."""
    axis_w = cam_rot[..., :, 0]
    c = jnp.clip(jnp.einsum("...k,...k->...", axis_w, v_w), -1.0, 1.0)
    cross = jnp.cross(axis_w, v_w)
    s = jnp.linalg.norm(cross, axis=-1)
    k = cross / jnp.maximum(s, 1e-9)[..., None]
    K = _skew(k)
    eye = jnp.eye(3, dtype=cam_rot.dtype)
    R_align = eye + s[..., None, None] * K + (1.0 - c)[..., None, None] * (K @ K)
    # angle ~ pi (antipodal): rotate about the camera up axis instead
    up = cam_rot[..., :, 2]
    Ku = _skew(up)
    R_flip = eye + 2.0 * (Ku @ Ku)  # 180 deg about up
    R_align = jnp.where(
        (s > 1e-7)[..., None, None],
        R_align,
        jnp.where((c > 0.0)[..., None, None], eye, R_flip),
    )
    # re-orthonormalize: repeated float32 Rodrigues composition drifts off
    # SO(3) multiplicatively (det grows ~0.2%/step without this)
    return _orthonormalize(R_align @ cam_rot)


def _orthonormalize(R):
    """Project (..., 3, 3) near-rotations back onto SO(3) (Gram-Schmidt on
    the forward/up columns)."""
    x = R[..., :, 0]
    z = R[..., :, 2]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-9)
    z = z - jnp.einsum("...k,...k->...", z, x)[..., None] * x
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-9)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def recenter_rotation(cam_rot, pixel_move, cam_matrix):
    """One-call servo step: new camera rotation with the target re-centered.

    Uses the exact minimal rotation aligning the optical axis with the target
    ray (axis-angle about their cross product) — equivalent to the reference's
    yaw-pitch-roll gimbal solution where that is defined, and free of the
    gimbal-lock singularity when the camera looks straight up/down (the UAV
    envs START looking straight down). The reported rpy is still the
    yaw/pitch decomposition for API parity with servo_ext_pixel."""
    rpy = servo_ext_pixel(cam_rot, pixel_move, cam_matrix)
    ray = pixel_to_ray(
        jnp.stack(
            [
                jnp.broadcast_to(cam_matrix[0, 2], pixel_move[..., 0].shape),
                jnp.broadcast_to(cam_matrix[1, 2], pixel_move[..., 1].shape),
            ],
            -1,
        )
        + pixel_move,
        cam_matrix,
    )
    v_w = jnp.einsum("...ij,...j->...i", cam_rot, ray)
    return align_axis_to(cam_rot, v_w), rpy


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )
