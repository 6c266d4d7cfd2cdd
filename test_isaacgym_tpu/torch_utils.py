"""`isaacgym.torch_utils` equivalent, array-library agnostic.

The reference imports quaternion helpers from torch_utils
(/root/reference/examples/franka_cube_ik_osc.py:19,36-49). These versions
accept torch tensors OR jax/numpy arrays and return the same kind — the
facade's wrapped tensors are torch (CPU), the native fast path is jnp.
Quaternions are xyzw.
"""
from __future__ import annotations

import numpy as np


def _lib(x):
    mod = type(x).__module__
    if mod.startswith("torch"):
        import torch

        return torch
    import jax.numpy as jnp

    return jnp


def to_torch(x, dtype=None, device=None, requires_grad=False):
    """Reference signature (device string accepted and ignored: arrays live
    where the backend puts them)."""
    try:
        import torch

        t = torch.as_tensor(
            np.asarray(x), dtype=dtype or torch.float32
        )
        t.requires_grad_(requires_grad)
        return t
    except Exception:
        import jax.numpy as jnp

        return jnp.asarray(x, jnp.float32)


def normalize(x, eps: float = 1e-9):
    lib = _lib(x)
    n = lib.linalg.norm(x, axis=-1, keepdims=True) if lib.__name__ != "torch" else x.norm(dim=-1, keepdim=True)
    return x / (n + eps) if lib.__name__ != "torch" else x / n.clamp(min=eps)


def quat_unit(q):
    return normalize(q)


def quat_mul(a, b):
    lib = _lib(a)
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ww = (z1 + x1) * (x2 + y2)
    yy = (w1 - y1) * (w2 + z2)
    zz = (w1 + y1) * (w2 - z2)
    xx = ww + yy + zz
    qq = 0.5 * (xx + (z1 - x1) * (x2 - y2))
    w = qq - ww + (z1 - y1) * (y2 - z2)
    x = qq - xx + (x1 + w1) * (x2 + w2)
    y = qq - yy + (w1 - x1) * (y2 + z2)
    z = qq - zz + (z1 + y1) * (w2 - x2)
    return lib.stack([x, y, z, w], -1)


def quat_conjugate(q):
    lib = _lib(q)
    return lib.concatenate([-q[..., :3], q[..., 3:4]], -1) if lib.__name__ != "torch" else lib.cat([-q[..., :3], q[..., 3:4]], -1)


def quat_apply(q, v):
    """Rotate vector v by quat q (xyzw)."""
    lib = _lib(q)
    xyz = q[..., :3]
    w = q[..., 3:4]
    cross = lib.cross(xyz, v, -1) if lib.__name__ == "torch" else lib.cross(xyz, v)
    t = 2.0 * cross
    cross2 = lib.cross(xyz, t, -1) if lib.__name__ == "torch" else lib.cross(xyz, t)
    return v + w * t + cross2


quat_rotate = quat_apply


def quat_rotate_inverse(q, v):
    return quat_apply(quat_conjugate(q), v)


def quat_from_angle_axis(angle, axis):
    lib = _lib(axis)
    axis = normalize(axis)
    half = angle * 0.5
    s = lib.sin(half)
    xyz = axis * s[..., None]
    w = lib.cos(half)[..., None]
    return lib.concatenate([xyz, w], -1) if lib.__name__ != "torch" else lib.cat([xyz, w], -1)


def quat_to_angle_axis(q):
    lib = _lib(q)
    w = q[..., 3]
    if lib.__name__ == "torch":
        angle = 2.0 * lib.acos(w.clamp(-1.0, 1.0))
        s = lib.sqrt((1.0 - w * w).clamp(min=1e-12))
    else:
        angle = 2.0 * lib.arccos(lib.clip(w, -1.0, 1.0))
        s = lib.sqrt(lib.clip(1.0 - w * w, 1e-12))
    axis = q[..., :3] / s[..., None]
    return angle, axis


def get_euler_xyz(q):
    lib = _lib(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    atan2 = lib.atan2 if lib.__name__ == "torch" else lib.arctan2
    roll = atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    s = 2 * (w * y - z * x)
    if lib.__name__ == "torch":
        pitch = lib.asin(s.clamp(-1, 1))
    else:
        pitch = lib.arcsin(lib.clip(s, -1, 1))
    yaw = atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_from_euler_xyz(roll, pitch, yaw):
    lib = _lib(roll)
    cr, sr = lib.cos(roll * 0.5), lib.sin(roll * 0.5)
    cp, sp = lib.cos(pitch * 0.5), lib.sin(pitch * 0.5)
    cy, sy = lib.cos(yaw * 0.5), lib.sin(yaw * 0.5)
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    w = cr * cp * cy + sr * sp * sy
    return lib.stack([x, y, z, w], -1)


def orientation_error(desired, current):
    """Axis-angle-ish error used by the reference OSC controllers
    (franka_cube_ik_osc.py:46-49)."""
    cc = quat_conjugate(current)
    qr = quat_mul(desired, cc)
    return qr[..., 0:3] * (2.0 * (qr[..., 3:4] >= 0).astype(qr.dtype) - 1.0) if not type(qr).__module__.startswith("torch") else qr[..., 0:3] * qr[..., 3:4].sign()


def tensor_clamp(x, lo, hi):
    lib = _lib(x)
    if lib.__name__ == "torch":
        return lib.max(lib.min(x, hi), lo)
    return lib.clip(x, lo, hi)


def get_axis_params(value, axis_idx, x=0.0, y=0.0, z=0.0, dtype=np.float32, n_dims=3):
    """Reference helper: dense vector with `value` at axis_idx."""
    zs = np.zeros(n_dims)
    zs[axis_idx] = 1.0
    params = np.where(zs == 1.0, value, zs)
    params[0] = x if x != 0.0 else params[0]
    params[1] = y if y != 0.0 else params[1]
    if n_dims > 2:
        params[2] = z if z != 0.0 else params[2]
    return list(params.astype(dtype))
