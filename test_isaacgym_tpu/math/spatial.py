"""Spatial (6D) vector algebra for articulated rigid-body dynamics.

World-frame formulation: all spatial quantities are expressed in world-aligned
axes about a common origin O (we use the actor root position so magnitudes stay
small in f32 even when envs are spread over a large grid).

Conventions (Featherstone):
  motion vector  v = [omega(3), v_O(3)]   (angular first)
  force  vector  f = [n_O(3),   f(3)]     (torque about O first)

Everything is batched over arbitrary leading axes; these are the primitives the
CRBA / RNEA implementations in physics/dynamics.py are built from. These map to
plain VPU elementwise ops on TPU; the dense (nv,nv) mass-matrix solve downstream
is the MXU part.
"""
from __future__ import annotations

import jax.numpy as jnp


def cross_motion(v, u):
    """Spatial motion cross product  v x_m u."""
    w, vo = v[..., :3], v[..., 3:]
    uw, uo = u[..., :3], u[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, uw), jnp.cross(w, uo) + jnp.cross(vo, uw)], axis=-1
    )


def cross_force(v, f):
    """Spatial force cross product  v x_f f  (dual of cross_motion)."""
    w, vo = v[..., :3], v[..., 3:]
    n, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, fo), jnp.cross(w, fo)], axis=-1
    )


def inertia_mul(m, com, ic, v):
    """Apply spatial inertia (mass m, com position `com` relative to O,
    world-frame rotational inertia about com `ic` (...,3,3)) to motion vector v.

    Returns the spatial momentum [H_O, L]:
      L   = m * (v_O + omega x com)
      H_O = Ic @ omega + com x L
    """
    w, vo = v[..., :3], v[..., 3:]
    lin = m[..., None] * (vo + jnp.cross(w, com))
    ang = jnp.einsum("...ij,...j->...i", ic, w) + jnp.cross(com, lin)
    return jnp.concatenate([ang, lin], axis=-1)


def dot(f, v):
    """Scalar pairing of a force vector with a motion vector."""
    return jnp.sum(f * v, axis=-1)


def inertia_params_add(a, b):
    """Sum two spatial inertias given as (m, com, Ic) param triples about the
    same origin O. Returns the composite (m, com, Ic) triple."""
    ma, ca, ia = a
    mb, cb, ib = b
    m = ma + mb
    msafe = jnp.clip(m, 1e-12)
    com = (ma[..., None] * ca + mb[..., None] * cb) / msafe[..., None]

    def shift(mi, ci, ii):
        # parallel axis: inertia about new com
        d = ci - com
        d2 = jnp.sum(d * d, axis=-1)
        eye = jnp.eye(3, dtype=d.dtype)
        outer = d[..., :, None] * d[..., None, :]
        return ii + mi[..., None, None] * (d2[..., None, None] * eye - outer)

    ic = shift(ma, ca, ia) + shift(mb, cb, ib)
    return m, com, ic


def _unpack3(A):
    return [[A[..., i, j] for j in range(3)] for i in range(3)]


def _pack3(rows):
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def mm3(A, B):
    """Batched 3x3 matmul in scalar component form.

    NOTE (round-4 measurement, franka flagship @4096 on the real chip):
    XLA's dot_general/convolution lowering of (..., 3, 3) matmuls beat BOTH
    hand-written alternatives here — 23.4 ms/10 steps (dot) vs 35.5
    (broadcast-mul-reduce, lane-padded (...,3,3,3) intermediate) vs 40.1
    (this scalar form: 9+9 slice reads of the padded tile don't fuse). The
    tiny-matmul pathology in physics/contacts.py was real because those ops
    sat inside gather/scatter chains; a clean chain of (...,3,3) einsums is
    NOT worth rewriting. Kept for call sites that want explicit components
    anyway."""
    a = _unpack3(A)
    b = _unpack3(B)
    return _pack3(
        [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    )


def sandwich3(R, I):
    """R @ I @ R^T in scalar component form (see mm3)."""
    r = _unpack3(R)
    a = _unpack3(I)
    t = [
        [sum(r[i][k] * a[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    return _pack3(
        [[sum(t[i][k] * r[l][k] for k in range(3)) for l in range(3)]
         for i in range(3)]
    )


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix."""
    z = jnp.zeros_like(v[..., 0])
    x, y, w = v[..., 0], v[..., 1], v[..., 2]
    rows = jnp.stack(
        [z, -w, y, w, z, -x, -y, x, z], axis=-1
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def motion_subspace_revolute(axis_w, anchor_w):
    """World-frame motion subspace column for a revolute joint with world axis
    `axis_w` passing through world point `anchor_w`, about origin O=0."""
    return jnp.concatenate([axis_w, jnp.cross(anchor_w, axis_w)], axis=-1)


def motion_subspace_prismatic(axis_w):
    return jnp.concatenate([jnp.zeros_like(axis_w), axis_w], axis=-1)


def point_velocity(v, p):
    """Velocity of the body-fixed point currently at world position p (relative
    to origin O), given spatial velocity v about O."""
    w, vo = v[..., :3], v[..., 3:]
    return vo + jnp.cross(w, p)


def force_at_point(force, torque, p):
    """Spatial force about O from a linear force and torque applied at point p."""
    return jnp.concatenate([torque + jnp.cross(p, force), force], axis=-1)
