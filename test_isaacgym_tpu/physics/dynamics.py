"""Batched articulated forward dynamics: CRBA mass matrix + RNEA bias +
implicit-PD dense solve.

TPU-first design choice (vs the reference's PhysX Featherstone solver,
SURVEY.md N3/N4): instead of a sequential articulated-body algorithm we build
the dense joint-space system

    (M(q) + h*D_eff) * qdd = tau_applied + tau_drive - C(q, qd) - g(q) + J^T f_ext

with M from the Composite Rigid Body Algorithm and C+g from RNEA (zero-accel
pass), both expressed in world axes about the actor root (small magnitudes,
f32-safe). The batched (nv, nv) Cholesky solve maps onto the MXU; D_eff folds
drive damping (kd + h*kp) into the matrix, which is the "stable PD" trick that
keeps stiffness ~1e10 attractors/drives stable at dt=1/60
(/root/reference/examples/franka_attractor.py:151).

This ALSO gives the `acquire_mass_matrix_tensor` capability for free.

All functions are batched over arbitrary leading axes; the per-link loops are
unrolled at trace time.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.scene import JT_PRISMATIC, JT_REVOLUTE, JT_ROOT
from ..math import spatial
from ..math.quat import quat_rotate, quat_to_matrix
from ..utils.linalg import spd_solve
from .kinematics import ArtTopo, joint_world_frames


def link_world_inertia(topo: ArtTopo, quat, mass=None, com=None, inertia=None):
    """World-frame (m, com_world_offset, Ic_world) per link.

    quat: (..., Ls, 4) link orientations. mass/com/inertia override the
    topology defaults (runtime body-property randomization); shapes
    (..., Ls)/(..., Ls, 3)/(..., Ls, 3, 3) in link frame.
    Returns com as offset from the LINK ORIGIN in world axes.
    """
    m = topo.mass if mass is None else mass
    c_l = topo.com if com is None else com
    i_l = topo.inertia if inertia is None else inertia
    R = quat_to_matrix(quat)  # (..., Ls, 3, 3)
    com_w = jnp.einsum("...ij,...j->...i", R, jnp.broadcast_to(c_l, R.shape[:-2] + (3,)))
    ic_w = jnp.einsum(
        "...ij,...jk,...lk->...il",
        R,
        jnp.broadcast_to(i_l, R.shape[:-2] + (3, 3)),
        R,
    )
    m = jnp.broadcast_to(m, R.shape[:-2])
    return m, com_w, ic_w


def motion_subspaces(topo: ArtTopo, pos, quat, origin):
    """World-frame motion subspace column per link about `origin` (..., 3).

    Returns S (..., Ls, 6): [angular; linear] Featherstone convention, valid
    for links with a dof; zeros otherwise.
    """
    anchors, axes = joint_world_frames(topo, pos, quat)
    cols = []
    for i in range(topo.num_links):
        jt = topo.jtype[i]
        if jt == JT_REVOLUTE:
            a = anchors[..., i, :] - origin
            s = axes[..., i, :]
            cols.append(jnp.concatenate([s, jnp.cross(a, s)], axis=-1))
        elif jt == JT_PRISMATIC:
            s = axes[..., i, :]
            cols.append(jnp.concatenate([jnp.zeros_like(s), s], axis=-1))
        else:
            z = jnp.zeros_like(anchors[..., i, :])
            cols.append(jnp.concatenate([z, z], axis=-1))
    return jnp.stack(cols, axis=-2)


def crba(topo: ArtTopo, S, m, com_rel, ic_w):
    """Composite-rigid-body mass matrix.

    S: (..., Ls, 6) dof subspace columns about origin O.
    m/com_rel/ic_w: world inertia params per link; com_rel relative to O.
    Returns M (..., nv, nv), nv = [6+]D, base cols first for floating base.
    """
    L = topo.num_links
    D = topo.num_dofs
    base = 0 if topo.fixed_base else 6
    nv = base + D

    # composite inertia params, accumulated leaf->root
    cm = [m[..., i] for i in range(L)]
    cc = [com_rel[..., i, :] for i in range(L)]
    ci = [ic_w[..., i, :, :] for i in range(L)]
    for i in range(L - 1, 0, -1):
        p = topo.parent[i]
        cm[p], cc[p], ci[p] = spatial.inertia_params_add(
            (cm[p], cc[p], ci[p]), (cm[i], cc[i], ci[i])
        )

    # ancestor sets (static)
    anc = []
    for i in range(L):
        chain = set()
        x = i
        while x != -1:
            chain.add(x)
            x = topo.parent[x]
        anc.append(chain)
    link_of_dof = {topo.dof_of_link[i]: i for i in range(L) if topo.dof_of_link[i] >= 0}

    zero = cm[0] * 0.0  # (...,) sharded scalar
    F = {}
    for d in range(D):
        i = link_of_dof[d]
        F[d] = spatial.inertia_mul(cm[i], cc[i], ci[i], S[..., i, :])  # (..., 6)

    # assemble as nested stacks (no scatters -> sharding-friendly)
    rows = []
    if not topo.fixed_base:
        m0, c0, i0 = cm[0], cc[0], ci[0]
        cx = spatial.skew(c0)
        eye = jnp.eye(3, dtype=S.dtype)
        tt = m0[..., None, None] * eye  # (..., 3, 3)
        tr = -(m0[..., None, None] * cx)
        ccT = jnp.einsum("...ij,...kj->...ik", cx, cx)
        rr = i0 + m0[..., None, None] * ccT
        # joint coupling columns for base rows
        jt_f = (
            jnp.stack([F[d][..., 3:6] for d in range(D)], axis=-1)
            if D
            else jnp.zeros(tt.shape[:-1] + (0,), S.dtype)
        )  # (..., 3, D)
        jt_n = (
            jnp.stack([F[d][..., 0:3] for d in range(D)], axis=-1)
            if D
            else jnp.zeros(tt.shape[:-1] + (0,), S.dtype)
        )
        top = jnp.concatenate([tt, tr, jt_f], axis=-1)  # (..., 3, nv)
        mid = jnp.concatenate([jnp.swapaxes(tr, -1, -2), rr, jt_n], axis=-1)
        rows.append(top)
        rows.append(mid)

    joint_rows = []
    for di in range(D):
        i = link_of_dof[di]
        vals = []
        if not topo.fixed_base:
            vals.extend([F[di][..., 3 + k] for k in range(3)])
            vals.extend([F[di][..., k] for k in range(3)])
        for dj in range(D):
            j = link_of_dof[dj]
            if j in anc[i]:
                vals.append(spatial.dot(F[di], S[..., j, :]))
            elif i in anc[j]:
                vals.append(spatial.dot(F[dj], S[..., i, :]))
            else:
                vals.append(zero)
        joint_rows.append(jnp.stack(vals, axis=-1))  # (..., nv)
    if joint_rows:
        rows.append(jnp.stack(joint_rows, axis=-2))  # (..., D, nv)
    return jnp.concatenate(rows, axis=-2) if len(rows) > 1 else rows[0]


def rnea_bias(topo: ArtTopo, S, m, com_rel, ic_w, vel_sp, qd, gravity, f_ext=None):
    """Bias generalized force C(q,qd)+g(q) - tau_ext about origin O.

    vel_sp: (..., Ls, 6) spatial velocity [w; v_O] of each link about O.
    qd: (..., D). gravity: (3,). f_ext: optional (..., Ls, 6) external spatial
    force on each link about O (world axes), entering with a minus sign.
    Returns (..., nv).
    """
    L = topo.num_links
    D = topo.num_dofs
    base = 0 if topo.fixed_base else 6
    nv = base + D
    batch = vel_sp.shape[:-2]

    g6 = jnp.concatenate([jnp.zeros_like(gravity), -gravity], axis=-1)  # a0 = -g
    a = []
    f = []
    for i in range(L):
        if topo.jtype[i] == JT_ROOT:
            a_i = jnp.broadcast_to(g6, batch + (6,))
        else:
            p = topo.parent[i]
            a_i = a[p]
            d = topo.dof_of_link[i]
            if d >= 0:
                sqd = S[..., i, :] * qd[..., d, None]
                a_i = a_i + spatial.cross_motion(vel_sp[..., i, :], sqd)
        a.append(a_i)
        Iv = spatial.inertia_mul(m[..., i], com_rel[..., i, :], ic_w[..., i, :, :], vel_sp[..., i, :])
        f_i = spatial.inertia_mul(m[..., i], com_rel[..., i, :], ic_w[..., i, :, :], a_i) + spatial.cross_force(
            vel_sp[..., i, :], Iv
        )
        if f_ext is not None:
            f_i = f_i - f_ext[..., i, :]
        f.append(f_i)

    cvals = {}
    for i in range(L - 1, -1, -1):
        d = topo.dof_of_link[i]
        if d >= 0:
            cvals[d] = spatial.dot(S[..., i, :], f[i])
        p = topo.parent[i]
        if p >= 0:
            f[p] = f[p] + f[i]
    parts = []
    if not topo.fixed_base:
        # base rows: translation rows pair with f, rotation rows with n
        parts.append(f[0][..., 3:6])
        parts.append(f[0][..., 0:3])
    if D:
        parts.append(jnp.stack([cvals[d] for d in range(D)], axis=-1))
    return jnp.concatenate(parts, axis=-1)


def spatial_velocities(topo: ArtTopo, pos, lin, ang, origin):
    """Convert per-link (linvel-of-origin, angvel) to spatial [w; v_O] about O."""
    v_o = lin + jnp.cross(ang, origin[..., None, :] - pos)
    return jnp.concatenate([ang, v_o], axis=-1)


def forward_dynamics(
    topo: ArtTopo,
    pos,
    quat,
    lin,
    ang,
    dof_vel,
    tau,
    h: float,
    d_eff,
    gravity,
    mass=None,
    com=None,
    inertia=None,
    f_ext=None,
    base_wrench=None,
):
    """Solve (M + h*diag(d_eff)) qdd = tau - C - g + ext.

    pos/quat/lin/ang: link world states (..., Ls, .).
    tau: (..., nv) generalized applied force (base rows zero for floating).
    d_eff: (..., nv) implicit diagonal damping (kd + h*kp + joint damping + armature/h).
    f_ext: (..., Ls, 6) spatial external force per link about the root origin.
    base_wrench: optional (..., 6) [torque; force] world wrench on the base about root.
    Returns qdd (..., nv).
    """
    origin = pos[..., 0, :]
    m, com_w, ic_w = link_world_inertia(topo, quat, mass, com, inertia)
    com_rel = (pos - origin[..., None, :]) + com_w
    S = motion_subspaces(topo, pos, quat, origin)
    vel_sp = spatial_velocities(topo, pos, lin, ang, origin)
    M = crba(topo, S, m, com_rel, ic_w)
    C = rnea_bias(topo, S, m, com_rel, ic_w, vel_sp, dof_vel, gravity, f_ext)
    rhs = tau - C
    if base_wrench is not None and not topo.fixed_base:
        rhs = rhs.at[..., 0:3].add(base_wrench[..., 3:6])
        rhs = rhs.at[..., 3:6].add(base_wrench[..., 0:3])
    A = M + h * jnp.eye(M.shape[-1], dtype=M.dtype) * d_eff[..., None, :]
    # batched SPD solve — unrolled Cholesky (utils/linalg.py)
    qdd = spd_solve(A, rhs)
    return qdd, M


def mass_matrix(topo: ArtTopo, pos, quat, mass=None, com=None, inertia=None):
    """Standalone CRBA (acquire_mass_matrix_tensor capability)."""
    origin = pos[..., 0, :]
    m, com_w, ic_w = link_world_inertia(topo, quat, mass, com, inertia)
    com_rel = (pos - origin[..., None, :]) + com_w
    S = motion_subspaces(topo, pos, quat, origin)
    return crba(topo, S, m, com_rel, ic_w)
