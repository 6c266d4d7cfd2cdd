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

All functions are batched over arbitrary leading axes. CRBA/RNEA exist in two
trace-time-selected forms (see _use_unrolled): a composite-unrolled form
(fused scalar chains — fastest on TPU) and a dense masked form (a handful of
contractions over static ancestor masks — tiny HLO, which XLA:CPU needs to
compile the multi-chip dryrun and tests in CI time). Both compute the same
quantities; tests/test_dynamics.py asserts cross-form parity.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..math import spatial
from ..math.quat import quat_rotate, quat_to_matrix
from ..utils.linalg import spd_solve
from .kinematics import ArtTopo, joint_world_frames, topo_masks


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
    # COMPONENT FORM (PERF_NOTES rule 4): the former
    # einsum("...ij,...jk,...lk->...il", R, I, R) lowered as bf16
    # convolutions over (N, Ls, 3, 3) plus ~6 layout copies — about half
    # the flagship step's device time (r5 profile). Unrolled multiply-add
    # chains over (..., Ls) components fuse instead.
    R = quat_to_matrix(quat)  # (..., Ls, 3, 3)
    com_w = quat_rotate(quat, jnp.broadcast_to(c_l, quat.shape[:-1] + (3,)))
    Ib = jnp.broadcast_to(i_l, quat.shape[:-1] + (3, 3))
    Rc = [[R[..., a, b] for b in range(3)] for a in range(3)]
    Ic = [[Ib[..., a, b] for b in range(3)] for a in range(3)]
    B = [
        [sum(Rc[a][k] * Ic[k][b] for k in range(3)) for b in range(3)]
        for a in range(3)
    ]  # R @ I
    ic_w = jnp.stack(
        [
            jnp.stack(
                [
                    sum(B[a][k] * Rc[b][k] for k in range(3))
                    for b in range(3)
                ],
                -1,
            )
            for a in range(3)
        ],
        -2,
    )  # (R I) @ R^T
    m = jnp.broadcast_to(m, quat.shape[:-1])
    return m, com_w, ic_w


def motion_subspaces(topo: ArtTopo, pos, quat, origin):
    """World-frame motion subspace column per link about `origin` (..., 3).

    Returns S (..., Ls, 6): [angular; linear] Featherstone convention, valid
    for links with a dof; zeros otherwise. Loop-free: one vectorized pass
    over the stacked joint frames.
    """
    mk = topo_masks(topo)
    anchors, axes = joint_world_frames(topo, pos, quat)
    rel = anchors - origin[..., None, :]  # (..., Ls, 3)
    s_ang = mk.is_rev[:, None] * axes
    s_lin = mk.is_rev[:, None] * jnp.cross(rel, axes) + mk.is_pris[:, None] * axes
    return jnp.concatenate([s_ang, s_lin], axis=-1)


def _use_unrolled() -> bool:
    """Trace-time backend switch: the composite-unrolled CRBA/RNEA (fused
    scalar chains, O(L*D) work) is ~2x faster on TPU, while the dense masked
    form (a handful of contractions, O(L*D^2) work) compiles ~20x smaller
    HLO — which XLA:CPU needs to finish compiling the multi-chip dryrun and
    the test suite in CI time. Override with TIG_DYNAMICS_FORM=dense|unrolled."""
    import os

    form = os.environ.get("TIG_DYNAMICS_FORM", "")
    if form == "dense":
        return False
    if form == "unrolled":
        return True
    import jax

    return jax.default_backend() != "cpu"


def _crba_unrolled(topo: ArtTopo, S, m, com_rel, ic_w):
    """Composite-rigid-body mass matrix, per-link loops unrolled at trace
    time (TPU hot path; see _use_unrolled)."""
    L = topo.num_links
    D = topo.num_dofs

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


def _rnea_unrolled(topo: ArtTopo, S, m, com_rel, ic_w, vel_sp, qd, gravity, f_ext=None):
    """RNEA bias with unrolled per-link recursion (TPU hot path)."""
    L = topo.num_links
    D = topo.num_dofs
    batch = vel_sp.shape[:-2]

    g6 = jnp.concatenate([jnp.zeros_like(gravity), -gravity], axis=-1)  # a0 = -g
    a = []
    f = []
    for i in range(L):
        if topo.parent[i] < 0:
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
        parts.append(f[0][..., 3:6])
        parts.append(f[0][..., 0:3])
    if D:
        parts.append(jnp.stack([cvals[d] for d in range(D)], axis=-1))
    return jnp.concatenate(parts, axis=-1)


def crba(topo: ArtTopo, S, m, com_rel, ic_w):
    """Mass matrix via the dense kinetic-energy identity M = sum_i J_i^T I_i J_i.

    The per-link Jacobian about the common origin O is J_i[:, d] =
    anc(i, d) * S_d (plus identity base columns), so the whole matrix reduces
    to a few einsums over static ancestor masks — loop-free HLO, MXU-friendly,
    and exactly equal to the composite-rigid-body result.

    S: (..., Ls, 6) dof subspace columns about origin O.
    m/com_rel/ic_w: world inertia params per link; com_rel relative to O.
    Returns M (..., nv, nv), nv = [6+]D, base cols first for floating base.
    """
    if _use_unrolled():
        return _crba_unrolled(topo, S, m, com_rel, ic_w)
    D = topo.num_dofs
    mk = topo_masks(topo)

    if D:
        Sd = S[..., mk.dof_link, :]  # (..., D, 6)
        # W[l, d] = I_l @ S_d  (spatial momentum of unit joint motion)
        W = spatial.inertia_mul(
            m[..., :, None],
            com_rel[..., :, None, :],
            ic_w[..., :, None, :, :],
            Sd[..., None, :, :],
        )  # (..., L, D, 6)
        A = mk.dof_anc  # (L, D) static
        G = jnp.einsum("...ak,...lbk->...lab", Sd, W)
        Mjj = jnp.einsum("la,lb,...lab->...ab", A, A, G)
    else:
        Mjj = jnp.zeros(m.shape[:-1] + (0, 0), S.dtype)

    if topo.fixed_base:
        return Mjj

    # base block: total spatial inertia about O (explicit 6x6 in the
    # [translation rows; rotation rows] layout used by qdd[0:3]=lin,[3:6]=ang)
    m0 = jnp.sum(m, axis=-1)
    msafe = jnp.clip(m0, 1e-12)
    c0 = jnp.sum(m[..., None] * com_rel, axis=-2) / msafe[..., None]
    d = com_rel - c0[..., None, :]
    d2 = jnp.sum(d * d, axis=-1)
    eye = jnp.eye(3, dtype=S.dtype)
    outer = d[..., :, None] * d[..., None, :]
    i0 = jnp.sum(
        ic_w + m[..., None, None] * (d2[..., None, None] * eye - outer), axis=-3
    )
    cx = spatial.skew(c0)
    tt = m0[..., None, None] * eye
    tr = -(m0[..., None, None] * cx)
    ccT = jnp.einsum("...ij,...kj->...ik", cx, cx)
    rr = i0 + m0[..., None, None] * ccT

    if D:
        # base-joint coupling: F_d = sum_l anc(l,d) I_l S_d
        Fd = jnp.einsum("ld,...ldk->...dk", A, W)  # (..., D, 6)
        jt_f = jnp.swapaxes(Fd[..., 3:6], -1, -2)  # (..., 3, D)
        jt_n = jnp.swapaxes(Fd[..., 0:3], -1, -2)
    else:
        jt_f = jnp.zeros(tt.shape[:-1] + (0,), S.dtype)
        jt_n = jnp.zeros(tt.shape[:-1] + (0,), S.dtype)

    top = jnp.concatenate([tt, tr, jt_f], axis=-1)  # (..., 3, nv)
    mid = jnp.concatenate([jnp.swapaxes(tr, -1, -2), rr, jt_n], axis=-1)
    if D:
        bot = jnp.concatenate(
            [jnp.swapaxes(jt_f, -1, -2), jnp.swapaxes(jt_n, -1, -2), Mjj],
            axis=-1,
        )  # (..., D, nv)
        return jnp.concatenate([top, mid, bot], axis=-2)
    return jnp.concatenate([top, mid], axis=-2)


def rnea_bias(topo: ArtTopo, S, m, com_rel, ic_w, vel_sp, qd, gravity, f_ext=None):
    """Bias generalized force C(q,qd)+g(q) - tau_ext about origin O.

    vel_sp: (..., Ls, 6) spatial velocity [w; v_O] of each link about O.
    qd: (..., D). gravity: (3,). f_ext: optional (..., Ls, 6) external spatial
    force on each link about O (world axes), entering with a minus sign.
    Returns (..., nv).
    """
    if _use_unrolled():
        return _rnea_unrolled(topo, S, m, com_rel, ic_w, vel_sp, qd, gravity, f_ext)
    D = topo.num_dofs
    mk = topo_masks(topo)

    # bias acceleration (qdd = 0): a_i = -g + sum_{j in anc(i)} v_j x (S_j qd_j)
    g6 = jnp.concatenate([jnp.zeros_like(gravity), -gravity], axis=-1)
    if D:
        qd_l = qd[..., mk.link_qd] * mk.has_dof  # (..., L)
        c = spatial.cross_motion(vel_sp, S * qd_l[..., None])  # (..., L, 6)
        a = g6 + jnp.einsum("ij,...jk->...ik", mk.anc, c)
    else:
        a = jnp.broadcast_to(g6, vel_sp.shape)

    Iv = spatial.inertia_mul(m, com_rel, ic_w, vel_sp)
    f = spatial.inertia_mul(m, com_rel, ic_w, a) + spatial.cross_force(vel_sp, Iv)
    if f_ext is not None:
        f = f - f_ext

    parts = []
    if not topo.fixed_base:
        f_tot = jnp.sum(f, axis=-2)
        # base rows: translation rows pair with f, rotation rows with n
        parts.append(f_tot[..., 3:6])
        parts.append(f_tot[..., 0:3])
    if D:
        # C[d] = sum_{i desc of d} S_d . f_i
        Sd = S[..., mk.dof_link, :]
        parts.append(jnp.einsum("ld,...dk,...lk->...d", mk.dof_anc, Sd, f))
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
    return_op=False,
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
    if return_op:
        # A is the implicit velocity-level operator: the contact solver uses
        # A^-1 so joint-space contact impulses feel the drives' implicit
        # damping (stable force-limited squeezing)
        return qdd, M, A
    return qdd, M


def mass_matrix(topo: ArtTopo, pos, quat, mass=None, com=None, inertia=None):
    """Standalone CRBA (acquire_mass_matrix_tensor capability)."""
    origin = pos[..., 0, :]
    m, com_w, ic_w = link_world_inertia(topo, quat, mass, com, inertia)
    com_rel = (pos - origin[..., None, :]) + com_w
    S = motion_subspaces(topo, pos, quat, origin)
    return crba(topo, S, m, com_rel, ic_w)
