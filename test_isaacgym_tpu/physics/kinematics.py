"""Batched articulated forward kinematics.

Replaces the reference's native FK inside PhysX articulations (SURVEY.md N3):
given root pose/velocity and generalized coordinates, computes world pose and
velocity of every link. The per-link loop is unrolled at trace time (topology
is static, links <= ~32); every op inside is batched over arbitrary leading
axes (env, copy), so XLA vectorizes across the batch.

Velocities are carried as (omega_world, v_link_origin) pairs — no large-offset
spatial origins, safe in f32 for grid-spread envs.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.scene import JT_FIXED, JT_PRISMATIC, JT_REVOLUTE, JT_ROOT, ArtGroup
from ..math.quat import quat_mul, quat_rotate


class TopoMasks(NamedTuple):
    """Static (numpy, trace-time constant) topology masks for the dense
    loop-free dynamics formulation. Kept tiny (L<=~32, D<=~32): the O(L*D)
    mask einsums cost negligible FLOPs but collapse the HLO from thousands of
    per-link scalar ops to a handful of batched contractions — this is what
    makes the step compile in seconds on XLA:CPU (multi-chip dryrun) instead
    of minutes, and keeps the MXU fed on TPU."""

    anc: np.ndarray  # (L, L) f32: anc[i, j] = 1 if j is i or an ancestor of i
    dof_link: np.ndarray  # (D,) i32: link carrying each dof
    dof_anc: np.ndarray  # (L, D) f32: dof_anc[i, d] = 1 if dof d moves link i
    is_rev: np.ndarray  # (L,) f32
    is_pris: np.ndarray  # (L,) f32
    has_dof: np.ndarray  # (L,) f32
    link_qd: np.ndarray  # (L,) i32: dof index per link (0 where none; mask with has_dof)


def topo_masks(topo: "ArtTopo") -> TopoMasks:
    L = topo.num_links
    D = topo.num_dofs
    anc = np.zeros((L, L), np.float32)
    for i in range(L):
        x = i
        while x != -1:
            anc[i, x] = 1.0
            x = topo.parent[x]
    dof_link = np.zeros((max(D, 1),), np.int32)
    link_qd = np.zeros((L,), np.int32)
    has_dof = np.zeros((L,), np.float32)
    for i in range(L):
        d = topo.dof_of_link[i]
        if d >= 0:
            dof_link[d] = i
            link_qd[i] = d
            has_dof[i] = 1.0
    dof_anc = anc[:, dof_link[:D]] if D else np.zeros((L, 0), np.float32)
    is_rev = np.array([1.0 if jt == JT_REVOLUTE else 0.0 for jt in topo.jtype], np.float32)
    is_pris = np.array([1.0 if jt == JT_PRISMATIC else 0.0 for jt in topo.jtype], np.float32)
    return TopoMasks(anc, dof_link[:D], dof_anc, is_rev, is_pris, has_dof, link_qd)


class ArtTopo(NamedTuple):
    """Device-constant topology for one articulation group. Integer maps are
    Python tuples (trace-time constants driving the unrolled loop)."""

    parent: Tuple[int, ...]
    jtype: Tuple[int, ...]
    dof_of_link: Tuple[int, ...]
    body_of_link: Tuple[int, ...]
    axis: jnp.ndarray  # (Ls, 3) in joint frame
    jp_pos: jnp.ndarray  # (Ls, 3)
    jp_quat: jnp.ndarray  # (Ls, 4)
    jc_pos: jnp.ndarray  # (Ls, 3)
    jc_quat: jnp.ndarray  # (Ls, 4)
    mass: jnp.ndarray  # (Ls,) default (synthetic links keep these)
    com: jnp.ndarray  # (Ls, 3)
    inertia: jnp.ndarray  # (Ls, 3, 3)
    fixed_base: bool

    @property
    def num_links(self):
        return len(self.parent)

    @property
    def num_dofs(self):
        return max([d for d in self.dof_of_link if d >= 0], default=-1) + 1


def topo_from_group(g: ArtGroup) -> ArtTopo:
    f32 = jnp.float32
    return ArtTopo(
        parent=tuple(int(x) for x in g.parent),
        jtype=tuple(int(x) for x in g.jtype),
        dof_of_link=tuple(int(x) for x in g.dof_of_link),
        body_of_link=tuple(int(x) for x in g.body_of_link),
        axis=jnp.asarray(g.axis, f32),
        jp_pos=jnp.asarray(g.jp_pos, f32),
        jp_quat=jnp.asarray(g.jp_quat, f32),
        jc_pos=jnp.asarray(g.jc_pos, f32),
        jc_quat=jnp.asarray(g.jc_quat, f32),
        mass=jnp.asarray(g.mass, f32),
        com=jnp.asarray(g.com, f32),
        inertia=jnp.asarray(g.inertia, f32),
        fixed_base=bool(g.fixed_base),
    )


def fk(
    topo: ArtTopo,
    root_pos,
    root_quat,
    root_linvel,
    root_angvel,
    dof_pos,
    dof_vel,
):
    """Forward kinematics for one articulation group.

    Inputs are batched: root_* (..., 3/4), dof_* (..., D).
    Returns (pos, quat, linvel, angvel) each (..., Ls, ...): world link frames,
    linvel = velocity of the link-frame origin, angvel = world angular velocity.
    """
    L = topo.num_links
    pos, quat, lin, ang = [], [], [], []
    for i in range(L):
        if topo.jtype[i] == JT_ROOT:
            pos.append(root_pos)
            quat.append(root_quat)
            lin.append(root_linvel)
            ang.append(root_angvel)
            continue
        p = topo.parent[i]
        # joint frame in world
        jf_pos = pos[p] + quat_rotate(quat[p], topo.jp_pos[i])
        jf_quat = quat_mul(quat[p], topo.jp_quat[i])
        d = topo.dof_of_link[i]
        jt = topo.jtype[i]
        if jt == JT_REVOLUTE:
            q_i = dof_pos[..., d]
            qd_i = dof_vel[..., d]
            half = 0.5 * q_i
            s, c = jnp.sin(half), jnp.cos(half)
            jq = jnp.stack(
                [topo.axis[i, 0] * s, topo.axis[i, 1] * s, topo.axis[i, 2] * s, c],
                axis=-1,
            )
            post_quat = quat_mul(jf_quat, jq)
            axis_w = quat_rotate(jf_quat, topo.axis[i])
            body_quat = quat_mul(post_quat, topo.jc_quat[i])
            body_pos = jf_pos + quat_rotate(post_quat, topo.jc_pos[i])
            w = ang[p] + axis_w * qd_i[..., None]
            v = (
                lin[p]
                + jnp.cross(ang[p], jf_pos - pos[p])
                + jnp.cross(axis_w * qd_i[..., None], body_pos - jf_pos)
            )
        elif jt == JT_PRISMATIC:
            q_i = dof_pos[..., d]
            qd_i = dof_vel[..., d]
            axis_w = quat_rotate(jf_quat, topo.axis[i])
            body_quat = quat_mul(jf_quat, topo.jc_quat[i])
            body_pos = (
                jf_pos + axis_w * q_i[..., None] + quat_rotate(jf_quat, topo.jc_pos[i])
            )
            w = ang[p]
            v = (
                lin[p]
                + jnp.cross(ang[p], body_pos - pos[p])
                + axis_w * qd_i[..., None]
            )
        else:  # fixed
            body_quat = quat_mul(jf_quat, topo.jc_quat[i])
            body_pos = jf_pos + quat_rotate(jf_quat, topo.jc_pos[i])
            w = ang[p]
            v = lin[p] + jnp.cross(ang[p], body_pos - pos[p])
        pos.append(body_pos)
        quat.append(body_quat)
        lin.append(v)
        ang.append(w)
    stack = lambda xs: jnp.stack(xs, axis=-2)
    return (
        stack(pos),
        stack(quat),
        stack(lin),
        jnp.stack(ang, axis=-2),
    )


def joint_world_frames(topo: ArtTopo, pos, quat):
    """World joint anchor and axis for each link's inbound joint, given link
    world poses (..., Ls, 3/4). Anchor/axis of the root are its own frame.

    Fully vectorized over links: one gather on the parent index + batched
    quat ops (no per-link Python loop — XLA:CPU compile-time critical)."""
    par = np.array(
        [p if p >= 0 else i for i, p in enumerate(topo.parent)], np.int32
    )
    is_root = np.array(
        [jt == JT_ROOT for jt in topo.jtype], bool
    )
    pp = pos[..., par, :]
    pq = quat[..., par, :]
    jf_pos = pp + quat_rotate(pq, topo.jp_pos)
    jf_quat = quat_mul(pq, topo.jp_quat)
    anchors = jnp.where(is_root[:, None], pos, jf_pos)
    axes = jnp.where(
        is_root[:, None],
        quat_rotate(quat, topo.axis),
        quat_rotate(jf_quat, topo.axis),
    )
    return anchors, axes


def _jacobian_dense(topo: ArtTopo, pos, quat, sel=None):
    """Dense loop-free geometric Jacobians.

    pos/quat: (..., Ls, 3/4). sel: optional (B,) numpy link selection
    (default: all links). Returns (..., B, 6, nv) with rows
    [linvel(3); angvel(3)] of each selected link origin.
    """
    mk = topo_masks(topo)
    D = topo.num_dofs
    anchors, axes = joint_world_frames(topo, pos, quat)
    if sel is None:
        sel = np.arange(topo.num_links)
    sel = np.asarray(sel, np.int32)
    body_pos = pos[..., sel, :]  # (..., B, 3)

    if D:
        axd = axes[..., mk.dof_link, :]  # (..., D, 3)
        anch_d = anchors[..., mk.dof_link, :]
        rev_d = mk.is_rev[mk.dof_link]  # (D,)
        pris_d = mk.is_pris[mk.dof_link]
        rel = body_pos[..., :, None, :] - anch_d[..., None, :, :]  # (..., B, D, 3)
        lin = rev_d[:, None] * jnp.cross(
            jnp.broadcast_to(axd[..., None, :, :], rel.shape), rel
        ) + pris_d[:, None] * axd[..., None, :, :]
        ang = (rev_d[:, None] * axd)[..., None, :, :] + jnp.zeros_like(rel)
        A = mk.anc[sel][:, mk.dof_link]  # (B, D)
        Jj = jnp.concatenate([lin, ang], axis=-1) * A[:, :, None]  # (..., B, D, 6)
        Jj = jnp.swapaxes(Jj, -1, -2)  # (..., B, 6, D)
    else:
        Jj = jnp.zeros(body_pos.shape[:-1] + (6, 0), pos.dtype)

    if topo.fixed_base:
        return Jj
    # base cols: translation k -> [e_k; 0]; rotation k -> [e_k x rel_b; e_k]
    rel_b = body_pos - pos[..., 0:1, :]  # (..., B, 3)
    eye = jnp.eye(3, dtype=pos.dtype)
    zero = jnp.zeros(rel_b.shape[:-1] + (3, 3), pos.dtype)
    trans = jnp.concatenate([eye + zero, zero], axis=-2)  # (..., B, 6, 3)
    # lin rows of rotation cols: (e_k x rel)_r = -skew(rel)[r, k]
    rot_lin = jnp.cross(
        jnp.broadcast_to(eye, rel_b.shape[:-1] + (3, 3)),
        rel_b[..., None, :],
    )  # (..., B, k, 3) — row k = e_k x rel
    rot = jnp.concatenate(
        [jnp.swapaxes(rot_lin, -1, -2), eye + zero], axis=-2
    )  # (..., B, 6, 3)
    return jnp.concatenate([trans, rot, Jj], axis=-1)


def body_jacobian(topo: ArtTopo, pos, quat, link: int):
    """Jacobian of ONE link (..., 6, nv) — what task-space controllers need;
    avoids materializing the full per-link tensor in the hot loop."""
    return _jacobian_dense(topo, pos, quat, sel=[link])[..., 0, :, :]


def jacobian(topo: ArtTopo, pos, quat):
    """Geometric Jacobians for every link: (..., Ls, 6, nv) mapping generalized
    velocity to [linvel(3); angvel(3)] of each link origin — row layout matches
    the reference jacobian tensor (/root/reference/examples/franka_cube_ik_osc.py:389-391
    uses dpose=[pos_err, orn_err] against rows [lin, ang]).

    nv = D for fixed base, 6 + D for floating base (base cols first:
    [linear xyz, angular xyz] like IsaacGym's floating-base layout).
    """
    return _jacobian_dense(topo, pos, quat)
