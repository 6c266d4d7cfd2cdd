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

from ..core.scene import JT_FIXED, JT_PRISMATIC, JT_REVOLUTE, JT_ROOT, ArtGroup
from ..math.quat import quat_mul, quat_rotate


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
    world poses (..., Ls, 3/4). Anchor/axis of the root are its own frame."""
    anchors, axes = [], []
    for i in range(topo.num_links):
        if topo.jtype[i] == JT_ROOT:
            anchors.append(pos[..., i, :])
            axes.append(quat_rotate(quat[..., i, :], topo.axis[i]))
            continue
        p = topo.parent[i]
        jf_pos = pos[..., p, :] + quat_rotate(quat[..., p, :], topo.jp_pos[i])
        jf_quat = quat_mul(quat[..., p, :], topo.jp_quat[i])
        anchors.append(jf_pos)
        axes.append(quat_rotate(jf_quat, topo.axis[i]))
    return jnp.stack(anchors, axis=-2), jnp.stack(axes, axis=-2)


def body_jacobian(topo: ArtTopo, pos, quat, link: int):
    """Jacobian of ONE link (..., 6, nv) — what task-space controllers need;
    avoids materializing the full per-link tensor in the hot loop."""
    D = topo.num_dofs
    anchors, axes = joint_world_frames(topo, pos, quat)
    chain = set()
    x = link
    while x != -1:
        chain.add(x)
        x = topo.parent[x]
    link_of_dof = {topo.dof_of_link[i]: i for i in range(topo.num_links) if topo.dof_of_link[i] >= 0}
    zero3 = pos[..., 0, :] * 0.0
    cols = []
    if not topo.fixed_base:
        rel = pos[..., link, :] - pos[..., 0, :]
        for k in range(3):
            e = zero3 + jnp.eye(3, dtype=pos.dtype)[k]
            cols.append(jnp.concatenate([e, zero3], axis=-1))
        for k in range(3):
            e = zero3 + jnp.eye(3, dtype=pos.dtype)[k]
            cols.append(jnp.concatenate([jnp.cross(e, rel), e], axis=-1))
    for d in range(D):
        i = link_of_dof[d]
        if i not in chain:
            cols.append(jnp.concatenate([zero3, zero3], axis=-1))
        elif topo.jtype[i] == JT_REVOLUTE:
            s_i = axes[..., i, :]
            lin = jnp.cross(s_i, pos[..., link, :] - anchors[..., i, :])
            cols.append(jnp.concatenate([lin, s_i], axis=-1))
        elif topo.jtype[i] == JT_PRISMATIC:
            cols.append(jnp.concatenate([axes[..., i, :], zero3], axis=-1))
        else:
            cols.append(jnp.concatenate([zero3, zero3], axis=-1))
    return jnp.stack(cols, axis=-1)  # (..., 6, nv)


def jacobian(topo: ArtTopo, pos, quat):
    """Geometric Jacobians for every link: (..., Ls, 6, nv) mapping generalized
    velocity to [linvel(3); angvel(3)] of each link origin — row layout matches
    the reference jacobian tensor (/root/reference/examples/franka_cube_ik_osc.py:389-391
    uses dpose=[pos_err, orn_err] against rows [lin, ang]).

    nv = D for fixed base, 6 + D for floating base (base cols first:
    [linear xyz, angular xyz] like IsaacGym's floating-base layout).
    """
    L = topo.num_links
    D = topo.num_dofs
    base = 0 if topo.fixed_base else 6
    nv = base + D
    anchors, axes = joint_world_frames(topo, pos, quat)

    # static ancestor table: anc[b] = set of links on b's chain to root
    anc = []
    for b in range(L):
        chain = set()
        x = b
        while x != -1:
            chain.add(x)
            x = topo.parent[x]
        anc.append(chain)

    # link with dof index d -> link id
    link_of_dof = {topo.dof_of_link[i]: i for i in range(L) if topo.dof_of_link[i] >= 0}

    zero3 = pos[..., 0, :] * 0.0  # (..., 3), inherits batch sharding
    rows = []
    for b in range(L):
        cols = []
        if not topo.fixed_base:
            rel = pos[..., b, :] - pos[..., 0, :]
            for k in range(3):  # base translation cols: lin = e_k, ang = 0
                e = zero3 + jnp.eye(3, dtype=pos.dtype)[k]
                cols.append(jnp.concatenate([e, zero3], axis=-1))
            for k in range(3):  # base rotation cols: lin = e_k x rel, ang = e_k
                e = zero3 + jnp.eye(3, dtype=pos.dtype)[k]
                cols.append(jnp.concatenate([jnp.cross(e, rel), e], axis=-1))
        for d in range(D):
            i = link_of_dof[d]
            if i not in anc[b]:
                cols.append(jnp.concatenate([zero3, zero3], axis=-1))
            elif topo.jtype[i] == JT_REVOLUTE:
                s_i = axes[..., i, :]
                lin = jnp.cross(s_i, pos[..., b, :] - anchors[..., i, :])
                cols.append(jnp.concatenate([lin, s_i], axis=-1))
            elif topo.jtype[i] == JT_PRISMATIC:
                cols.append(jnp.concatenate([axes[..., i, :], zero3], axis=-1))
            else:
                cols.append(jnp.concatenate([zero3, zero3], axis=-1))
        rows.append(jnp.stack(cols, axis=-1))  # (..., 6, nv)
    return jnp.stack(rows, axis=-3)  # (..., L, 6, nv)
