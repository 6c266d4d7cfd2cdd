"""Neighbor-list contacts for LARGE mixed free-body worlds (boxes + spheres).

The static contact table (physics/contacts.py) is O(n^2) in pair ROWS —
fine for a few dozen actors, impossible for the reference's 1000-body
single-collision-group scenes when they aren't pure spheres
(/root/reference/examples/projectiles.py:120 group -1 semantics,
1080_balls_of_solitude.py scale). The pure-sphere case has the dense Pallas
path (ops/sphere_world.py); this module covers the general free-body case:

  broadphase  — dense (F, F) center-distance tiles minus bounding radii
                (VPU-friendly, no trees), then a per-row `lax.top_k` keeps
                the K nearest POTENTIAL partners with j > i: a fixed-shape
                (F, K) neighbor list rebuilt every substep.
  narrowphase — per (i, j) candidate: sphere-sphere / sphere-box closest
                point, box-box pair-level face SAT with a 4-corner manifold
                (per-vertex axes break exactly-aligned stacks — the same
                lesson as the static path's box-box).
  solver      — mass-split relaxed Jacobi over the (F*K*4 + F*8) contact
                rows with accumulated normal + Coulomb-cone friction
                impulses, identical math to physics/contacts.py; scatter
                adds are `.at[].add` on (F,) velocity arrays, which XLA
                lowers to efficient batched scatters.

Conventions match contacts.py: normal points j -> i (b -> a), Baumgarte
beta=0.2, speculative targets below the slop depth, PhysX AVERAGE combine.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math.quat import quat_rotate, quat_rotate_inverse, quat_to_matrix

BIG = 1e30
_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32,
)  # (8, 3)


class NeighborWorldSpec(NamedTuple):
    """Static description of one env's large free-body world."""

    shape_idx: np.ndarray  # (F,) env shape indices
    free_idx: np.ndarray  # (F,) free-body batch indices
    body_slot: np.ndarray  # (F,) env body slots
    is_box: np.ndarray  # (F,) bool (False = sphere)
    allow: np.ndarray  # (F, F) bool, j > i collidable pairs
    k_neighbors: int
    ground_spheres: bool  # False: sphere ground rows owned elsewhere
    has_ground: bool
    plane_n: np.ndarray  # (3,)
    plane_d: float
    plane_friction: float
    plane_restitution: float
    # local shape offset/rotation in the body frame (round-4 eligibility
    # broadening: projectiles.py-style worlds carry shape origins —
    # /root/reference/examples/projectiles.py:120). Identity rows are the
    # common case and fold away in the fused pose math.
    local_pos: np.ndarray = None  # (F, 3)
    local_quat: np.ndarray = None  # (F, 4)


def build_spec(
    scene,
    threshold: int = 64,
    k_neighbors: int = 12,
    exclude_sphere_pairs: bool = False,
) -> Optional[NeighborWorldSpec]:
    """Pick the single-shape sphere/box free bodies of `scene` when there
    are at least `threshold` of them AND they are not a pure-sphere set
    (pure spheres take the dense Pallas path in sphere_world).

    With exclude_sphere_pairs=True (the sphere-world path coexists) this
    spec skips sphere-sphere pairs and sphere ground rows — it handles only
    the pairs that involve a box."""
    from ..core.scene import SHAPE_BOX, SHAPE_SPHERE

    fg = scene.free_group
    if fg is None:
        return None
    sh = scene.shapes
    rows = []
    for fi, b in enumerate(fg.body_slot):
        s = np.nonzero(sh.body_slot == b)[0]
        # single-shape sphere/box free bodies; local shape offset/rotation
        # is allowed (folded into the per-substep pose math — round-4
        # eligibility broadening for projectiles.py-style shape origins).
        # BUT the fused pose math treats the shape center as the COM
        # (inertia arms, vc = v + w x arm), so a link whose explicit
        # <inertial> COM is NOT at the geom origin must take the general
        # path or its torque arms are about the wrong point. Auto-derived
        # inertia stays eligible: there the geom center IS the physical
        # COM by construction.
        if len(s) == 1 and sh.kind[s[0]] in (SHAPE_SPHERE, SHAPE_BOX):
            link = scene.actors[fg.slots[fi]].asset.links[0]
            if getattr(link, "explicit_inertial", False) and (
                np.linalg.norm(scene.body_com[b] - sh.pos[s[0]]) > 1e-6
            ):
                continue
            rows.append((int(s[0]), fi, int(b), sh.kind[s[0]] == SHAPE_BOX))
    if len(rows) < threshold or not any(r[3] for r in rows):
        return None
    shape_idx = np.array([r[0] for r in rows], np.int32)
    free_idx = np.array([r[1] for r in rows], np.int32)
    body_slot = np.array([r[2] for r in rows], np.int32)
    is_box = np.array([r[3] for r in rows], bool)
    local_pos = np.asarray(sh.pos[shape_idx], np.float32)
    local_quat = np.asarray(sh.quat[shape_idx], np.float32)

    grp = sh.collision_group[shape_idx]
    flt = sh.collision_filter[shape_idx]
    gi, gj = grp[:, None], grp[None, :]
    allow = (gi == gj) | (gi == -1) | (gj == -1)
    allow &= (flt[:, None] & flt[None, :]) == 0
    allow &= np.triu(np.ones_like(allow), 1) > 0  # each pair once, j > i
    if exclude_sphere_pairs:
        allow &= is_box[:, None] | is_box[None, :]

    has_ground = scene.ground is not None and scene.heightfield is None
    if has_ground:
        n = np.asarray(scene.ground.normal, np.float32)
        n = n / max(np.linalg.norm(n), 1e-9)
        pd = float(scene.ground.distance)
        pf = float(scene.ground.static_friction)
        pr = float(scene.ground.restitution)
    else:
        n, pd, pf, pr = np.array([0, 0, 1], np.float32), 0.0, 1.0, 0.0
    return NeighborWorldSpec(
        shape_idx=shape_idx,
        free_idx=free_idx,
        body_slot=body_slot,
        is_box=is_box,
        allow=np.asarray(allow, bool),
        k_neighbors=int(min(k_neighbors, len(rows) - 1)),
        ground_spheres=not exclude_sphere_pairs,
        has_ground=has_ground,
        plane_n=n,
        plane_d=pd,
        plane_friction=pf,
        plane_restitution=pr,
        local_pos=local_pos,
        local_quat=local_quat,
    )


def _point_in_box(rel, half):
    """Signed distance + outward local normal of points vs a box.
    rel (..., 3) point in box local frame, half (..., 3)."""
    q = jnp.abs(rel) - half
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sd = outside + inside
    # normal: gradient direction (outside: toward point from clamp;
    # inside: dominant axis)
    clamp = jnp.clip(rel, -half, half)
    d_out = rel - clamp
    ax = jnp.argmax(q, axis=-1)
    n_in = jnp.eye(3, dtype=rel.dtype)[ax] * jnp.sign(
        jnp.take_along_axis(rel, ax[..., None], -1)
    )
    use_out = outside > 1e-9
    n = jnp.where(
        use_out[..., None],
        d_out / jnp.clip(outside, 1e-9)[..., None],
        n_in,
    )
    return sd, n, clamp


def solve(
    spec: NeighborWorldSpec,
    pos,  # (N, F, 3) body origins (single-shape bodies: shape center)
    quat,  # (N, F, 4)
    vel,  # (N, F, 3)
    omega,  # (N, F, 3)
    size,  # (N, F, 3) shape size (sphere: [r,0,0]; box: half extents)
    inv_m,  # (N, F)
    inv_I,  # (N, F, 3, 3) world inverse inertia
    mu,  # (N, F)
    rest,  # (N, F)
    h: float,
    iters: int,
    contact_offset: float,
    slop: float,
    bounce_thresh: float,
    max_depen: float = 100.0,
):
    """Returns (vel', omega', cf (N, F, 3) normal contact force/body)."""
    N, F = pos.shape[:2]
    K = spec.k_neighbors
    M = 4  # manifold slots per candidate pair
    is_box = jnp.asarray(spec.is_box)
    r_sph = size[..., 0]
    # conservative bounding radius
    rb = jnp.where(is_box, jnp.linalg.norm(size, axis=-1), r_sph)

    # ---- broadphase: K nearest admissible partners with j > i ----
    d2 = jnp.sum(
        (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1
    )  # (N, F, F)
    gap = jnp.sqrt(jnp.clip(d2, 1e-12)) - rb[:, :, None] - rb[:, None, :]
    score = jnp.where(jnp.asarray(spec.allow)[None], gap, BIG)
    _, nidx = jax.lax.top_k(-score, K)  # (N, F, K) partner j per row i

    def g(x, idx):  # gather partner arrays: x (N, F, ...) -> (N, F, K, ...)
        return jnp.take_along_axis(
            x, idx.reshape(N, F * K, *([1] * (x.ndim - 2))).astype(jnp.int32),
            axis=1,
        ).reshape((N, F, K) + x.shape[2:])

    pj = g(pos, nidx)
    qj = g(quat, nidx)
    szj = g(size, nidx)
    boxj = g(jnp.broadcast_to(is_box, (N, F)), nidx)
    pi = pos[:, :, None]
    qi = quat[:, :, None]
    szi = size[:, :, None]
    boxi = jnp.broadcast_to(is_box[None, :, None], (N, F, K))
    ri = r_sph[:, :, None]
    rj = g(r_sph, nidx)

    # ---- narrowphase: (N, F, K, M) point/normal(j->i)/depth ----
    # sphere-sphere
    dvec = pi - pj
    dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
    n_ss = dvec / dist[..., None]
    dep_ss = (ri + rj) - dist
    pt_ss = pj + n_ss * rj[..., None]

    # sphere(i)-box(j)
    rel_ib = quat_rotate_inverse(qj, pi - pj)
    sd_ib, nl_ib, cl_ib = _point_in_box(rel_ib, szj)
    n_ib = quat_rotate(qj, nl_ib)
    dep_ib = ri - sd_ib
    pt_ib = pj + quat_rotate(qj, cl_ib)

    # box(i)-sphere(j): normal must point j -> i
    rel_jb = quat_rotate_inverse(qi, pj - pi)
    sd_jb, nl_jb, cl_jb = _point_in_box(rel_jb, szi)
    n_jb = -quat_rotate(qi, nl_jb)
    dep_jb = rj - sd_jb
    pt_jb = pi + quat_rotate(qi, cl_jb)

    # box-box: pair-level face SAT over the 6 face axes
    Ri = quat_to_matrix(qi)  # (N, F, K, 3, 3) columns = axes
    Rj = quat_to_matrix(qj)
    d_ij = pj - pi  # i -> j

    def ext(R, sz, ax):  # support extent of an OBB along world axis
        return sum(
            jnp.abs(jnp.einsum("...k,...k->...", ax, R[..., :, q])) * sz[..., q]
            for q in range(3)
        )

    best_sep = jnp.full((N, F, K), -BIG)
    best_n = jnp.zeros((N, F, K, 3))

    def sat_axis(ax, ok, best_sep, best_n):
        dist_ax = jnp.einsum("...k,...k->...", ax, d_ij)
        sep = jnp.abs(dist_ax) - ext(Ri, szi, ax) - ext(Rj, szj, ax)
        better = ok & (sep > best_sep)
        # orient j -> i: flip when the axis points i -> j
        n_dir = ax * jnp.where(dist_ax > 0, -1.0, 1.0)[..., None]
        best_sep = jnp.where(better, sep, best_sep)
        best_n = jnp.where(better[..., None], n_dir, best_n)
        return best_sep, best_n

    true_ = jnp.ones((N, F, K), bool)
    for Rsrc in (Ri, Rj):
        for k_ax in range(3):
            best_sep, best_n = sat_axis(
                Rsrc[..., :, k_ax], true_, best_sep, best_n
            )
    # edge-cross axes (the 9 a-edge x b-edge directions): without them,
    # edge-edge-only penetrations pick a wrong face normal (advisor
    # round-3 finding; the static path covers these via _box_box_edge)
    for ka in range(3):
        for kb in range(3):
            ax_raw = jnp.cross(Ri[..., :, ka], Rj[..., :, kb])
            nrm_ax = jnp.linalg.norm(ax_raw, axis=-1)
            ok = nrm_ax > 1e-6  # near-parallel edges: face axes cover it
            ax = ax_raw / jnp.clip(nrm_ax, 1e-6)[..., None]
            best_sep, best_n = sat_axis(ax, ok, best_sep, best_n)

    # manifold: 16 corner candidates, depth along the SAT axis
    ci_w = pi[..., None, :] + quat_rotate(
        qi[..., None, :], jnp.asarray(_CORNERS) * szi[..., None, :]
    )  # (N, F, K, 8, 3)
    cj_w = pj[..., None, :] + quat_rotate(
        qj[..., None, :], jnp.asarray(_CORNERS) * szj[..., None, :]
    )
    nb = best_n[..., None, :]
    # corner of j beyond i's face toward j: depth = (face plane) - c.n
    face_i = jnp.einsum("...k,...k->...", pi, best_n) - ext(Ri, szi, best_n)
    face_j = jnp.einsum("...k,...k->...", pj, best_n) + ext(Rj, szj, best_n)
    dep_cj = jnp.einsum("...ck,...k->...c", cj_w, best_n) - face_i[..., None]
    dep_ci = face_j[..., None] - jnp.einsum("...ck,...k->...c", ci_w, best_n)
    cand_dep = jnp.concatenate([dep_cj, dep_ci], axis=-1)  # (N, F, K, 16)
    cand_pt = jnp.concatenate(
        [cj_w, jnp.broadcast_to(ci_w, cj_w.shape)], axis=-2
    )
    # candidates deeper than the SAT overlap are lateral artifacts: clamp
    cand_dep = jnp.minimum(cand_dep, -best_sep[..., None])
    top_dep, ti = jax.lax.top_k(cand_dep, M)  # (N, F, K, M)
    gi4 = jnp.broadcast_to(ti[..., None], ti.shape + (3,))
    top_pt = jnp.take_along_axis(cand_pt, gi4, axis=-2)
    n_bb = jnp.broadcast_to(best_n[..., None, :], top_pt.shape)

    # ---- select per pair-kind; slots 1..3 only used by box-box ----
    both_box = boxi & boxj
    ss = (~boxi) & (~boxj)
    ib = (~boxi) & boxj
    jb = boxi & (~boxj)

    def pick(a_ss, a_ib, a_jb, a_bb):
        out0 = jnp.where(
            ss[..., None], a_ss, jnp.where(ib[..., None], a_ib, a_jb)
        )
        out0 = jnp.where(both_box[..., None], a_bb[..., 0, :], out0)
        rest_slots = jnp.where(
            both_box[..., None, None],
            a_bb[..., 1:, :],
            jnp.zeros_like(a_bb[..., 1:, :]),
        )
        return jnp.concatenate([out0[..., None, :], rest_slots], axis=-2)

    point = pick(pt_ss, pt_ib, pt_jb, top_pt)  # (N, F, K, M, 3)
    normal = pick(n_ss, n_ib, n_jb, n_bb)
    dep0 = jnp.where(ss, dep_ss, jnp.where(ib, dep_ib, dep_jb))
    dep0 = jnp.where(both_box, top_dep[..., 0], dep0)
    dep_rest = jnp.where(both_box[..., None], top_dep[..., 1:], -BIG)
    depth = jnp.concatenate([dep0[..., None], dep_rest], axis=-1)  # (N,F,K,M)
    # a candidate row whose broadphase slot is invalid (gap >= BIG/2,
    # i.e. filtered or padding) is inert
    valid = jnp.take_along_axis(score, nidx, axis=-1) < BIG * 0.5
    depth = jnp.where(valid[..., None], depth, -BIG)

    # ---- ground contacts: (N, F, 8) corner rows (spheres use slot 0) ----
    pn = jnp.asarray(spec.plane_n)
    if spec.has_ground:
        corners_w = pos[..., None, :] + quat_rotate(
            quat[..., None, :], jnp.asarray(_CORNERS) * size[..., None, :]
        )  # (N, F, 8, 3)
        d_gc = jnp.einsum("...ck,k->...c", corners_w, pn) - spec.plane_d
        gdep_box = -d_gc
        d_gs = jnp.einsum("...k,k->...", pos, pn) - spec.plane_d
        gdep_sph = r_sph - d_gs
        gpt_sph = pos - pn * r_sph[..., None]
        sph_g = jnp.concatenate(
            [gdep_sph[..., None], jnp.full_like(gdep_box[..., 1:], -BIG)],
            axis=-1,
        )
        if not spec.ground_spheres:  # sphere-world owns sphere ground rows
            sph_g = jnp.full_like(sph_g, -BIG)
        g_dep = jnp.where(is_box[None, :, None], gdep_box, sph_g)
        g_pt = jnp.where(
            is_box[None, :, None, None],
            corners_w,
            jnp.concatenate(
                [gpt_sph[..., None, :], corners_w[..., 1:, :] * 0.0], axis=-2
            ),
        )
    else:
        g_dep = jnp.full((N, F, 8), -BIG)
        g_pt = jnp.zeros((N, F, 8, 3))

    # ---- assemble flat contact rows ----
    idx_i = jnp.broadcast_to(jnp.arange(F)[None, :, None, None], (N, F, K, M))
    idx_j = jnp.broadcast_to(nidx[..., None], (N, F, K, M))
    Cp = F * K * M
    Cg = F * 8
    ia = jnp.concatenate(
        [idx_i.reshape(N, Cp),
         jnp.broadcast_to(jnp.arange(F)[None, :, None], (N, F, 8)).reshape(N, Cg)],
        axis=1,
    )
    ib_ = jnp.concatenate(
        [idx_j.reshape(N, Cp), jnp.zeros((N, Cg), jnp.int32)], axis=1
    )
    has_b = jnp.concatenate(
        [jnp.ones((N, Cp), bool), jnp.zeros((N, Cg), bool)], axis=1
    )
    pt = jnp.concatenate([point.reshape(N, Cp, 3), g_pt.reshape(N, Cg, 3)], 1)
    nrm = jnp.concatenate(
        [normal.reshape(N, Cp, 3),
         jnp.broadcast_to(pn, (N, Cg, 3))],
        axis=1,
    )
    dep = jnp.concatenate([depth.reshape(N, Cp), g_dep.reshape(N, Cg)], 1)
    mu_i = jnp.take_along_axis(mu, ia, 1)
    mu_j = jnp.where(
        has_b, jnp.take_along_axis(mu, ib_, 1), spec.plane_friction
    )
    mu_c = 0.5 * (mu_i + mu_j)
    re_c = 0.5 * (
        jnp.take_along_axis(rest, ia, 1)
        + jnp.where(has_b, jnp.take_along_axis(rest, ib_, 1), spec.plane_restitution)
    )

    active = dep > -contact_offset

    # ---- mass-split relaxed Jacobi (contacts.py math) ----
    beta = 0.2
    h_inv = 1.0 / h
    # cap matches physx.max_depenetration_velocity (plumbed from the caller
    # like the static-table solver — advisor round-3 finding)
    bias = jnp.minimum(beta * h_inv * jnp.clip(dep - slop, 0.0, None), max_depen)

    cnt = jnp.zeros((N, F))
    af = active.astype(pos.dtype)
    cnt = cnt.at[jnp.arange(N)[:, None], ia].add(af)
    cnt = cnt.at[jnp.arange(N)[:, None], ib_].add(af * has_b)
    cnt = jnp.clip(cnt, 1.0)
    split_a = 1.0 / jnp.take_along_axis(cnt, ia, 1)
    split_b = 1.0 / jnp.take_along_axis(cnt, ib_, 1)

    def gat(x, idx):
        return jnp.take_along_axis(
            x, idx.reshape(N, -1, *([1] * (x.ndim - 2))), axis=1
        ).reshape((N, idx.shape[1]) + x.shape[2:])

    im_a = gat(inv_m[..., None], ia)[..., 0]
    im_b = jnp.where(has_b, gat(inv_m[..., None], ib_)[..., 0], 0.0)
    iI_a = gat(inv_I, ia)
    iI_b = gat(inv_I, ib_) * has_b[..., None, None]
    r_a = pt - gat(pos, ia)
    r_b = pt - gat(pos, ib_)

    def eff_mass(direction):
        ta = jnp.cross(r_a, direction)
        tb = jnp.cross(r_b, direction)
        ka = im_a + jnp.einsum("nci,ncij,ncj->nc", ta, iI_a, ta)
        kb = im_b + jnp.einsum("nci,ncij,ncj->nc", tb, iI_b, tb)
        return 1.0 / jnp.clip(ka + kb, 1e-9)

    k_n = eff_mass(nrm)

    def rel_vel(v_, w_):
        va = gat(v_, ia) + jnp.cross(gat(w_, ia), r_a)
        vb = gat(v_, ib_) + jnp.cross(gat(w_, ib_), r_b)
        return va - jnp.where(has_b[..., None], vb, 0.0)

    vn0 = jnp.einsum("nck,nck->nc", rel_vel(vel, omega), nrm)
    bounce = jnp.where(vn0 < -bounce_thresh, -re_c * vn0, 0.0)
    target_vn = jnp.where(
        dep > slop, jnp.maximum(bias, bounce), (dep - slop) * h_inv
    )

    relax = 0.8
    nenv = jnp.arange(N)[:, None]

    def apply_impulse(v_, w_, imp):
        dv_a = imp * (im_a * split_a)[..., None]
        dw_a = jnp.einsum(
            "ncij,ncj->nci", iI_a * split_a[..., None, None],
            jnp.cross(r_a, imp),
        )
        dv_b = -imp * (im_b * split_b)[..., None]
        dw_b = jnp.einsum(
            "ncij,ncj->nci", iI_b * split_b[..., None, None],
            jnp.cross(r_b, -imp),
        )
        v_ = v_.at[nenv, ia].add(dv_a)
        w_ = w_.at[nenv, ia].add(dw_a)
        v_ = v_.at[nenv, ib_].add(jnp.where(has_b[..., None], dv_b, 0.0))
        w_ = w_.at[nenv, ib_].add(jnp.where(has_b[..., None], dw_b, 0.0))
        return v_, w_

    C = ia.shape[1]
    lam_n = jnp.zeros((N, C), pos.dtype)
    lam_t = jnp.zeros((N, C, 3), pos.dtype)

    def body(carry, _):
        v_, w_, lam, lamt = carry
        vr = rel_vel(v_, w_)
        vn = jnp.einsum("nck,nck->nc", vr, nrm)
        new_lam = jnp.clip(lam + relax * k_n * (target_vn - vn), 0.0, None)
        dlam = jnp.where(active, new_lam - lam, 0.0)
        imp = dlam[..., None] * nrm
        vt = vr - vn[..., None] * nrm
        vt_norm = jnp.linalg.norm(vt, axis=-1).clip(1e-9)
        t_dir = vt / vt_norm[..., None]
        k_t = eff_mass(t_dir)
        lamt_raw = lamt - (relax * k_t * vt_norm)[..., None] * t_dir
        cap = mu_c * new_lam
        tnorm = jnp.linalg.norm(lamt_raw, axis=-1).clip(1e-9)
        new_lamt = lamt_raw * jnp.minimum(1.0, cap / tnorm)[..., None]
        imp = imp + jnp.where(active[..., None], new_lamt - lamt, 0.0)
        v_, w_ = apply_impulse(v_, w_, imp)
        return (v_, w_, new_lam, new_lamt), None

    (vel, omega, lam_n, lam_t), _ = jax.lax.scan(
        body, (vel, omega, lam_n, lam_t), None, length=iters
    )

    f_c = jnp.where(active, lam_n, 0.0)[..., None] * nrm * h_inv
    cf = jnp.zeros((N, F, 3), pos.dtype)
    cf = cf.at[nenv, ia].add(f_c)
    cf = cf.at[nenv, ib_].add(jnp.where(has_b[..., None], -f_c, 0.0))
    return vel, omega, cf
