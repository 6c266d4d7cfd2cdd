"""Contact generation and batched impulse solver for free rigid bodies.

TPU-first replacement for the reference's PhysX contact pipeline (SURVEY.md
N2): contact counts are static (fixed candidate slots per shape/pair, masked
at runtime), and the velocity-level solve is a fixed-iteration relaxed Jacobi
scheme — fully batched over (env, contact), no sequential Gauss-Seidel chains,
which is what maps onto the VPU. Iteration count mirrors
SimParams.physx.num_position_iterations.

Supported narrowphase (free bodies + static colliders + ground plane):
  sphere-plane, capsule-plane, box-plane (8 corners),
  sphere-sphere, sphere-box, sphere-capsule, capsule-capsule (segment),
  capsule-box (2 endpoint spheres), box-box (vertex-in-box, both directions).

Collision group/filter semantics match create_actor(group, filter):
same group (or group -1) collides; shared filter bit suppresses
(/root/reference/examples/1080_balls_of_solitude.py:117-138).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import (
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_MESH,
    SHAPE_SPHERE,
    Scene,
)
from ..math.quat import quat_mul, quat_rotate
from ..utils.linalg import binv

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)


def _shapes_of_bodies(scene: Scene, body_slots: np.ndarray):
    """Shape indices attached to the given env body slots."""
    out = []
    for b in body_slots:
        out.append(np.nonzero(scene.shapes.body_slot == b)[0])
    return out


def _pair_allowed(scene, si, sj):
    sh = scene.shapes
    if sh.actor_slot[si] == sh.actor_slot[sj]:
        return False  # self-collision off within an actor's shapes (free bodies: 1 body anyway)
    gi, gj = sh.collision_group[si], sh.collision_group[sj]
    if not (gi == gj or gi == -1 or gj == -1):
        return False
    if (sh.collision_filter[si] & sh.collision_filter[sj]) != 0:
        return False
    return True


class _Job(NamedTuple):
    """Static candidate-contact table. All arrays (C, ...) numpy."""

    body_a: np.ndarray  # free-body index (into F)
    body_b: np.ndarray  # free-body index or -1 (world/static)
    kind: np.ndarray  # narrowphase dispatch code
    shape_a: np.ndarray  # env shape index
    shape_b: np.ndarray  # env shape index or -1 (plane)
    slot: np.ndarray  # sub-slot (corner index etc.)


# dispatch codes
K_SPH_PLANE, K_CAP_PLANE, K_BOX_PLANE = 0, 1, 2
K_SPH_SPH, K_SPH_BOX, K_SPH_CAP, K_CAP_CAP, K_CAP_BOX, K_BOX_BOX = 3, 4, 5, 6, 7, 8


class ContactSolver:
    def __init__(self, scene: Scene, max_pair_shapes: int = 4096):
        self.scene = scene
        self.enabled = False
        self.num_free = 0
        if scene.free_group is None or scene.free_group.count == 0:
            return
        fg = scene.free_group
        self.num_free = fg.count
        sh = scene.shapes
        free_shape_lists = _shapes_of_bodies(scene, fg.body_slot)
        # map env shape idx -> free body idx (-1 if not free)
        shape_free = -np.ones(sh.count, np.int64)
        for fi, idxs in enumerate(free_shape_lists):
            for s in idxs:
                shape_free[s] = fi
        static_shapes = []
        if scene.static_group is not None:
            for b in scene.static_group.body_slot:
                static_shapes.extend(np.nonzero(sh.body_slot == b)[0].tolist())
        # articulated-link shapes participate as KINEMATIC colliders: free
        # bodies collide against them at the links' FK poses/velocities
        # (one-way coupling — what gripper-grasps-cube scenes need,
        # franka_cube_ik_osc.py:336-406; two-way joint-space impulses are the
        # phase-2 roadmap). They carry their owner's velocity so friction
        # drags grasped objects along with the moving hand.
        link_shapes = []
        for g in scene.art_groups:
            for slot_ in g.slots:
                meta = scene.actors[slot_]
                for b in range(meta.body_start, meta.body_start + meta.body_count):
                    link_shapes.extend(np.nonzero(sh.body_slot == b)[0].tolist())

        rows = {k: [] for k in ["a", "b", "kind", "sa", "sb", "slot"]}

        def add(a, b, kind, sa, sb, slot=0):
            rows["a"].append(a)
            rows["b"].append(b)
            rows["kind"].append(kind)
            rows["sa"].append(sa)
            rows["sb"].append(sb)
            rows["slot"].append(slot)

        # --- plane / heightfield contacts ---
        if scene.ground is not None or scene.heightfield is not None:
            for fi, idxs in enumerate(free_shape_lists):
                for s in idxs:
                    k = sh.kind[s]
                    if k == SHAPE_SPHERE:
                        add(fi, -1, K_SPH_PLANE, s, -1)
                    elif k == SHAPE_CAPSULE:
                        add(fi, -1, K_CAP_PLANE, s, -1, 0)
                        add(fi, -1, K_CAP_PLANE, s, -1, 1)
                    elif k in (SHAPE_BOX, SHAPE_MESH):
                        for c in range(8):
                            add(fi, -1, K_BOX_PLANE, s, -1, c)

        # --- pairwise contacts (free-free, free-static, free-link) ---
        all_dyn = [(s, shape_free[s]) for idxs in free_shape_lists for s in idxs]
        all_stat = [(s, -1) for s in static_shapes + link_shapes]

        def kind_code(ka, kb):
            m = {SHAPE_MESH: SHAPE_BOX}  # meshes collide as their bounding boxes (v1)
            ka = m.get(ka, ka)
            kb = m.get(kb, kb)
            table = {
                (SHAPE_SPHERE, SHAPE_SPHERE): (K_SPH_SPH, False, 1),
                (SHAPE_SPHERE, SHAPE_BOX): (K_SPH_BOX, False, 1),
                (SHAPE_BOX, SHAPE_SPHERE): (K_SPH_BOX, True, 1),
                (SHAPE_SPHERE, SHAPE_CAPSULE): (K_SPH_CAP, False, 1),
                (SHAPE_CAPSULE, SHAPE_SPHERE): (K_SPH_CAP, True, 1),
                (SHAPE_CAPSULE, SHAPE_CAPSULE): (K_CAP_CAP, False, 1),
                (SHAPE_CAPSULE, SHAPE_BOX): (K_CAP_BOX, False, 2),
                (SHAPE_BOX, SHAPE_CAPSULE): (K_CAP_BOX, True, 2),
                (SHAPE_BOX, SHAPE_BOX): (K_BOX_BOX, False, 16),
            }
            return table[(ka, kb)]

        pairs = []
        n_dyn = len(all_dyn)
        for i in range(n_dyn):
            for j in range(i + 1, n_dyn):
                si, fi = all_dyn[i]
                sj, fj = all_dyn[j]
                if _pair_allowed(scene, si, sj):
                    pairs.append((si, fi, sj, fj))
            for sj, _ in all_stat:
                si, fi = all_dyn[i]
                if _pair_allowed(scene, si, sj):
                    pairs.append((si, fi, sj, -1))
        if len(pairs) > max_pair_shapes:
            raise ValueError(
                f"{len(pairs)} contact pairs exceeds max_pair_shapes; "
                "hook up the Pallas broadphase for this scene size"
            )
        for si, fi, sj, fj in pairs:
            code, swap, nslots = kind_code(sh.kind[si], sh.kind[sj])
            if swap:
                si, sj, fi, fj = sj, si, fj, fi
            for c in range(nslots):
                add(fi, fj, code, si, sj, c)

        if not rows["a"]:
            return
        self.enabled = True
        self.job = _Job(
            body_a=np.asarray(rows["a"], np.int32),
            body_b=np.asarray(rows["b"], np.int32),
            kind=np.asarray(rows["kind"], np.int32),
            shape_a=np.asarray(rows["sa"], np.int32),
            shape_b=np.asarray(rows["sb"], np.int32),
            slot=np.asarray(rows["slot"], np.int32),
        )
        self.num_contacts = len(self.job.body_a)
        # heightfield terrain (SURVEY.md N10: contact stays heightfield-native)
        hf = scene.heightfield
        if hf is not None:
            self.hf_data = jnp.asarray(hf.data, jnp.float32)
            self.hf_scale = float(hf.horizontal_scale)
            self.hf_off = (float(hf.offset_x), float(hf.offset_y))
        else:
            self.hf_data = None
        # plane params
        pl = scene.ground
        if pl is not None:
            n = np.asarray(pl.normal, np.float32)
            n = n / max(np.linalg.norm(n), 1e-9)
            self.plane_n = n
            self.plane_d = np.float32(pl.distance)
            self.plane_friction = np.float32(pl.static_friction)
            self.plane_restitution = np.float32(pl.restitution)
        else:
            self.plane_n = np.array([0, 0, 1], np.float32)
            self.plane_d = np.float32(0)
            self.plane_friction = np.float32(1.0)
            self.plane_restitution = np.float32(0.0)
        # static shape geometry constants
        ssh = scene.shapes
        self.sh_size = jnp.asarray(ssh.size, jnp.float32)
        self.sh_pos = jnp.asarray(ssh.pos, jnp.float32)
        self.sh_quat = jnp.asarray(ssh.quat, jnp.float32)
        self.sh_body = jnp.asarray(ssh.body_slot, jnp.int32)

    # ------------------------------------------------------------------
    def solve_free(self, stepper, state, p0, q0, v, w, m, I_w, com_w, params, h):
        """Correct free-body velocities with contact impulses.

        state: the canonical SimState at step entry (used for non-free body
        poses — static colliders; they never move inside a substep).
        p0/q0/v/w/com_w: (N, F, .); m: (N, F); I_w: (N, F, 3, 3).
        Returns (v, w, contact_force (N, F, 3)).
        """
        N, F = m.shape
        B_env = self.scene.num_bodies_per_env
        zero_cf = jnp.zeros((N, B_env, 3), v.dtype)
        if not self.enabled:
            return v, w, zero_cf

        job = self.job
        C = self.num_contacts
        a_idx = jnp.asarray(job.body_a)
        b_is_body = jnp.asarray(job.body_b >= 0)
        b_safe = jnp.asarray(np.maximum(job.body_b, 0))

        sh = self.scene.shapes
        fg = self.scene.free_group
        body_to_free = -np.ones(self.scene.num_bodies_per_env, np.int64)
        for fi, b in enumerate(fg.body_slot):
            body_to_free[b] = fi

        def shape_pose(s_arr):
            s_np = np.asarray(s_arr)
            owner_body = sh.body_slot[s_np]
            owner_free = body_to_free[owner_body]
            is_free = jnp.asarray(owner_free >= 0)[None, :, None]
            of = np.maximum(owner_free, 0)
            bp = jnp.where(is_free, p0[:, of], state.body_pos[:, owner_body])
            bq = jnp.where(is_free, q0[:, of], state.body_quat[:, owner_body])
            spos = params.shape_pos[:, jnp.asarray(s_np)]  # (N, C, 3)
            squat = jnp.asarray(sh.quat[s_np], jnp.float32)
            return bp + quat_rotate(bq, spos), quat_mul(bq, squat)

        pa, qa = shape_pose(job.shape_a)
        sb_safe = np.maximum(job.shape_b, 0)
        pb, qb = shape_pose(sb_safe)

        # runtime sizes (set_actor_scale / domain randomization) — (N, C, 3)
        size_a = params.shape_size[:, jnp.asarray(job.shape_a)]
        size_b = params.shape_size[:, jnp.asarray(sb_safe)]
        kind = job.kind
        slot = job.slot

        # --- narrowphase: produce (point, normal(b->a), depth) per contact ---
        point = jnp.zeros((N, C, 3), v.dtype)
        normal = jnp.zeros((N, C, 3), v.dtype)
        depth = jnp.full((N, C), -1.0, v.dtype)

        pn = jnp.asarray(self.plane_n)
        pd = jnp.asarray(self.plane_d)

        if self.hf_data is not None:
            def ground_sdf(p):
                return _heightfield_sdf(
                    self.hf_data, self.hf_scale, self.hf_off, p
                )
        else:
            def ground_sdf(p):
                d = jnp.einsum("nck,k->nc", p, pn) - pd
                return d, jnp.broadcast_to(pn, p.shape)

        # vectorized over all contacts; select by kind via where masks
        r_a = size_a[..., 0]   # (N, C)
        hl_a = size_a[..., 1]
        r_b = size_b[..., 0]

        # sphere-plane/terrain
        d_sp, n_sp = ground_sdf(pa)
        pt_sp = pa - n_sp * r_a[..., None]
        dep_sp = r_a - d_sp

        # capsule-plane: endpoint spheres along local z
        zdir = quat_rotate(qa, jnp.array([0.0, 0, 1.0]))
        end_sign = jnp.asarray(np.where(job.slot == 0, 1.0, -1.0), jnp.float32)
        cap_end = pa + zdir * (hl_a * end_sign)[..., None]
        d_cp, n_cp = ground_sdf(cap_end)
        pt_cp = cap_end - n_cp * r_a[..., None]
        dep_cp = r_a - d_cp

        # box-plane: corners
        corners = jnp.asarray(_BOX_CORNERS)[job.slot]  # (C, 3)
        corner_w = pa + quat_rotate(qa, corners * size_a)
        d_bp, n_bp = ground_sdf(corner_w)
        dep_bp = -d_bp

        # sphere-sphere
        dvec = pa - pb
        dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
        n_ss = dvec / dist[..., None]
        dep_ss = (r_a + r_b) - dist
        pt_ss = pb + n_ss * r_b[..., None]

        # sphere-box: closest point on box b to center a
        rel = quat_rotate(_qconj(qb), pa - pb)
        clamped = jnp.clip(rel, -size_b, size_b)
        inside = jnp.all(jnp.abs(rel) <= size_b, axis=-1)
        # if inside, push out along min-penetration axis
        pen_ax = size_b - jnp.abs(rel)
        ax = jnp.argmin(pen_ax, axis=-1)
        sgn = jnp.sign(jnp.take_along_axis(rel, ax[..., None], -1))
        surf = jnp.where(
            inside[..., None],
            _scatter_axis(clamped, ax, sgn[..., 0] * jnp.take_along_axis(size_b, ax[..., None], -1)[..., 0]),
            clamped,
        )
        cp_w = pb + quat_rotate(qb, surf)
        dvec_sb = pa - cp_w
        dist_sb = jnp.linalg.norm(dvec_sb, axis=-1).clip(1e-9)
        n_sb = jnp.where(
            inside[..., None],
            quat_rotate(qb, _axis_vec(ax, sgn[..., 0])),
            dvec_sb / dist_sb[..., None],
        )
        dep_sb = jnp.where(inside, r_a + dist_sb, r_a - dist_sb)
        pt_sb = cp_w

        # sphere-capsule: closest point on capsule-b segment to a
        zb = quat_rotate(qb, jnp.array([0.0, 0, 1.0]))
        hl_b = size_b[..., 1]
        t = jnp.clip(jnp.einsum("nck,nck->nc", pa - pb, zb), -hl_b, hl_b)
        seg = pb + zb * t[..., None]
        dvec_sc = pa - seg
        dist_sc = jnp.linalg.norm(dvec_sc, axis=-1).clip(1e-9)
        n_sc = dvec_sc / dist_sc[..., None]
        dep_sc = (r_a + r_b) - dist_sc
        pt_sc = seg + n_sc * r_b[..., None]

        # capsule-capsule: segment-segment closest points
        za = zdir
        a0 = pa - za * hl_a[..., None]
        a1 = pa + za * hl_a[..., None]
        b0 = pb - zb * hl_b[..., None]
        b1 = pb + zb * hl_b[..., None]
        pA, pB = _segment_closest(a0, a1, b0, b1)
        dvec_cc = pA - pB
        dist_cc = jnp.linalg.norm(dvec_cc, axis=-1).clip(1e-9)
        n_cc = dvec_cc / dist_cc[..., None]
        dep_cc = (r_a + r_b) - dist_cc
        pt_cc = pB + n_cc * r_b[..., None]

        # capsule-box: endpoint spheres of capsule a vs box b
        cap_pt = pa + za * (hl_a * end_sign)[..., None]
        rel_cb = quat_rotate(_qconj(qb), cap_pt - pb)
        cl_cb = jnp.clip(rel_cb, -size_b, size_b)
        cp_cb = pb + quat_rotate(qb, cl_cb)
        dv_cb = cap_pt - cp_cb
        dist_cb = jnp.linalg.norm(dv_cb, axis=-1).clip(1e-9)
        n_cb = dv_cb / dist_cb[..., None]
        dep_cb = r_a - dist_cb
        pt_cb = cp_cb

        # box-box: vertices of a in b (slots 0-7) and b in a (slots 8-15)
        bb_sign = job.slot < 8
        corn_idx = np.where(job.slot < 8, job.slot, job.slot - 8)
        corn = jnp.asarray(_BOX_CORNERS)[corn_idx]
        # vertex of a in b frame (slots<8); vertex of b in a frame otherwise
        va_w = pa + quat_rotate(qa, corn * size_a)
        vb_w = pb + quat_rotate(qb, corn * size_b)
        vtx_w = jnp.where(jnp.asarray(bb_sign)[None, :, None], va_w, vb_w)
        ref_p = jnp.where(jnp.asarray(bb_sign)[None, :, None], pb, pa)
        ref_q = jnp.where(jnp.asarray(bb_sign)[None, :, None], qb, qa)
        ref_size = jnp.where(jnp.asarray(bb_sign)[None, :, None], size_b, size_a)
        rel_bb = quat_rotate(_qconj(ref_q), vtx_w - ref_p)
        pen_bb = ref_size - jnp.abs(rel_bb)
        inside_bb = jnp.all(pen_bb > 0, axis=-1)
        ax_bb = jnp.argmin(pen_bb, axis=-1)
        sgn_bb = jnp.sign(jnp.take_along_axis(rel_bb, ax_bb[..., None], -1))[..., 0]
        n_local = _axis_vec(ax_bb, sgn_bb)
        n_bb_raw = quat_rotate(ref_q, n_local)
        # normal must point b -> a
        n_bb = jnp.where(jnp.asarray(bb_sign)[None, :, None], n_bb_raw, -n_bb_raw)
        dep_bb = jnp.where(
            inside_bb, jnp.take_along_axis(pen_bb, ax_bb[..., None], -1)[..., 0], -1.0
        )
        pt_bb = vtx_w

        def sel(code, pt, n, dep):
            mask = jnp.asarray(kind == code)
            return (
                jnp.where(mask[None, :, None], pt, point),
                jnp.where(mask[None, :, None], n, normal),
                jnp.where(mask[None, :], dep, depth),
            )

        point, normal, depth = sel(K_SPH_PLANE, pt_sp, n_sp, dep_sp)
        point, normal, depth = sel(K_CAP_PLANE, pt_cp, n_cp, dep_cp)
        point, normal, depth = sel(K_BOX_PLANE, corner_w, n_bp, dep_bp)
        point, normal, depth = sel(K_SPH_SPH, pt_ss, n_ss, dep_ss)
        point, normal, depth = sel(K_SPH_BOX, pt_sb, n_sb, dep_sb)
        point, normal, depth = sel(K_SPH_CAP, pt_sc, n_sc, dep_sc)
        point, normal, depth = sel(K_CAP_CAP, pt_cc, n_cc, dep_cc)
        point, normal, depth = sel(K_CAP_BOX, pt_cb, n_cb, dep_cb)
        point, normal, depth = sel(K_BOX_BOX, pt_bb, n_bb, dep_bb)

        active = depth > -self.scene.sim_params.physx.contact_offset

        # --- material params per contact ---
        fr_a = params.shape_friction[:, job.shape_a]
        fr_b = jnp.where(
            jnp.asarray(job.shape_b >= 0)[None],
            params.shape_friction[:, sb_safe],
            jnp.asarray(self.plane_friction),
        )
        # PhysX default material combine mode is AVERAGE for both friction
        # and restitution — match it (the reference engine's default)
        mu = 0.5 * (fr_a + fr_b)
        re_a = params.shape_restitution[:, job.shape_a]
        re_b = jnp.where(
            jnp.asarray(job.shape_b >= 0)[None],
            params.shape_restitution[:, sb_safe],
            jnp.asarray(self.plane_restitution),
        )
        rest = 0.5 * (re_a + re_b)

        # --- Jacobi impulse iterations ---
        inv_m = 1.0 / m  # (N, F)
        inv_I = binv(I_w)  # (N, F, 3, 3)
        inv_m_a = inv_m[:, a_idx]
        inv_m_b = jnp.where(b_is_body[None], inv_m[:, b_safe], 0.0)
        inv_I_a = inv_I[:, a_idx]
        inv_I_b = jnp.where(
            b_is_body[None, :, None, None], inv_I[:, b_safe], 0.0
        )
        com_a = com_w[:, a_idx]
        com_b = jnp.where(b_is_body[None, :, None], com_w[:, b_safe], point)
        ra = point - com_a
        rb = point - com_b

        # effective mass along normal
        def eff_mass(direction):
            ta = jnp.cross(ra, direction)
            tb = jnp.cross(rb, direction)
            ka = inv_m_a + jnp.einsum(
                "nci,ncij,ncj->nc", ta, inv_I_a, ta
            )
            kb = inv_m_b + jnp.einsum("nci,ncij,ncj->nc", tb, inv_I_b, tb)
            return 1.0 / jnp.clip(ka + kb, 1e-9)

        k_n = eff_mass(normal)

        px = self.scene.sim_params.physx
        beta = 0.2
        slop = px.rest_offset + 5e-4
        h_inv = 1.0 / h
        bias = beta * h_inv * jnp.clip(depth - slop, 0.0, None)

        # pre-contact normal velocity for restitution
        def rel_vel(v_, w_):
            va = v_[:, a_idx] + jnp.cross(w_[:, a_idx], ra)
            vb = jnp.where(
                b_is_body[None, :, None],
                v_[:, b_safe] + jnp.cross(w_[:, b_safe], rb),
                vb_kin,
            )
            return va - vb

        # kinematic-collider surface velocity (articulated links / statics):
        # constant within the velocity solve, from the step-entry body state
        owner_b = sh.body_slot[np.maximum(np.asarray(job.shape_b), 0)]
        kin_mask = jnp.asarray((job.body_b < 0) & (job.shape_b >= 0))
        vb_kin = state.body_linvel[:, owner_b] + jnp.cross(
            state.body_angvel[:, owner_b], point - state.body_pos[:, owner_b]
        )
        vb_kin = jnp.where(kin_mask[None, :, None], vb_kin, 0.0)

        vn0 = jnp.einsum("nck,nck->nc", rel_vel(v, w), normal)
        bounce = jnp.where(
            vn0 < -px.bounce_threshold_velocity, -rest * vn0, 0.0
        )
        target_vn = jnp.maximum(bias, bounce)

        relax = 0.8 if C <= 16 else 0.35
        iters = max(6, 2 * self_iters(self))

        lam_n = jnp.zeros((N, C), v.dtype)

        def iter_body(carry, _):
            v_, w_, lam = carry
            vr = rel_vel(v_, w_)
            vn = jnp.einsum("nck,nck->nc", vr, normal)
            dlam = relax * k_n * (target_vn - vn)
            new_lam = jnp.clip(lam + dlam, 0.0, None)
            dlam = jnp.where(active, new_lam - lam, 0.0)
            imp = dlam[..., None] * normal

            # friction: project tangential velocity, clamp by mu*lam
            vt = vr - vn[..., None] * normal
            vt_norm = jnp.linalg.norm(vt, axis=-1).clip(1e-9)
            t_dir = vt / vt_norm[..., None]
            k_t = eff_mass(t_dir)
            dlam_t = jnp.clip(
                relax * k_t * vt_norm, 0.0, mu * new_lam
            )
            imp = imp - jnp.where(active, dlam_t, 0.0)[..., None] * t_dir

            dv_a = imp * inv_m_a[..., None]
            dw_a = jnp.einsum("ncij,ncj->nci", inv_I_a, jnp.cross(ra, imp))
            dv_b = -imp * inv_m_b[..., None]
            dw_b = jnp.einsum("ncij,ncj->nci", inv_I_b, jnp.cross(rb, -imp))

            v_ = v_.at[:, a_idx].add(dv_a)
            w_ = w_.at[:, a_idx].add(dw_a)
            v_ = v_.at[:, b_safe].add(jnp.where(b_is_body[None, :, None], dv_b, 0.0))
            w_ = w_.at[:, b_safe].add(jnp.where(b_is_body[None, :, None], dw_b, 0.0))
            return (v_, w_, new_lam), None

        (v, w, lam_n), _ = jax.lax.scan(
            iter_body, (v, w, lam_n), None, length=iters
        )

        # net contact force per ENV BODY (normal impulses / h), covering free
        # bodies AND the links/statics they press on (test12_add_joint.py.py:131
        # reads net contact forces on articulated links)
        cf = jnp.zeros((N, B_env, 3), v.dtype)
        f_c = jnp.where(active, lam_n, 0.0)[..., None] * normal * h_inv
        fg_body = np.asarray(self.scene.free_group.body_slot)
        slot_a = jnp.asarray(fg_body[np.asarray(job.body_a)])
        cf = cf.at[:, slot_a].add(f_c)
        slot_b = np.where(
            np.asarray(job.body_b) >= 0,
            fg_body[np.maximum(np.asarray(job.body_b), 0)],
            sh.body_slot[np.maximum(np.asarray(job.shape_b), 0)],
        )
        has_b = jnp.asarray(np.asarray(job.shape_b) >= 0)
        cf = cf.at[:, jnp.asarray(slot_b)].add(
            jnp.where(has_b[None, :, None], -f_c, 0.0)
        )
        return v, w, cf

def self_iters(solver: ContactSolver):
    return solver.scene.sim_params.physx.num_position_iterations


def _qconj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def _scatter_axis(vec, ax, val):
    """Replace component `ax` of vec (..., 3) with val (...,)."""
    onehot = jnp.eye(3, dtype=vec.dtype)[ax]
    return vec * (1.0 - onehot) + onehot * val[..., None]


def _axis_vec(ax, sgn):
    """Unit vector along axis index with sign: ax (N,C), sgn (N,C) -> (N,C,3)."""
    eye = jnp.eye(3, dtype=sgn.dtype)
    return eye[ax] * sgn[..., None]


def _segment_closest(a0, a1, b0, b1):
    """Closest points between segments, batched (..., 3)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.einsum("...k,...k->...", d1, d1)
    e = jnp.einsum("...k,...k->...", d2, d2)
    f = jnp.einsum("...k,...k->...", d2, r)
    c = jnp.einsum("...k,...k->...", d1, r)
    b = jnp.einsum("...k,...k->...", d1, d2)
    denom = jnp.clip(a * e - b * b, 1e-9)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.clip(e, 1e-9), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.clip(a, 1e-9), 0.0, 1.0)
    return a0 + d1 * s[..., None], b0 + d2 * t[..., None]


def _heightfield_sdf(data, hscale, offset, p):
    """Approximate signed distance + normal of points p (N, C, 3) above a
    heightfield (R, C) in meters. Bilinear height, analytic patch gradient."""
    R, C = data.shape
    x_raw = (p[..., 0] - offset[0]) / hscale
    y_raw = (p[..., 1] - offset[1]) / hscale
    x = jnp.clip(x_raw, 0.0, R - 1 - 1e-4)
    y = jnp.clip(y_raw, 0.0, C - 1 - 1e-4)
    # beyond the grid the terrain extends FLAT at the edge height: kill the
    # gradient there or the clamped edge cell's slope leaks outward
    in_x = (x_raw >= 0.0) & (x_raw <= R - 1)
    in_y = (y_raw >= 0.0) & (y_raw <= C - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    h00 = data[x0, y0]
    h10 = data[x0 + 1, y0]
    h01 = data[x0, y0 + 1]
    h11 = data[x0 + 1, y0 + 1]
    h = (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )
    gx = jnp.where(in_x, ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / hscale, 0.0)
    gy = jnp.where(in_y, ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / hscale, 0.0)
    inv_len = 1.0 / jnp.sqrt(1.0 + gx * gx + gy * gy)
    normal = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1) * inv_len[..., None]
    dist = (p[..., 2] - h) * inv_len
    return dist, normal
