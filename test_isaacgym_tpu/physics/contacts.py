"""Contact generation and batched impulse solver (free bodies AND
articulation links, two-way).

TPU-first replacement for the reference's PhysX contact pipeline (SURVEY.md
N2): contact counts are static (fixed candidate slots per shape/pair, masked
at runtime), and the velocity-level solve is a fixed-iteration relaxed Jacobi
scheme — fully batched over (env, contact), no sequential Gauss-Seidel chains,
which is what maps onto the VPU. Iteration count mirrors
SimParams.physx.num_position_iterations + num_velocity_iterations.

Each contact side is one of
  FREE   — free rigid body: responds via (1/m, I^-1) impulses,
  LINK   — articulation link: responds via joint-space impulses
           dqd = A^-1 Jp^T lam, where A = M + h*D is the SAME implicit
           operator the drive solve factorizes (so contact feels the
           drive's implicit damping — stable force-limited grasping,
           /root/reference/examples/franka_cube_ik_osc.py:336-406),
  STATIC — world geometry: kinematic, no response.

Supported narrowphase:
  sphere/capsule/box vs plane & heightfield,
  sphere-sphere, sphere-box, sphere-capsule, capsule-capsule (segment),
  capsule-box (2 endpoint spheres), box-box (vertex-in-box both ways
  + deepest edge-edge pair).

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
from ..math.spatial import skew
from ..utils.linalg import binv

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)

# side types
T_FREE, T_LINK, T_STATIC = 0, 1, 2

# dispatch codes
K_SPH_PLANE, K_CAP_PLANE, K_BOX_PLANE = 0, 1, 2
K_SPH_SPH, K_SPH_BOX, K_SPH_CAP, K_CAP_CAP, K_CAP_BOX, K_BOX_BOX = 3, 4, 5, 6, 7, 8
K_BOX_BOX_EDGE = 9
# convex-hull kinds (mesh shapes with a hull; VHACD pieces are hulls too)
K_HULL_PLANE = 10  # 4 deepest hull verts vs ground/heightfield
K_HULLV_BOX = 11  # 4 deepest hull(a) verts in box(b)
K_BOXV_HULL = 12  # 4 deepest box(b) corners in hull(a)
K_HULLV_HULL = 13  # 4 deepest hull(a) verts in hull(b)
K_HULLV_HULL_R = 14  # 4 deepest hull(b) verts in hull(a)
K_SPH_HULL = 15  # sphere(a) vs hull(b)
K_CAP_HULL = 16  # capsule(a) endpoint spheres vs hull(b)
K_PT_SDF = 17  # surface probes of mesh(a) vs voxel SDF of mesh(b)
#   (SURVEY.md N9 — nut-bolt threading; trilinear gathers, no traversal)

_MANIFOLD = 4  # contact manifold size for hull vertex kinds
_SDF_MANIFOLD = 16  # manifold size for SDF probe kinds (threads engage
#   several turns at once — /root/reference/examples/franka_nut_bolt_ik_osc.py)


class _Side(NamedTuple):
    """Static per-contact side descriptors (numpy, length C)."""

    type: np.ndarray  # T_FREE / T_LINK / T_STATIC
    free: np.ndarray  # free-body index (safe 0)
    group: np.ndarray  # articulation group id (safe 0)
    copy: np.ndarray  # copy within group (safe 0)
    link: np.ndarray  # sim link within group (safe 0)
    body: np.ndarray  # env body slot (always valid; for cf accumulation)


class _Job(NamedTuple):
    """Static candidate-contact table. All arrays (C, ...) numpy."""

    a: _Side
    b: _Side
    kind: np.ndarray
    shape_a: np.ndarray  # env shape index
    shape_b: np.ndarray  # env shape index or -1 (plane/heightfield)
    slot: np.ndarray  # sub-slot (corner index etc.)


class _Entity(NamedTuple):
    """One collidable rigid entity (host-side, used at table-build time)."""

    type: int
    free: int
    group: int
    copy: int
    link: int
    body: int


class ContactSolver:
    def __init__(self, scene: Scene, max_pair_shapes: int = 4096):
        self.scene = scene
        self.enabled = False
        sh = scene.shapes

        # ---- collidable entities ----
        entities = {}  # body slot -> _Entity
        fg = scene.free_group
        if fg is not None:
            for fi, b in enumerate(fg.body_slot):
                entities[int(b)] = _Entity(T_FREE, fi, 0, 0, 0, int(b))
        for g_id, g in enumerate(scene.art_groups):
            for copy, slot_ in enumerate(g.slots):
                for l, bi in enumerate(g.body_of_link):
                    if bi >= 0:
                        b = int(g.body_start[copy] + bi)
                        entities[b] = _Entity(T_LINK, 0, g_id, copy, l, b)
        static_bodies = []
        if scene.static_group is not None:
            for b in scene.static_group.body_slot:
                entities[int(b)] = _Entity(T_STATIC, 0, 0, 0, 0, int(b))
                static_bodies.append(int(b))

        def shapes_of(b):
            return np.nonzero(sh.body_slot == b)[0].tolist()

        dyn_shapes = []  # (shape_idx, _Entity) for FREE + LINK
        stat_shapes = []
        for b, e in entities.items():
            for s in shapes_of(b):
                if e.type == T_STATIC:
                    stat_shapes.append((s, e))
                else:
                    dyn_shapes.append((s, e))

        # --- dense sphere-world fast path (ops/sphere_world.py): large free
        # sphere sets leave the static table entirely — their sphere-sphere
        # (and, with a plane ground, sphere-ground) contacts are solved as
        # dense (F, F) tiles, Pallas-fused on TPU ---
        from ..ops import sphere_world as _sw

        self.sphere_world = _sw.build_spec(scene)
        sw_shapes = (
            set(self.sphere_world.shape_idx.tolist())
            if self.sphere_world is not None
            else set()
        )
        sw_ground = self.sphere_world.has_ground if self.sphere_world else False

        # --- neighbor-list fast path (ops/neighbor_world.py): large MIXED
        # free-body sets (boxes + spheres) that the pure-sphere path can't
        # take — broadphase is a per-substep (F, K) nearest-neighbor list,
        # so the static O(n^2) table never sees these shapes ---
        from ..ops import neighbor_world as _nw

        self.neighbor_world = _nw.build_spec(
            scene, exclude_sphere_pairs=self.sphere_world is not None
        )
        nw_shapes = (
            set(self.neighbor_world.shape_idx.tolist())
            if self.neighbor_world is not None
            else set()
        )
        nw_ground = self.neighbor_world.has_ground if self.neighbor_world else False
        # ground rows a fast path owns (plane ground only)
        fast_ground_shapes = (sw_shapes if sw_ground else set()) | (
            nw_shapes if nw_ground else set()
        )
        # pairwise rows a fast path owns. A pair leaves the static table
        # only when ONE spec owns BOTH shapes: sphere_world admits spheres
        # with local offsets that neighbor_world rejects, so a sw-sphere vs
        # nw-box pair is generated by NEITHER dense path and must stay here
        # (advisor round-3 finding).
        def _fast_pair(si, sj):
            return (si in sw_shapes and sj in sw_shapes) or (
                si in nw_shapes and sj in nw_shapes
            )

        rows: List[tuple] = []  # (ea, eb, kind, sa, sb, slot)
        WORLD = _Entity(T_STATIC, 0, 0, 0, 0, 0)

        def eff_kind(s):
            """Mesh shapes with a convex hull use the hull kinds; hull-less
            meshes (missing blobs) degrade to their bounding box."""
            k = sh.kind[s]
            if k == SHAPE_MESH:
                hid = sh.hull_id[s] if sh.hull_id is not None else -1
                return SHAPE_MESH if hid >= 0 and len(scene.hulls[hid]) >= 4 else SHAPE_BOX
            return k

        # --- plane / heightfield contacts (all dynamic shapes) ---
        if scene.ground is not None or scene.heightfield is not None:
            for s, e in dyn_shapes:
                if s in fast_ground_shapes:
                    continue  # a dense fast path owns this shape's ground
                k = eff_kind(s)
                if k == SHAPE_SPHERE:
                    rows.append((e, WORLD, K_SPH_PLANE, s, -1, 0))
                elif k == SHAPE_CAPSULE:
                    rows.append((e, WORLD, K_CAP_PLANE, s, -1, 0))
                    rows.append((e, WORLD, K_CAP_PLANE, s, -1, 1))
                elif k == SHAPE_MESH:
                    for c in range(_MANIFOLD):
                        rows.append((e, WORLD, K_HULL_PLANE, s, -1, c))
                elif k == SHAPE_BOX:
                    for c in range(8):
                        rows.append((e, WORLD, K_BOX_PLANE, s, -1, c))

        # --- pairwise contacts ---
        def kind_code(ka, kb):
            """List of (code, swap, nslots) narrowphase jobs for a shape pair."""
            M4 = _MANIFOLD
            table = {
                (SHAPE_SPHERE, SHAPE_SPHERE): [(K_SPH_SPH, False, 1)],
                (SHAPE_SPHERE, SHAPE_BOX): [(K_SPH_BOX, False, 1)],
                (SHAPE_BOX, SHAPE_SPHERE): [(K_SPH_BOX, True, 1)],
                (SHAPE_SPHERE, SHAPE_CAPSULE): [(K_SPH_CAP, False, 1)],
                (SHAPE_CAPSULE, SHAPE_SPHERE): [(K_SPH_CAP, True, 1)],
                (SHAPE_CAPSULE, SHAPE_CAPSULE): [(K_CAP_CAP, False, 1)],
                (SHAPE_CAPSULE, SHAPE_BOX): [(K_CAP_BOX, False, 2)],
                (SHAPE_BOX, SHAPE_CAPSULE): [(K_CAP_BOX, True, 2)],
                (SHAPE_BOX, SHAPE_BOX): [
                    (K_BOX_BOX, False, 16),
                    (K_BOX_BOX_EDGE, False, 1),
                ],
                # hull kinds: hull always on side a for *V_BOX/BOXV pairs
                (SHAPE_MESH, SHAPE_BOX): [
                    (K_HULLV_BOX, False, M4),
                    (K_BOXV_HULL, False, M4),
                ],
                (SHAPE_BOX, SHAPE_MESH): [
                    (K_HULLV_BOX, True, M4),
                    (K_BOXV_HULL, True, M4),
                ],
                (SHAPE_MESH, SHAPE_MESH): [
                    (K_HULLV_HULL, False, M4),
                    (K_HULLV_HULL_R, False, M4),
                ],
                (SHAPE_SPHERE, SHAPE_MESH): [(K_SPH_HULL, False, 1)],
                (SHAPE_MESH, SHAPE_SPHERE): [(K_SPH_HULL, True, 1)],
                (SHAPE_CAPSULE, SHAPE_MESH): [(K_CAP_HULL, False, 2)],
                (SHAPE_MESH, SHAPE_CAPSULE): [(K_CAP_HULL, True, 2)],
            }
            return table[(ka, kb)]

        pairs = []
        n_dyn = len(dyn_shapes)
        for i in range(n_dyn):
            si, ei = dyn_shapes[i]
            for j in range(i + 1, n_dyn):
                sj, ej = dyn_shapes[j]
                # two LINK sides of the same group+copy never collide here
                # (self-collision within one articulation is off, like the
                # reference's default create_actor filtering)
                if (
                    ei.type == T_LINK
                    and ej.type == T_LINK
                    and ei.group == ej.group
                    and ei.copy == ej.copy
                ):
                    continue
                if _fast_pair(si, sj):
                    continue  # a single dense fast path owns this pair
                if _pair_allowed(scene, si, sj):
                    pairs.append((si, ei, sj, ej))
            for sj, ej in stat_shapes:
                if _pair_allowed(scene, si, sj):
                    pairs.append((si, ei, sj, ej))
        if len(pairs) > max_pair_shapes:
            raise ValueError(
                f"{len(pairs)} static contact pairs exceeds max_pair_shapes="
                f"{max_pair_shapes}. Large free-body worlds take the dense "
                "fast paths automatically (pure spheres: ops/sphere_world; "
                "mixed sphere/box single-shape actors: ops/neighbor_world) — "
                "this scene's pairs involve articulated links, multi-shape "
                "actors, or meshes at a scale the static table can't hold. "
                "Raise max_pair_shapes explicitly if the memory is acceptable."
            )
        # SDF pair directions, appended in ROW ORDER (each entry = one group
        # of _SDF_MANIFOLD K_PT_SDF rows): (grid index, probe array (P,3))
        sdf_pair_meta: List[tuple] = []

        def _has_sdf(s):
            return (
                sh.sdf_id is not None
                and sh.sdf_id[s] >= 0
                and sh.kind[s] == SHAPE_MESH
            )

        def _probes_of(s):
            if sh.sample_id is not None and sh.sample_id[s] >= 0:
                return scene.samples[sh.sample_id[s]]
            hid = sh.hull_id[s] if sh.hull_id is not None else -1
            return scene.hulls[hid] if hid >= 0 else None

        for si, ei, sj, ej in pairs:
            # mesh pairs where a side carries an SDF use probe-vs-SDF contact
            # instead of the convex-hull kinds (hulls can't see concave
            # features like a nut's thread)
            sdf_dirs = []
            if sh.kind[si] == SHAPE_MESH and _has_sdf(sj) and _probes_of(si) is not None:
                sdf_dirs.append((si, ei, sj, ej))
            if sh.kind[sj] == SHAPE_MESH and _has_sdf(si) and _probes_of(sj) is not None:
                sdf_dirs.append((sj, ej, si, ei))
            if sdf_dirs:
                for sa, ea, sb_, eb in sdf_dirs:
                    sdf_pair_meta.append((int(sh.sdf_id[sb_]), _probes_of(sa)))
                    for c in range(_SDF_MANIFOLD):
                        rows.append((ea, eb, K_PT_SDF, sa, sb_, c))
                continue
            for code, swap, nslots in kind_code(eff_kind(si), eff_kind(sj)):
                ssi, ssj, eei, eej = (sj, si, ej, ei) if swap else (si, sj, ei, ej)
                for c in range(nslots):
                    rows.append((eei, eej, code, ssi, ssj, c))

        self.sdf_data = None
        if not rows:
            self.num_contacts = 0
            self.enabled = (
                self.sphere_world is not None or self.neighbor_world is not None
            )
            self.link_lists = [
                (np.zeros(0, np.int32), np.zeros(0, np.int32))
                for _ in scene.art_groups
            ]
            self.any_link = False
            return
        self.enabled = True

        def side(get):
            return _Side(
                type=np.asarray([get(r).type for r in rows], np.int32),
                free=np.asarray([get(r).free for r in rows], np.int32),
                group=np.asarray([get(r).group for r in rows], np.int32),
                copy=np.asarray([get(r).copy for r in rows], np.int32),
                link=np.asarray([get(r).link for r in rows], np.int32),
                body=np.asarray([get(r).body for r in rows], np.int32),
            )

        self.job = _Job(
            a=side(lambda r: r[0]),
            b=side(lambda r: r[1]),
            kind=np.asarray([r[2] for r in rows], np.int32),
            shape_a=np.asarray([r[3] for r in rows], np.int32),
            shape_b=np.asarray([r[4] for r in rows], np.int32),
            slot=np.asarray([r[5] for r in rows], np.int32),
        )
        self.num_contacts = len(rows)

        # per-group static contact index lists (which contacts touch links
        # of group g on side a / side b)
        self.link_lists = []
        for g_id in range(len(scene.art_groups)):
            ia = np.nonzero((self.job.a.type == T_LINK) & (self.job.a.group == g_id))[0]
            ib = np.nonzero((self.job.b.type == T_LINK) & (self.job.b.group == g_id))[0]
            self.link_lists.append((ia.astype(np.int32), ib.astype(np.int32)))
        self.any_link = any(len(ia) + len(ib) for ia, ib in self.link_lists)

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

        # --- convex hull tables (SURVEY.md N8: VHACD hulls are consumed
        # here — each decomposition piece is one hull shape) ---
        self.hull_verts = None
        if scene.hulls:
            Vmax = max(len(h) for h in scene.hulls)
            verts, planes = [], []
            fmax = 4
            plane_list = []
            for hv in scene.hulls:
                eq = _hull_planes(hv)
                plane_list.append(eq)
                fmax = max(fmax, len(eq))
            for hv, eq in zip(scene.hulls, plane_list):
                c = hv.mean(0)
                pad = np.tile(c, (Vmax - len(hv), 1))
                verts.append(np.concatenate([hv, pad], 0))
                # pad planes with a never-binding face
                peq = np.tile(np.array([[0, 0, 1, -1e9]], np.float32),
                              (fmax - len(eq), 1))
                planes.append(np.concatenate([eq, peq], 0))
            self.hull_verts = jnp.asarray(np.stack(verts), jnp.float32)
            self.hull_planes = jnp.asarray(np.stack(planes), jnp.float32)

        # --- SDF tables (SURVEY.md N9): one stacked (K, R, R, R) grid array;
        # per-pair probe sets padded to a common length ---
        if sdf_pair_meta:
            grids = scene.sdfs
            R = grids[0].data.shape[0]
            assert all(
                g.data.shape == (R, R, R) for g in grids
            ), "all SDF grids in a scene must share one resolution"
            self.sdf_data = jnp.asarray(
                np.stack([g.data for g in grids]), jnp.float32
            )
            self.sdf_origin = np.stack([g.origin for g in grids]).astype(np.float32)
            self.sdf_spacing = np.stack([g.spacing for g in grids]).astype(
                np.float32
            )
            self.sdf_pair_grid = np.asarray(
                [m[0] for m in sdf_pair_meta], np.int32
            )
            pmax = max(len(m[1]) for m in sdf_pair_meta)
            probes = []
            for _, pr in sdf_pair_meta:
                pr = np.asarray(pr, np.float32)
                if len(pr) < pmax:
                    # pad with a FAR sentinel (outside any grid -> phi >> 0,
                    # never a contact). Tiling a real probe would let top_k
                    # fill several manifold slots with one duplicated point,
                    # concentrating duplicate impulses there (ADVICE r2).
                    far = np.full((pmax - len(pr), 3), 1e3, np.float32)
                    pr = np.concatenate([pr, far], 0)
                probes.append(pr)
            self.sdf_probes = jnp.asarray(np.stack(probes))

    # ------------------------------------------------------------------
    def _solve_sphere_world(
        self, body_pos, free_v, free_w, free_m, free_I_w, params, h, zero_cf
    ):
        """Dense all-pairs solve for the large free-sphere set (see
        ops/sphere_world.py). Runs before the static-table solve; the two
        share velocities sequentially."""
        from ..ops import sphere_world as _sw

        spec = self.sphere_world
        fidx = jnp.asarray(spec.free_idx)
        sidx = jnp.asarray(spec.shape_idx)
        bidx = jnp.asarray(spec.body_slot)
        pos = body_pos[:, bidx]
        vel = free_v[:, fidx]
        omega = free_w[:, fidx]
        radius = params.shape_size[:, sidx, 0]
        inv_m = 1.0 / free_m[:, fidx]
        # spheres: world inertia is isotropic; 3/trace is exact there
        tr = (
            free_I_w[:, fidx, 0, 0]
            + free_I_w[:, fidx, 1, 1]
            + free_I_w[:, fidx, 2, 2]
        )
        inv_i = 3.0 / jnp.clip(tr, 1e-9)
        mu = params.shape_friction[:, sidx]
        rest = params.shape_restitution[:, sidx]
        px = self.scene.sim_params.physx
        iters = max(6, 2 * px.num_position_iterations) + px.num_velocity_iterations
        slop = px.rest_offset + px.contact_slop
        v1, w1, cf_s = _sw.solve(
            spec, pos, vel, omega, radius, inv_m, inv_i, mu, rest,
            h, iters, px.contact_offset, slop, px.bounce_threshold_velocity,
        )
        free_v = free_v.at[:, fidx].set(v1)
        free_w = free_w.at[:, fidx].set(w1)
        cf = zero_cf.at[:, bidx].add(cf_s)
        return free_v, free_w, cf

    # ------------------------------------------------------------------
    def _solve_neighbor_world(
        self, body_pos, body_quat, free_v, free_w, free_m, free_I_w,
        params, h, cf_base,
    ):
        """Neighbor-list solve for the large mixed free-body set (see
        ops/neighbor_world.py). Runs before the static-table solve."""
        from ..ops import neighbor_world as _nw

        spec = self.neighbor_world
        fidx = jnp.asarray(spec.free_idx)
        sidx = jnp.asarray(spec.shape_idx)
        bidx = jnp.asarray(spec.body_slot)
        px = self.scene.sim_params.physx
        iters = max(6, 2 * px.num_position_iterations) + px.num_velocity_iterations
        slop = px.rest_offset + px.contact_slop
        inv_I = binv(free_I_w[:, fidx])
        v1, w1, cf_s = _nw.solve(
            spec,
            body_pos[:, bidx],
            body_quat[:, bidx],
            free_v[:, fidx],
            free_w[:, fidx],
            params.shape_size[:, sidx],
            1.0 / free_m[:, fidx],
            inv_I,
            params.shape_friction[:, sidx],
            params.shape_restitution[:, sidx],
            h,
            iters,
            px.contact_offset,
            slop,
            px.bounce_threshold_velocity,
            max_depen=px.max_depenetration_velocity,
        )
        free_v = free_v.at[:, fidx].set(v1)
        free_w = free_w.at[:, fidx].set(w1)
        cf = cf_base.at[:, bidx].add(cf_s)
        return free_v, free_w, cf

    # ------------------------------------------------------------------
    def narrowphase(self, body_pos, body_quat, params):
        """(point, normal(b->a), depth, active) for every candidate contact,
        given CURRENT body poses (N, B, 3/4).

        Each contact KIND computes only over its own STATIC row subset and
        scatters results into the (N, C) tables — a scene with no capsules
        pays nothing for the capsule kinds, and the box-box SAT runs over
        its 17 rows instead of all C (the all-rows form was ~half the
        franka_cube narrowphase cost)."""
        job = self.job
        sh = self.scene.shapes
        N = body_pos.shape[0]
        C = self.num_contacts
        kind = job.kind
        slot = job.slot

        def shape_pose(s_arr):
            s_np = np.asarray(s_arr)
            owner = sh.body_slot[s_np]
            bp = body_pos[:, owner]
            bq = body_quat[:, owner]
            spos = params.shape_pos[:, jnp.asarray(s_np)]  # (N, C, 3)
            squat = jnp.asarray(sh.quat[s_np], jnp.float32)
            return bp + quat_rotate(bq, spos), quat_mul(bq, squat)

        pa, qa = shape_pose(job.shape_a)
        sb_safe = np.maximum(job.shape_b, 0)
        pb, qb = shape_pose(sb_safe)

        size_a = params.shape_size[:, jnp.asarray(job.shape_a)]
        size_b = params.shape_size[:, jnp.asarray(sb_safe)]

        point = jnp.zeros((N, C, 3), body_pos.dtype)
        normal = jnp.zeros((N, C, 3), body_pos.dtype)
        depth = jnp.full((N, C), -1.0, body_pos.dtype)

        pn = jnp.asarray(self.plane_n)
        pd = jnp.asarray(self.plane_d)

        if self.hf_data is not None:
            def ground_sdf(p):
                return _heightfield_sdf(self.hf_data, self.hf_scale, self.hf_off, p)
        else:
            def ground_sdf(p):
                d = jnp.einsum("...k,k->...", p, pn) - pd
                return d, jnp.broadcast_to(pn, p.shape)

        def rows(*codes):
            m = np.isin(kind, codes)
            return np.nonzero(m)[0]

        # narrowphase results accumulate host-side and land in the (N, C)
        # tables via ONE scatter per array — per-kind scatters made XLA:TPU
        # compile time blow up (dozens of scatter ops over the same buffers)
        acc = []

        def put(i, pt, n, dep):
            acc.append((np.asarray(i), pt, n, dep))

        # capsule local z (shared by the capsule kinds)
        def cap_axis(q_, i):
            return quat_rotate(q_[:, i], jnp.array([0.0, 0, 1.0]))

        # ---- sphere-plane/terrain ----
        i = rows(K_SPH_PLANE)
        if len(i):
            r = size_a[:, i, 0]
            d, n = ground_sdf(pa[:, i])
            put(i, pa[:, i] - n * r[..., None], n, r - d)

        # ---- capsule-plane: endpoint spheres along local z ----
        i = rows(K_CAP_PLANE)
        if len(i):
            r = size_a[:, i, 0]
            hl = size_a[:, i, 1]
            end_sign = jnp.asarray(
                np.where(slot[i] == 0, 1.0, -1.0), jnp.float32
            )
            endp = pa[:, i] + cap_axis(qa, i) * (hl * end_sign)[..., None]
            d, n = ground_sdf(endp)
            put(i, endp - n * r[..., None], n, r - d)

        # ---- box-plane: corners ----
        i = rows(K_BOX_PLANE)
        if len(i):
            corners = jnp.asarray(_BOX_CORNERS)[slot[i]]  # (P, 3)
            cw = pa[:, i] + quat_rotate(qa[:, i], corners * size_a[:, i])
            d, n = ground_sdf(cw)
            put(i, cw, n, -d)

        # ---- sphere-sphere ----
        i = rows(K_SPH_SPH)
        if len(i):
            r_a, r_b = size_a[:, i, 0], size_b[:, i, 0]
            dvec = pa[:, i] - pb[:, i]
            dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
            n = dvec / dist[..., None]
            put(i, pb[:, i] + n * r_b[..., None], n, (r_a + r_b) - dist)

        def point_vs_box(pt_w, i, r):
            """Sphere(-like) point vs box(b) rows i: (pt, n, dep)."""
            szb = size_b[:, i]
            rel = quat_rotate(_qconj(qb[:, i]), pt_w - pb[:, i])
            clamped = jnp.clip(rel, -szb, szb)
            inside = jnp.all(jnp.abs(rel) <= szb, axis=-1)
            pen_ax = szb - jnp.abs(rel)
            ax = jnp.argmin(pen_ax, axis=-1)
            sgn = jnp.sign(jnp.take_along_axis(rel, ax[..., None], -1))
            surf = jnp.where(
                inside[..., None],
                _scatter_axis(
                    clamped, ax,
                    sgn[..., 0] * jnp.take_along_axis(szb, ax[..., None], -1)[..., 0],
                ),
                clamped,
            )
            cp_w = pb[:, i] + quat_rotate(qb[:, i], surf)
            dvec = pt_w - cp_w
            dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
            n = jnp.where(
                inside[..., None],
                quat_rotate(qb[:, i], _axis_vec(ax, sgn[..., 0])),
                dvec / dist[..., None],
            )
            dep = jnp.where(inside, r + dist, r - dist)
            return cp_w, n, dep

        # ---- sphere-box ----
        i = rows(K_SPH_BOX)
        if len(i):
            pt, n, dep = point_vs_box(pa[:, i], i, size_a[:, i, 0])
            put(i, pt, n, dep)

        # ---- sphere-capsule: closest point on capsule-b segment ----
        i = rows(K_SPH_CAP)
        if len(i):
            r_a = size_a[:, i, 0]
            r_b = size_b[:, i, 0]
            hl_b = size_b[:, i, 1]
            zb = cap_axis(qb, i)
            t = jnp.clip(
                jnp.einsum("npk,npk->np", pa[:, i] - pb[:, i], zb), -hl_b, hl_b
            )
            seg = pb[:, i] + zb * t[..., None]
            dvec = pa[:, i] - seg
            dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
            n = dvec / dist[..., None]
            put(i, seg + n * r_b[..., None], n, (r_a + r_b) - dist)

        # ---- capsule-capsule: segment-segment closest points ----
        i = rows(K_CAP_CAP)
        if len(i):
            r_a, hl_a = size_a[:, i, 0], size_a[:, i, 1]
            r_b, hl_b = size_b[:, i, 0], size_b[:, i, 1]
            za, zb = cap_axis(qa, i), cap_axis(qb, i)
            a0 = pa[:, i] - za * hl_a[..., None]
            a1 = pa[:, i] + za * hl_a[..., None]
            b0 = pb[:, i] - zb * hl_b[..., None]
            b1 = pb[:, i] + zb * hl_b[..., None]
            pA, pB = _segment_closest(a0, a1, b0, b1)
            dvec = pA - pB
            dist = jnp.linalg.norm(dvec, axis=-1).clip(1e-9)
            n = dvec / dist[..., None]
            put(i, pB + n * r_b[..., None], n, (r_a + r_b) - dist)

        # ---- capsule-box: endpoint spheres of capsule a vs box b ----
        i = rows(K_CAP_BOX)
        if len(i):
            r_a, hl_a = size_a[:, i, 0], size_a[:, i, 1]
            end_sign = jnp.asarray(
                np.where(slot[i] == 0, 1.0, -1.0), jnp.float32
            )
            cap_pt = pa[:, i] + cap_axis(qa, i) * (hl_a * end_sign)[..., None]
            szb = size_b[:, i]
            rel = quat_rotate(_qconj(qb[:, i]), cap_pt - pb[:, i])
            cl = jnp.clip(rel, -szb, szb)
            cp = pb[:, i] + quat_rotate(qb[:, i], cl)
            dv = cap_pt - cp
            dist = jnp.linalg.norm(dv, axis=-1).clip(1e-9)
            put(i, cp, dv / dist[..., None], r_a - dist)

        # ---- box-box: PAIR-LEVEL face SAT manifold (16 vertex rows) plus
        # the deepest edge-edge pair (1 row). Per-vertex min-pen axes break
        # exactly-aligned stacks (large_mass_ratio.py). ----
        i = rows(K_BOX_BOX)
        if len(i):
            from ..math.quat import quat_to_matrix as _q2m

            pa_i, qa_i, pb_i, qb_i = pa[:, i], qa[:, i], pb[:, i], qb[:, i]
            sza, szb = size_a[:, i], size_b[:, i]
            Ra = _q2m(qa_i)  # (N, P, 3, 3) columns = axes
            Rb = _q2m(qb_i)
            d_ab = pb_i - pa_i
            big = jnp.asarray(1e9, pa.dtype)

            def face_sat(R_ref):
                bs = jnp.full(pa_i.shape[:-1], -big)
                bn = jnp.zeros_like(pa_i)
                bk = jnp.zeros(pa_i.shape[:-1], jnp.int32)
                for k in range(3):
                    ax = R_ref[..., :, k]
                    proj_a = sum(
                        jnp.abs(jnp.einsum("...k,...k->...", ax, Ra[..., :, q]))
                        * sza[..., q]
                        for q in range(3)
                    )
                    proj_b = sum(
                        jnp.abs(jnp.einsum("...k,...k->...", ax, Rb[..., :, q]))
                        * szb[..., q]
                        for q in range(3)
                    )
                    dist = jnp.einsum("...k,...k->...", ax, d_ab)
                    sep = jnp.abs(dist) - (proj_a + proj_b)
                    better = sep > bs
                    bs = jnp.where(better, sep, bs)
                    n_dir = ax * jnp.where(dist > 0, -1.0, 1.0)[..., None]
                    bn = jnp.where(better[..., None], n_dir, bn)
                    bk = jnp.where(better, k, bk)
                return bs, bn, bk

            sep_fa, n_fa, k_fa = face_sat(Ra)
            sep_fb, n_fb, k_fb = face_sat(Rb)
            face_best = jnp.maximum(sep_fa, sep_fb)

            bb_sign = slot[i] < 8  # slots 0-7: verts of a; 8-15: verts of b
            corn_idx = np.where(bb_sign, slot[i], slot[i] - 8)
            corn = jnp.asarray(_BOX_CORNERS)[corn_idx]
            va_w = pa_i + quat_rotate(qa_i, corn * sza)
            vb_w = pb_i + quat_rotate(qb_i, corn * szb)
            is_av = jnp.asarray(bb_sign)[None, :]
            vtx_w = jnp.where(is_av[..., None], va_w, vb_w)
            ref_p = jnp.where(is_av[..., None], pb_i, pa_i)
            ref_q = jnp.where(is_av[..., None], qb_i, qa_i)
            ref_size = jnp.where(is_av[..., None], szb, sza)
            ref_k = jnp.where(is_av, k_fb, k_fa)
            ref_n = jnp.where(is_av[..., None], n_fb, n_fa)
            ref_sep = jnp.where(is_av, sep_fb, sep_fa)
            incident = ref_sep >= face_best - 1e-5
            rel_bb = quat_rotate(_qconj(ref_q), vtx_w - ref_p)
            pen_ax_bb = ref_size - jnp.abs(rel_bb)  # (N, P, 3)
            dep_face = jnp.take_along_axis(pen_ax_bb, ref_k[..., None], -1)[..., 0]
            off = self.scene.sim_params.physx.contact_offset
            n_within = jnp.sum((pen_ax_bb > -off).astype(jnp.int32), axis=-1)
            lat_ok = (n_within - (dep_face > -off).astype(jnp.int32)) >= 2
            dep_bb = jnp.where(incident & lat_ok, dep_face, -1.0)
            put(i, vtx_w, ref_n, dep_bb)

        i = rows(K_BOX_BOX_EDGE)
        if len(i):
            pt_ee, n_ee, dep_ee = _box_box_edge(
                pa[:, i], qa[:, i], size_a[:, i], pb[:, i], qb[:, i], size_b[:, i]
            )
            put(i, pt_ee, n_ee, dep_ee)

        # capsule z-axes for the hull path (subset-computed there)
        zdir = None

        if self.hull_verts is not None:
            hull_cap = rows(K_CAP_HULL)
            if len(hull_cap):
                zdir = jnp.zeros((N, C, 3), body_pos.dtype)
                zdir = zdir.at[:, hull_cap].set(cap_axis(qa, hull_cap))
            self._hull_narrowphase(
                put, pa, qa, pb, qb, size_a, size_b, zdir, ground_sdf, params,
            )

        if self.sdf_data is not None:
            self._sdf_narrowphase(put, pa, qa, pb, qb, size_a, size_b)

        if acc:
            idx = np.concatenate([a[0] for a in acc])
            if len(idx) == C and len(np.unique(idx)) == C:
                # every row produced exactly once: assemble with ONE static
                # inverse-permutation gather (scatters are XLA:TPU compile
                # poison at this op count)
                inv = np.empty(C, np.int64)
                inv[idx] = np.arange(C)
                point = jnp.concatenate([a[1] for a in acc], 1)[:, inv]
                normal = jnp.concatenate([a[2] for a in acc], 1)[:, inv]
                depth = jnp.concatenate([a[3] for a in acc], 1)[:, inv]
            else:  # partial coverage (defensive)
                point = point.at[:, idx].set(jnp.concatenate([a[1] for a in acc], 1))
                normal = normal.at[:, idx].set(jnp.concatenate([a[2] for a in acc], 1))
                depth = depth.at[:, idx].set(jnp.concatenate([a[3] for a in acc], 1))

        active = depth > -self.scene.sim_params.physx.contact_offset
        return point, normal, depth, active

    # ------------------------------------------------------------------
    def _sdf_narrowphase(
        self, put, pa, qa, pb, qb, size_a, size_b
    ):
        """Probe-vs-SDF contacts (SURVEY.md N9, nut-bolt threading —
        /root/reference/examples/franka_nut_bolt_ik_osc.py:215-236).

        Each K_PT_SDF group is _SDF_MANIFOLD rows for one (probing mesh,
        SDF mesh) direction: all P probe points of side a are pushed through
        side b's voxel SDF (pure gathers + trilinear interpolation, fused by
        XLA into the narrowphase), and the deepest _SDF_MANIFOLD land in the
        rows."""
        job = self.job
        sh = self.scene.shapes
        i0 = np.nonzero((job.kind == K_PT_SDF) & (job.slot == 0))[0]
        if not len(i0):
            return
        M = _SDF_MANIFOLD
        sa = np.asarray(job.shape_a)[i0]
        sb = np.asarray(job.shape_b)[i0]
        base_a = np.maximum(sh.size[sa].astype(np.float32), 1e-6)
        base_b = np.maximum(sh.size[sb].astype(np.float32), 1e-6)
        sig_a = size_a[:, i0] / base_a  # (N, Q, 3) runtime scale
        sig_b = size_b[:, i0] / base_b
        w = pa[:, i0, None] + quat_rotate(
            qa[:, i0, None], self.sdf_probes[None] * sig_a[:, :, None]
        )  # (N, Q, P, 3)
        rel = quat_rotate(
            _qconj(qb[:, i0, None]), w - pb[:, i0, None]
        ) / jnp.clip(sig_b[:, :, None], 1e-6)
        phi, n_loc = _sdf_trilinear(
            self.sdf_data,
            self.sdf_origin,
            self.sdf_spacing,
            self.sdf_pair_grid,
            rel,
        )
        phi = phi * jnp.mean(sig_b, -1)[..., None]  # uniform-scale approx
        n_w = quat_rotate(qb[:, i0, None], n_loc)
        vals, ti = jax.lax.top_k(-phi, M)  # deepest probes
        gi = jnp.broadcast_to(ti[..., None], ti.shape + (3,))
        pts = jnp.take_along_axis(w, gi, -2)
        nrm = jnp.take_along_axis(n_w, gi, -2)
        N, Q = vals.shape[:2]
        idx = np.stack([i0 + s for s in range(M)], 1).ravel()
        # pts/nrm/vals are (N, Q, M, .): reshape is q-major, matching idx
        put(
            idx,
            pts.reshape(N, Q * M, 3),
            nrm.reshape(N, Q * M, 3),
            vals.reshape(N, Q * M),
        )

    # ------------------------------------------------------------------
    def _hull_narrowphase(
        self, put, pa, qa, pb, qb, size_a, size_b, zdir,
        ground_sdf, params,
    ):
        """Convex-hull contacts: vertex-manifold narrowphase for mesh shapes.

        Each hull job group is _MANIFOLD consecutive rows sharing one shape
        pair; we compute all candidate vertices once per pair, take the
        _MANIFOLD deepest (lax.top_k), and scatter them into the rows.
        Subset gathers use static numpy indices, so only hull rows pay the
        (pairs x verts) cost.

        TPU layout note: all vertex-batch math runs on COMPONENT arrays
        (three (N, P, V) floats) instead of (N, P, V, 3) vectors — the
        (V, 3) trailing dims of the vector form tile-pad to (V, 128), a
        42x memory blowup that made this narrowphase the franka_cube
        bottleneck (~25 ms/substep at 256 envs)."""
        job = self.job
        sh = self.scene.shapes
        kind = job.kind
        slot = job.slot
        M4 = _MANIFOLD

        def rows0(code):
            return np.nonzero((kind == code) & (slot == 0))[0]

        def comps(arr, i0):
            """(N, C, k) -> tuple of k (N, P, 1) component arrays."""
            sub = arr[:, i0]
            return tuple(sub[..., k, None] for k in range(sub.shape[-1]))

        def qrot_c(q, v):
            qx, qy, qz, qw = q
            vx, vy, vz = v
            tx = 2 * (qy * vz - qz * vy)
            ty = 2 * (qz * vx - qx * vz)
            tz = 2 * (qx * vy - qy * vx)
            return (
                vx + qw * tx + (qy * tz - qz * ty),
                vy + qw * ty + (qz * tx - qx * tz),
                vz + qw * tz + (qx * ty - qy * tx),
            )

        def qconj_c(q):
            return (-q[0], -q[1], -q[2], q[3])

        def scale_of(i0, shape_arr, size_rt):
            s_np = np.asarray(shape_arr)[i0]
            base = np.maximum(sh.size[s_np].astype(np.float32), 1e-6)
            return size_rt[:, i0] / base  # (N, P, 3)

        def hull_world_verts(i0, shape_arr, p_, q_, size_rt):
            """World hull-vert components: three (N, P, V) arrays."""
            hid = sh.hull_id[np.asarray(shape_arr)[i0]]
            hv = self.hull_verts[hid]  # (P, V, 3) static
            sig = scale_of(i0, shape_arr, size_rt)  # (N, P, 3)
            v_loc = tuple(
                hv[..., k][None] * sig[..., k, None] for k in range(3)
            )
            q_c = comps(q_, i0)
            p_c = comps(p_, i0)
            w = qrot_c(q_c, v_loc)
            return tuple(w[k] + p_c[k] for k in range(3))

        def point_in_hull(i0, shape_arr, p_, q_, size_rt, x_c):
            """Signed distance + outward world normal components of points
            vs a hull. x_c: component tuple of (N, P, K) arrays."""
            hid = sh.hull_id[np.asarray(shape_arr)[i0]]
            planes = self.hull_planes[hid]  # (P, F, 4)
            sig = scale_of(i0, shape_arr, size_rt)  # (N, P, 3)
            sig_u = jnp.mean(sig, axis=-1)  # uniform-scale approx
            q_c = comps(q_, i0)
            p_c = comps(p_, i0)
            d = tuple(x_c[k] - p_c[k] for k in range(3))
            rel = qrot_c(qconj_c(q_c), d)
            rel = tuple(
                rel[k] / jnp.clip(sig[..., k, None], 1e-6) for k in range(3)
            )
            pn = tuple(planes[..., k][None, :, None, :] for k in range(4))
            s_f = (
                rel[0][..., None] * pn[0]
                + rel[1][..., None] * pn[1]
                + rel[2][..., None] * pn[2]
                + pn[3]
            )  # (N, P, K, F)
            sd = jnp.max(s_f, axis=-1) * sig_u[..., None]
            fidx = jnp.argmax(s_f, axis=-1)  # (N, P, K)
            # per-component batched gather of the argmax face normal (the
            # vector-form broadcast+take_along_axis was the round-2 47 GB
            # OOM; even the (N,P,K,4) gather pads 4 -> 128)
            pidx = jnp.arange(planes.shape[0])[None, :, None]
            n_loc = tuple(planes[..., k][pidx, fidx] for k in range(3))
            return sd, qrot_c(q_c, n_loc)

        def top4(i0, pts_c, nrm_c, deps):
            """Emit the 4 deepest candidates into rows i0..i0+3."""
            N = deps.shape[0]
            P = len(i0)
            vals, ti = jax.lax.top_k(deps, M4)  # (N, P, 4)
            p4 = [jnp.take_along_axis(pts_c[k], ti, axis=-1) for k in range(3)]
            n4 = [jnp.take_along_axis(nrm_c[k], ti, axis=-1) for k in range(3)]
            pts4 = jnp.stack(p4, -1)  # (N, P, 4, 3) — tiny
            nrm4 = jnp.stack(n4, -1)
            idx = np.stack([i0 + s for s in range(M4)], 1).ravel()
            put(
                idx,
                pts4.reshape(N, P * M4, 3),
                nrm4.reshape(N, P * M4, 3),
                vals.reshape(N, P * M4),
            )

        def neg_c(v):
            return (-v[0], -v[1], -v[2])

        def ground_sdf_c(w_c):
            """Component ground query; heightfields pack to vectors (rare
            with hulls, and the HF interpolation is gather-bound anyway)."""
            if self.hf_data is not None:
                w = jnp.stack(w_c, -1)
                d, n = ground_sdf(w)
                return d, tuple(n[..., k] for k in range(3))
            pn = jnp.asarray(self.plane_n)
            pd = jnp.asarray(self.plane_d)
            d = w_c[0] * pn[0] + w_c[1] * pn[1] + w_c[2] * pn[2] - pd
            n = tuple(jnp.broadcast_to(pn[k], d.shape) for k in range(3))
            return d, n

        # hull verts vs ground plane / heightfield
        i0 = rows0(K_HULL_PLANE)
        if len(i0):
            w = hull_world_verts(i0, job.shape_a, pa, qa, size_a)
            d, n = ground_sdf_c(w)
            top4(i0, w, n, -d)

        # hull(a) verts in box(b): sphere-box with r=0 (speculative outside)
        i0 = rows0(K_HULLV_BOX)
        if len(i0):
            w = hull_world_verts(i0, job.shape_a, pa, qa, size_a)
            qb_c = comps(qb, i0)
            pb_c = comps(pb, i0)
            szb = comps(size_b, i0)  # three (N, P, 1)
            rel = qrot_c(qconj_c(qb_c), tuple(w[k] - pb_c[k] for k in range(3)))
            cl = tuple(jnp.clip(rel[k], -szb[k], szb[k]) for k in range(3))
            pen = tuple(szb[k] - jnp.abs(rel[k]) for k in range(3))
            inside = (pen[0] >= 0) & (pen[1] >= 0) & (pen[2] >= 0)
            m = jnp.minimum(pen[0], jnp.minimum(pen[1], pen[2]))
            is_x = pen[0] <= m
            is_y = (~is_x) & (pen[1] <= m)
            is_z = (~is_x) & (~is_y)
            sel = (is_x, is_y, is_z)
            sgn = tuple(jnp.sign(rel[k]) for k in range(3))
            surf = tuple(
                jnp.where(inside & sel[k], sgn[k] * szb[k], cl[k])
                for k in range(3)
            )
            cp = qrot_c(qb_c, surf)
            cp = tuple(cp[k] + pb_c[k] for k in range(3))
            dv = tuple(w[k] - cp[k] for k in range(3))
            dist = jnp.sqrt(dv[0] ** 2 + dv[1] ** 2 + dv[2] ** 2).clip(1e-9)
            ax_vec = tuple(jnp.where(sel[k], sgn[k], 0.0) for k in range(3))
            n_in = qrot_c(qb_c, ax_vec)
            n = tuple(
                jnp.where(inside, n_in[k], dv[k] / dist) for k in range(3)
            )
            dep = jnp.where(inside, dist, -dist)
            top4(i0, w, n, dep)

        # box(b) corners in hull(a)
        i0 = rows0(K_BOXV_HULL)
        if len(i0):
            corn = _BOX_CORNERS  # (8, 3) numpy
            qb_c = comps(qb, i0)
            pb_c = comps(pb, i0)
            szb = comps(size_b, i0)
            c_loc = tuple(
                jnp.asarray(corn[:, k])[None, None] * szb[k] for k in range(3)
            )
            cw = qrot_c(qb_c, c_loc)
            cw = tuple(cw[k] + pb_c[k] for k in range(3))  # (N, P, 8)
            sd, n_out = point_in_hull(i0, job.shape_a, pa, qa, size_a, cw)
            top4(i0, cw, neg_c(n_out), -sd)

        # hull(a) verts in hull(b) and the reverse
        i0 = rows0(K_HULLV_HULL)
        if len(i0):
            w = hull_world_verts(i0, job.shape_a, pa, qa, size_a)
            sd, n_out = point_in_hull(i0, job.shape_b, pb, qb, size_b, w)
            top4(i0, w, n_out, -sd)
        i0 = rows0(K_HULLV_HULL_R)
        if len(i0):
            w = hull_world_verts(i0, job.shape_b, pb, qb, size_b)
            sd, n_out = point_in_hull(i0, job.shape_a, pa, qa, size_a, w)
            top4(i0, w, neg_c(n_out), -sd)

        # sphere(a) vs hull(b)
        i0 = rows0(K_SPH_HULL)
        if len(i0):
            c = tuple(pa[:, i0, k, None] for k in range(3))  # (N, P, 1)
            sd, n_out = point_in_hull(i0, job.shape_b, pb, qb, size_b, c)
            r = size_a[:, i0, 0]
            n1 = jnp.stack([n_out[k][:, :, 0] for k in range(3)], -1)
            pt = jnp.stack([c[k][:, :, 0] for k in range(3)], -1) - n1 * r[..., None]
            put(i0, pt, n1, r - sd[:, :, 0])

        # capsule(a) endpoint spheres vs hull(b)
        for s in range(2):
            i0 = rows0(K_CAP_HULL)
            i0 = i0 + s if len(i0) else i0
            if len(i0):
                sign = 1.0 if s == 0 else -1.0
                hl = size_a[:, i0, 1]
                r = size_a[:, i0, 0]
                endp = pa[:, i0] + zdir[:, i0] * (hl * sign)[..., None]
                e_c = tuple(endp[..., k, None] for k in range(3))
                sd, n_out = point_in_hull(
                    i0, job.shape_b, pb, qb, size_b, e_c
                )
                n1 = jnp.stack([n_out[k][:, :, 0] for k in range(3)], -1)
                put(i0, endp - n1 * r[..., None], n1, r - sd[:, :, 0])

    # ------------------------------------------------------------------
    def solve(
        self,
        body_pos,
        body_quat,
        body_vel_kin,
        free_v,
        free_w,
        free_m,
        free_I_w,
        free_com_w,
        art_qd,
        art_jac,
        art_Ainv,
        params,
        h,
        warm=None,
    ):
        """Velocity-level contact solve over free bodies and articulations.

        body_pos/quat: CURRENT poses of every env body (N, B, 3/4).
        body_vel_kin: (linvel, angvel) (N, B, 3) — surface velocity of
            kinematic (STATIC) colliders.
        free_*: free-body batch arrays (may be None when no free bodies).
        art_qd: list per group of (N, K, nv) generalized velocities.
        art_jac: list per group of (N, K, Ls, 6, nv) link jacobians (rows
            [lin; ang] of link origins) or None if group has no contacts.
        art_Ainv: list per group of (N, K, nv, nv) inverse implicit operators.
        warm: optional (lam_n (N, C), lam_t (N, C, 3)) impulses from the
        previous step, applied up-front and refined (warm starting).
        Returns (free_v, free_w, art_qd, contact_force (N, B, 3),
        (lam_n, lam_t)).
        """
        N = body_pos.shape[0]
        B_env = self.scene.num_bodies_per_env
        zero_cf = jnp.zeros((N, B_env, 3), body_pos.dtype)
        if not self.enabled:
            return free_v, free_w, art_qd, zero_cf, None

        cf_base = zero_cf
        if self.sphere_world is not None and free_m is not None:
            free_v, free_w, cf_base = self._solve_sphere_world(
                body_pos, free_v, free_w, free_m, free_I_w, params, h, zero_cf
            )
        if self.neighbor_world is not None and free_m is not None:
            free_v, free_w, cf_base = self._solve_neighbor_world(
                body_pos, body_quat, free_v, free_w, free_m, free_I_w,
                params, h, cf_base,
            )
        if self.num_contacts == 0:
            return free_v, free_w, list(art_qd), cf_base, None

        job = self.job
        C = self.num_contacts
        if free_m is None:
            # dummy arrays keep the scan carry well-typed; never read back
            free_v = jnp.zeros((N, 1, 3), body_pos.dtype)
            free_w = jnp.zeros((N, 1, 3), body_pos.dtype)
        point, normal, depth, active = self.narrowphase(body_pos, body_quat, params)

        # --- material params per contact ---
        sb_safe = np.maximum(job.shape_b, 0)
        fr_a = params.shape_friction[:, job.shape_a]
        fr_b = jnp.where(
            jnp.asarray(job.shape_b >= 0)[None],
            params.shape_friction[:, sb_safe],
            jnp.asarray(self.plane_friction),
        )
        # PhysX default material combine mode is AVERAGE — match it
        mu = 0.5 * (fr_a + fr_b)
        re_a = params.shape_restitution[:, job.shape_a]
        re_b = jnp.where(
            jnp.asarray(job.shape_b >= 0)[None],
            params.shape_restitution[:, sb_safe],
            jnp.asarray(self.plane_restitution),
        )
        rest = 0.5 * (re_a + re_b)

        # --- mass-splitting Jacobi scale: each responding body's inverse
        # mass is divided by its ACTIVE contact count, which makes the
        # fully-parallel Jacobi iteration convergent no matter how many
        # contacts share a body (a cube pinched by two finger pads on a
        # table has ~30 coupled contacts; plain relaxed Jacobi diverges and
        # launches it). Articulation sides split per actor copy since the
        # impulse spreads through the whole joint chain. ---
        af = active.astype(body_pos.dtype)
        cnt = jnp.zeros((N, B_env), body_pos.dtype)
        free_or_link_a = jnp.asarray(job.a.type != T_STATIC)
        free_or_link_b = jnp.asarray((job.b.type != T_STATIC) & (job.shape_b >= 0))
        cnt = cnt.at[:, jnp.asarray(job.a.body)].add(af * free_or_link_a)
        cnt = cnt.at[:, jnp.asarray(job.b.body)].add(af * free_or_link_b)
        cnt = jnp.clip(cnt, 1.0)

        def side_split(side: _Side):
            """Per-contact mass-split factor 1/s for this side. Link sides
            split by their own LINK BODY's count: splitting by the whole
            articulation's count would dilute each constraint's progress to
            s_body/s_copy per sweep and let force-limited drives tunnel
            through contacts before the solve converges."""
            return 1.0 / cnt[:, side.body]

        split_a = side_split(job.a)
        split_b = side_split(job.b)

        # --- per-side response data ---
        have_free = free_m is not None
        if have_free:
            inv_m = 1.0 / free_m
            inv_I = binv(free_I_w)

        def free_side(side: _Side):
            is_free = side.type == T_FREE
            fi = np.where(is_free, side.free, 0)
            mask = jnp.asarray(is_free)
            if not have_free or not is_free.any():
                z3 = jnp.zeros((N, C, 3), body_pos.dtype)
                return (
                    jnp.zeros((N, C), body_pos.dtype),
                    jnp.zeros((N, C, 3, 3), body_pos.dtype),
                    z3,
                    fi,
                    mask,
                )
            im = jnp.where(mask[None], inv_m[:, fi], 0.0)
            iI = jnp.where(mask[None, :, None, None], inv_I[:, fi], 0.0)
            r = point - free_com_w[:, fi]
            return im, iI, r, fi, mask

        # TRUE inverse masses drive the per-contact effective mass; the
        # APPLICATION divides by the body's active contact count (mass
        # splitting): each contact then contributes 1/s of its correction,
        # so the Jacobi aggregate per body is bounded by relax * dv_needed
        im_a, iI_a, r_a_f, fia, mask_fa = free_side(job.a)
        im_b, iI_b, r_b_f, fib, mask_fb = free_side(job.b)

        # link sides: per-group gathered response operators
        # K3 (N, Cg, 3, 3) = Jp Ainv Jp^T; W (N, Cg, nv, 3) = Ainv Jp^T
        K3_a = jnp.zeros((N, C, 3, 3), body_pos.dtype)
        K3_b = jnp.zeros((N, C, 3, 3), body_pos.dtype)
        link_ops = []  # (g, idx_a, Jp_a, W_a, copy_a, idx_b, Jp_b, W_b, copy_b)
        for g_id, (ia, ib) in enumerate(self.link_lists):
            if len(ia) == 0 and len(ib) == 0:
                link_ops.append(None)
                continue
            J = art_jac[g_id]  # (N, K, Ls, 6, nv)
            Ainv = art_Ainv[g_id]  # (N, K, nv, nv)
            g = self.scene.art_groups[g_id]

            def ops(idx, side: _Side, split):
                if len(idx) == 0:
                    return None
                cp = side.copy[idx]
                lk = side.link[idx]
                Jl = J[:, cp, lk]  # (N, Cg, 6, nv)
                # point jacobian: v_pt = v_origin + w x r
                link_body = side.body[idx]
                r = point[:, idx] - body_pos[:, link_body]
                Jp = Jl[..., 0:3, :] - skew(r) @ Jl[..., 3:6, :]  # (N, Cg, 3, nv)
                W0 = Ainv[:, cp] @ jnp.swapaxes(Jp, -1, -2)  # (N, Cg, nv, 3)
                K3 = Jp @ W0  # TRUE response for the effective mass
                # mass-splitting applies only to the impulse application
                W = W0 * split[:, idx][..., None, None]
                return idx, Jp, W, cp, K3

            oa = ops(ia, job.a, split_a)
            ob = ops(ib, job.b, split_b)
            if oa is not None:
                K3_a = K3_a.at[:, oa[0]].set(oa[4])
            if ob is not None:
                K3_b = K3_b.at[:, ob[0]].set(ob[4])
            link_ops.append((oa, ob))

        # kinematic surface velocity (statics; zero for world plane)
        kin_lin, kin_ang = body_vel_kin

        def kin_vel(side: _Side, valid):
            v = kin_lin[:, side.body] + jnp.cross(
                kin_ang[:, side.body], point - body_pos[:, side.body]
            )
            # `valid` excludes the WORLD plane pseudo-entity (shape_b == -1),
            # whose body slot would otherwise alias env body 0
            is_kin = jnp.asarray((side.type == T_STATIC) & valid)
            return jnp.where(is_kin[None, :, None], v, 0.0)

        vkin_a = kin_vel(job.a, np.ones(C, bool))
        vkin_b = kin_vel(job.b, np.asarray(job.shape_b) >= 0)

        def eff_mass(direction):
            ta = jnp.cross(r_a_f, direction)
            tb = jnp.cross(r_b_f, direction)
            ka = im_a + jnp.einsum("nci,ncij,ncj->nc", ta, iI_a, ta)
            kb = im_b + jnp.einsum("nci,ncij,ncj->nc", tb, iI_b, tb)
            ka = ka + jnp.einsum("nci,ncij,ncj->nc", direction, K3_a, direction)
            kb = kb + jnp.einsum("nci,ncij,ncj->nc", direction, K3_b, direction)
            return 1.0 / jnp.clip(ka + kb, 1e-9)

        k_n = eff_mass(normal)

        px = self.scene.sim_params.physx
        beta = 0.2
        # penetration allowance: bodies may sink this far before the
        # Baumgarte bias pushes back (PhysX-like compliance — force-limited
        # gripper squeezes need fingers to sit ~1mm inside the cube so
        # gripper_sep drops below the object width, franka_cube_ik_osc.py:365)
        slop = px.rest_offset + px.contact_slop
        h_inv = 1.0 / h
        bias = jnp.minimum(
            beta * h_inv * jnp.clip(depth - slop, 0.0, None),
            px.max_depenetration_velocity,
        )

        def side_vel(v_, w_, qd_, side_ops_sel, fi, mask_f, r_f, vkin, side: _Side):
            """Point velocity of one contact side under current velocities."""
            if have_free:
                vf = v_[:, fi] + jnp.cross(w_[:, fi], r_f)
                vel = jnp.where(mask_f[None, :, None], vf, vkin)
            else:
                vel = vkin
            for g_id, lo in enumerate(link_ops):
                if lo is None:
                    continue
                o = lo[side_ops_sel]
                if o is None:
                    continue
                idx, Jp, _, cp, _ = o
                vpt = jnp.einsum("nckv,ncv->nck", Jp, qd_[g_id][:, cp])
                vel = vel.at[:, idx].set(vpt)
            return vel

        def rel_vel(v_, w_, qd_):
            va = side_vel(v_, w_, qd_, 0, fia, mask_fa, r_a_f, vkin_a, job.a)
            vb = side_vel(v_, w_, qd_, 1, fib, mask_fb, r_b_f, vkin_b, job.b)
            return va - vb

        vn0 = jnp.einsum("nck,nck->nc", rel_vel(free_v, free_w, art_qd), normal)
        bounce = jnp.where(vn0 < -px.bounce_threshold_velocity, -rest * vn0, 0.0)
        # speculative contact: a pair shallower than the slop depth may still
        # approach by (depth-slop)/h this step; only depth > slop gets the
        # positive Baumgarte/restitution target — otherwise approaching
        # fingers stall contact_offset away from the cube and never grasp
        target_vn = jnp.where(
            depth > slop, jnp.maximum(bias, bounce), (depth - slop) * h_inv
        )

        # mass splitting bounds the per-body aggregate correction at
        # relax * dv_needed; 0.8 leaves margin for the nonlinear
        # friction-direction coupling
        relax = 0.8
        iters = max(6, 2 * px.num_position_iterations) + px.num_velocity_iterations

        lam_n = jnp.zeros((N, C), body_pos.dtype)
        lam_t = jnp.zeros((N, C, 3), body_pos.dtype)

        def apply_impulse(v_, w_, qd_, imp):
            """imp (N, C, 3) acts +imp on side a, -imp on side b
            (each body receives its mass-split 1/s share)."""
            if have_free:
                im_as = im_a * split_a
                im_bs = im_b * split_b
                iI_as = iI_a * split_a[..., None, None]
                iI_bs = iI_b * split_b[..., None, None]
                dv_a = jnp.where(mask_fa[None, :, None], imp * im_as[..., None], 0.0)
                dw_a = jnp.einsum("ncij,ncj->nci", iI_as, jnp.cross(r_a_f, imp))
                dv_b = jnp.where(mask_fb[None, :, None], -imp * im_bs[..., None], 0.0)
                dw_b = jnp.einsum("ncij,ncj->nci", iI_bs, jnp.cross(r_b_f, -imp))
                v_ = v_.at[:, fia].add(dv_a)
                w_ = w_.at[:, fia].add(jnp.where(mask_fa[None, :, None], dw_a, 0.0))
                v_ = v_.at[:, fib].add(dv_b)
                w_ = w_.at[:, fib].add(jnp.where(mask_fb[None, :, None], dw_b, 0.0))
            qd_ = list(qd_)
            for g_id, lo in enumerate(link_ops):
                if lo is None:
                    continue
                oa, ob = lo
                if oa is not None:
                    idx, _, W, cp, _ = oa
                    dqd = jnp.einsum("ncvk,nck->ncv", W, imp[:, idx])
                    qd_[g_id] = qd_[g_id].at[:, cp].add(dqd)
                if ob is not None:
                    idx, _, W, cp, _ = ob
                    dqd = jnp.einsum("ncvk,nck->ncv", W, -imp[:, idx])
                    qd_[g_id] = qd_[g_id].at[:, cp].add(dqd)
            return v_, w_, tuple(qd_)

        if warm is not None and warm[0] is not None:
            # warm start: re-apply the previous step's impulses on
            # still-active contacts up front, then refine the deltas —
            # force chains (heavy stacks) keep converging across steps
            # instead of being rebuilt from zero every substep. Rebound
            # energy from stale impulses is bounded by the
            # max_depenetration_velocity bias cap (without it, deep contacts
            # plus converged warm impulses become launch-and-bounce cycles).
            lam_n = jnp.where(active, warm[0], 0.0)
            lam_t = jnp.where(active[..., None], warm[1], 0.0)
            warm_imp = lam_n[..., None] * normal + lam_t
            free_v, free_w, art_qd = apply_impulse(
                free_v, free_w, tuple(art_qd), warm_imp
            )

        def iter_body(carry, _):
            v_, w_, qd_, lam, lamt = carry
            vr = rel_vel(v_, w_, qd_)
            vn = jnp.einsum("nck,nck->nc", vr, normal)
            dlam = relax * k_n * (target_vn - vn)
            new_lam = jnp.clip(lam + dlam, 0.0, None)
            dlam = jnp.where(active, new_lam - lam, 0.0)
            imp = dlam[..., None] * normal

            # friction: ACCUMULATED tangential impulse projected onto the
            # Coulomb cone |lam_t| <= mu*lam_n — true sticking contact (a
            # pinched object does not creep under sustained load, which the
            # per-iteration clamp could never guarantee)
            vt = vr - vn[..., None] * normal
            vt_norm = jnp.linalg.norm(vt, axis=-1).clip(1e-9)
            t_dir = vt / vt_norm[..., None]
            k_t = eff_mass(t_dir)
            lamt_raw = lamt - (relax * k_t * vt_norm)[..., None] * t_dir
            cap = mu * new_lam
            tnorm = jnp.linalg.norm(lamt_raw, axis=-1).clip(1e-9)
            new_lamt = lamt_raw * jnp.minimum(1.0, cap / tnorm)[..., None]
            imp = imp + jnp.where(active[..., None], new_lamt - lamt, 0.0)

            v_, w_, qd_ = apply_impulse(v_, w_, qd_, imp)
            return (v_, w_, qd_, new_lam, new_lamt), None

        (free_v, free_w, art_qd, lam_n, lam_t), _ = jax.lax.scan(
            iter_body,
            (free_v, free_w, tuple(art_qd), lam_n, lam_t),
            None,
            length=iters,
        )

        # net contact force per ENV BODY (normal impulses / h), symmetric on
        # both sides (test12_add_joint.py.py:131 reads forces on links)
        cf = cf_base
        f_c = jnp.where(active, lam_n, 0.0)[..., None] * normal * h_inv
        cf = cf.at[:, jnp.asarray(job.a.body)].add(f_c)
        has_b = jnp.asarray(np.asarray(job.shape_b) >= 0)
        cf = cf.at[:, jnp.asarray(job.b.body)].add(
            jnp.where(has_b[None, :, None], -f_c, 0.0)
        )
        return free_v, free_w, list(art_qd), cf, (lam_n, lam_t)


def _sdf_trilinear(data, origin, spacing, gid, x):
    """Trilinear SDF lookup with the exact gradient of the interpolant.

    data (K, R, R, R) device; origin/spacing (K, 3) numpy; gid (Q,) numpy
    static grid index per pair; x (N, Q, P, 3) query points in the SDF
    mesh's AABB-centered local frame. Returns (phi (N,Q,P), n (N,Q,P,3)).
    Queries outside the grid clamp to the border and add the clamped
    Euclidean excess, so far probes stay positive (no contact)."""
    org = jnp.asarray(origin[gid])[None, :, None]  # (1, Q, 1, 3)
    spc = jnp.asarray(spacing[gid])[None, :, None]
    g = (x - org) / spc
    R = data.shape[1]
    gc = jnp.clip(g, 0.0, R - 1.001)
    excess = jnp.linalg.norm((g - gc) * spc, axis=-1)
    i0 = jnp.floor(gc).astype(jnp.int32)
    f = gc - i0
    gidj = jnp.asarray(gid)[None, :, None]

    def corner(dx, dy, dz):
        return data[
            gidj, i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz
        ]

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    phi = c0 * (1 - fz) + c1 * fz + excess
    dpdx = ((c100 - c000) * (1 - fy) + (c110 - c010) * fy) * (1 - fz) + (
        (c101 - c001) * (1 - fy) + (c111 - c011) * fy
    ) * fz
    dpdy = ((c010 - c000) * (1 - fx) + (c110 - c100) * fx) * (1 - fz) + (
        (c011 - c001) * (1 - fx) + (c111 - c101) * fx
    ) * fz
    dpdz = ((c001 - c000) * (1 - fx) + (c101 - c100) * fx) * (1 - fy) + (
        (c011 - c010) * (1 - fx) + (c111 - c110) * fx
    ) * fy
    grad = jnp.stack([dpdx, dpdy, dpdz], -1) / spc
    n = grad / jnp.linalg.norm(grad, axis=-1, keepdims=True).clip(1e-9)
    return phi, n


def _hull_planes(verts: np.ndarray) -> np.ndarray:
    """Outward face planes [n, d] (n.x + d <= 0 inside) of a convex vertex
    set. Falls back to the 6 AABB planes if qhull rejects the input
    (degenerate/flat hulls)."""
    try:
        from scipy.spatial import ConvexHull

        eq = ConvexHull(np.asarray(verts, np.float64)).equations
        # dedupe near-identical faces to keep Fmax small
        eq = np.unique(np.round(eq, 6), axis=0)
        return eq.astype(np.float32)
    except Exception:
        lo, hi = verts.min(0), verts.max(0)
        eq = []
        for k in range(3):
            n = np.zeros(3)
            n[k] = 1.0
            eq.append(np.concatenate([n, [-hi[k]]]))
            eq.append(np.concatenate([-n, [lo[k]]]))
        return np.asarray(eq, np.float32)


def _pair_allowed(scene, si, sj):
    sh = scene.shapes
    if sh.actor_slot[si] == sh.actor_slot[sj]:
        return False  # self-collision off within an actor's shapes
    gi, gj = sh.collision_group[si], sh.collision_group[sj]
    if not (gi == gj or gi == -1 or gj == -1):
        return False
    if (sh.collision_filter[si] & sh.collision_filter[sj]) != 0:
        return False
    return True


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


def _box_box_edge(pa, qa, size_a, pb, qb, size_b):
    """Deepest edge-edge contact between two OBBs (one candidate per pair).

    SAT over the 9 edge-cross axes; the winning axis pair's closest edge
    points give the contact. Catches the corner-on-corner / 45-degree
    stacking cases vertex-in-box misses
    (/root/reference/examples/large_mass_ratio.py:110-114)."""
    from ..math.quat import quat_to_matrix

    Ra = quat_to_matrix(qa)  # (N, C, 3, 3) columns = axes
    Rb = quat_to_matrix(qb)
    d = pb - pa
    big = jnp.asarray(1e9, pa.dtype)

    # face-axis separations (6): the edge contact only fires when an edge
    # cross axis is the MINIMUM-penetration (max separation) axis — else the
    # vertex-in-box contacts own the manifold (plain SAT axis selection)
    face_sep = jnp.full(pa.shape[:-1], -big)
    for R, own_size in ((Ra, size_a), (Rb, size_b)):
        for k in range(3):
            axis_n = R[..., :, k]
            ra = sum(
                jnp.abs(jnp.einsum("...k,...k->...", axis_n, Ra[..., :, q]))
                * size_a[..., q]
                for q in range(3)
            )
            rb = sum(
                jnp.abs(jnp.einsum("...k,...k->...", axis_n, Rb[..., :, q]))
                * size_b[..., q]
                for q in range(3)
            )
            dist = jnp.einsum("...k,...k->...", axis_n, d)
            face_sep = jnp.maximum(face_sep, jnp.abs(dist) - (ra + rb))

    best_sep = jnp.full(pa.shape[:-1], -big)
    best_axis = jnp.zeros_like(pa)
    best_i = jnp.zeros(pa.shape[:-1], jnp.int32)
    best_j = jnp.zeros(pa.shape[:-1], jnp.int32)

    for i in range(3):
        for j in range(3):
            ea = Ra[..., :, i]  # edge direction on a
            eb = Rb[..., :, j]
            axis = jnp.cross(ea, eb)
            ln = jnp.linalg.norm(axis, axis=-1)
            # near-parallel edges give garbage directions when normalized;
            # their contacts are face-like and owned by the vertex manifold
            ok = ln > 5e-2
            axis_n = axis / jnp.clip(ln, 1e-9)[..., None]
            # project both boxes
            ra = sum(
                jnp.abs(jnp.einsum("...k,...k->...", axis_n, Ra[..., :, k]))
                * size_a[..., k]
                for k in range(3)
            )
            rb = sum(
                jnp.abs(jnp.einsum("...k,...k->...", axis_n, Rb[..., :, k]))
                * size_b[..., k]
                for k in range(3)
            )
            dist = jnp.einsum("...k,...k->...", axis_n, d)
            sep = jnp.abs(dist) - (ra + rb)  # negative = overlap on this axis
            sep = jnp.where(ok, sep, -big)
            better = sep > best_sep
            best_sep = jnp.where(better, sep, best_sep)
            # axis oriented b -> a
            sgn = jnp.where(dist > 0, -1.0, 1.0)
            best_axis = jnp.where(better[..., None], axis_n * sgn[..., None], best_axis)
            best_i = jnp.where(better, i, best_i)
            best_j = jnp.where(better, j, best_j)

    # build the supporting edges on each box for the winning axis
    def support_edge(R, size, center, axis_out, edir_idx):
        """Edge most along axis_out, excluding the edge direction axis."""
        corner = jnp.zeros_like(center)
        for k in range(3):
            ak = R[..., :, k]
            s = jnp.sign(jnp.einsum("...k,...k->...", ak, axis_out))
            s = jnp.where(s == 0, 1.0, s)
            use = (edir_idx != k)
            corner = corner + jnp.where(
                use[..., None], ak * (s * size[..., k])[..., None], 0.0
            )
        Rt = jnp.swapaxes(R, -1, -2)  # (..., 3 axes, 3 components)
        edir = jnp.take_along_axis(
            Rt, edir_idx[..., None, None].astype(jnp.int32), axis=-2
        )[..., 0, :]
        half = jnp.take_along_axis(size, edir_idx[..., None].astype(jnp.int32), -1)[
            ..., 0
        ]
        p0 = center + corner - edir * half[..., None]
        p1 = center + corner + edir * half[..., None]
        return p0, p1

    a0, a1 = support_edge(Ra, size_a, pa, -best_axis, best_i)
    b0, b1 = support_edge(Rb, size_b, pb, best_axis, best_j)
    pA, pB = _segment_closest(a0, a1, b0, b1)
    point = 0.5 * (pA + pB)
    # fire only when the boxes genuinely overlap (every SAT axis overlaps)
    # AND an edge axis is the minimum-penetration one
    overlap = jnp.maximum(best_sep, face_sep) < 0
    # ties go to the vertex manifold (stability under sliding face contact)
    use_edge = best_sep > face_sep + 1e-4
    depth = jnp.where(overlap & use_edge, -best_sep, -1.0)
    return point, best_axis, depth


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
