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
        # of _SDF_MANIFOLD K_PT_SDF rows): (grid index, probe array (P,3),
        # analytic fn or None)
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
                # Direction policy: when a side's SDF has a closed form the
                # probe-vs-analytic direction is exact AND gather-free (pure
                # fused VPU math), so the reverse probe-vs-voxel direction
                # adds only voxelization noise at ~80 elements/us gather
                # cost (r5 profile: 8 corner gathers were 93% of the
                # nut_bolt step). Keep only analytic-target directions when
                # any exist; voxel<->voxel pairs stay bidirectional.
                ana = [
                    d for d in sdf_dirs
                    if scene.sdfs[int(sh.sdf_id[d[2]])].analytic is not None
                ]
                if ana and not scene.sim_params.physx.sdf_bidirectional:
                    sdf_dirs = ana
                for sa, ea, sb_, eb in sdf_dirs:
                    gi = int(sh.sdf_id[sb_])
                    sdf_pair_meta.append(
                        (gi, _probes_of(sa), scene.sdfs[gi].analytic)
                    )
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

        # static one-hot (B_env, C) matrices: per-body segment reductions in
        # the solve become MXU matmuls instead of scatter-adds (TPU scatter
        # over a (N, C)-indexed axis measured ~23 ms at (1024, 245))
        C = self.num_contacts
        B_env = scene.num_bodies_per_env
        job = self.job

        def oh_body(side_body, row_mask):
            m = np.zeros((B_env, C), np.float32)
            rows_i = np.nonzero(row_mask)[0]
            m[side_body[rows_i], rows_i] = 1.0
            return m

        resp_a = job.a.type != T_STATIC
        resp_b = (job.b.type != T_STATIC) & (job.shape_b >= 0)
        self._oh_cnt_a = oh_body(job.a.body, resp_a)
        self._oh_cnt_b = oh_body(job.b.body, resp_b)
        self._oh_cf_a = oh_body(job.a.body, np.ones(C, bool))
        self._oh_cf_b = oh_body(job.b.body, job.shape_b >= 0)

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
        self.sdf_probes = None
        if sdf_pair_meta:
            # Partition pair directions into evaluation families: voxel
            # rows gather from the stacked grid; analytic rows re-evaluate
            # their closed form inline (one family per distinct fn).
            voxel_q = [
                qi for qi, m in enumerate(sdf_pair_meta) if m[2] is None
            ]
            self.sdf_voxel_q = np.asarray(voxel_q, np.int32)
            ana_groups: dict = {}
            for qi, m in enumerate(sdf_pair_meta):
                if m[2] is not None:
                    ana_groups.setdefault(id(m[2]), (m[2], []))[1].append(qi)
            self.sdf_analytic_groups = [
                (fn, np.asarray(qs, np.int32))
                for fn, qs in ana_groups.values()
            ]
            if voxel_q:
                # stack only the grids voxel rows reference (analytic-only
                # grids never upload their 8 MB of voxels)
                gids = sorted({sdf_pair_meta[qi][0] for qi in voxel_q})
                remap = {g: i for i, g in enumerate(gids)}
                grids = [scene.sdfs[g] for g in gids]
                R = grids[0].data.shape[0]
                assert all(
                    g.data.shape == (R, R, R) for g in grids
                ), "all SDF grids in a scene must share one resolution"
                self.sdf_data = jnp.asarray(
                    np.stack([g.data for g in grids]), jnp.float32
                )
                self.sdf_origin = np.stack(
                    [g.origin for g in grids]
                ).astype(np.float32)
                self.sdf_spacing = np.stack(
                    [g.spacing for g in grids]
                ).astype(np.float32)
                self.sdf_voxel_grid = np.asarray(
                    [remap[sdf_pair_meta[qi][0]] for qi in voxel_q], np.int32
                )
            pmax = max(len(m[1]) for m in sdf_pair_meta)
            # round up to a multiple of the manifold size: selection is
            # strided-grouped (slot m picks over probes {g*M + m}), so pmax
            # must factor as G*M
            M = _SDF_MANIFOLD
            pmax = -(-pmax // M) * M
            probes = []
            for _, pr, _fn in sdf_pair_meta:
                pr = np.asarray(pr, np.float32)
                if len(pr) < pmax:
                    # pad with a FAR sentinel (outside any grid -> phi >> 0,
                    # never a contact). Tiling a real probe would let the
                    # manifold fill several slots with one duplicated point,
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
        # fold local shape offset/rotation into the pose fed to the solver
        # (round-4 eligibility broadening): the solver sees SHAPE centers
        # and center velocities; single-geom bodies have com == center so
        # the inertia arms stay exact. Offsets are RUNTIME (shape_pos) so
        # DR/scaling shows up.
        bp = body_pos[:, bidx]
        bq = body_quat[:, bidx]
        arm = quat_rotate(bq, params.shape_pos[:, sidx])
        center = bp + arm
        sq = quat_mul(bq, jnp.asarray(spec.local_quat)[None])
        w0 = free_w[:, fidx]
        vc = free_v[:, fidx] + jnp.cross(w0, arm)
        v1c, w1, cf_s = _nw.solve(
            spec,
            center,
            sq,
            vc,
            w0,
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
        v1 = v1c - jnp.cross(w1, arm)
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

        # TPU layout note: full-C per-contact state lives in COMPONENT
        # arrays (tuples of (N, C) floats). A (N, C, 3) tensor tile-pads its
        # trailing 3 to 128 lanes (42x), and gathers along C with that
        # trailing dim measured ~25 ms alone at (1024, 245) — the entire
        # franka_cube narrowphase budget. 2-D (N, C) arrays pad to (N, 256).
        # Per-KIND math still runs in vector form on its small row subset
        # (stacking a (N, P, 3) for P<=25 rows is noise).
        def comps(x):
            return tuple(x[..., k] for k in range(x.shape[-1]))

        def shape_pose(s_arr):
            s_np = np.asarray(s_arr)
            owner = sh.body_slot[s_np]
            bp = tuple(body_pos[..., k][:, owner] for k in range(3))
            bq = tuple(body_quat[..., k][:, owner] for k in range(4))
            spos = tuple(
                params.shape_pos[..., k][:, jnp.asarray(s_np)] for k in range(3)
            )
            squat = sh.quat[s_np]  # (C, 4) static numpy
            sq = tuple(jnp.asarray(squat[:, k], jnp.float32)[None] for k in range(4))
            w = _qrot_c(bq, spos)
            p = tuple(w[k] + bp[k] for k in range(3))
            q = _qmul_c(bq, sq)
            return p, q

        pa_c, qa_c = shape_pose(job.shape_a)
        sb_safe = np.maximum(job.shape_b, 0)
        pb_c, qb_c = shape_pose(sb_safe)

        size_a_c = tuple(
            params.shape_size[..., k][:, jnp.asarray(job.shape_a)]
            for k in range(3)
        )
        size_b_c = tuple(
            params.shape_size[..., k][:, jnp.asarray(sb_safe)] for k in range(3)
        )

        def sub(comp_tuple, i):
            """Stack a row subset of a component tuple into vector form."""
            return jnp.stack([c[:, i] for c in comp_tuple], axis=-1)

        class _Sub:
            """Lazily stacks per-kind row subsets (keeps the per-kind code
            in readable vector form while full-C state stays 2-D).
            Supports x[:, i] -> (N, P, k) and x[:, i, c] -> (N, P)."""

            def __init__(self, comp):
                self.comp = comp
                self.dtype = comp[0].dtype

            def __getitem__(self, key):
                if len(key) == 3:
                    _, i, c = key
                    if c is None:  # x[:, i, None] -> (N, P, 1, k)
                        return sub(self.comp, i)[:, :, None]
                    return self.comp[c][:, i]
                _, i = key
                return sub(self.comp, i)

        pa, qa, pb, qb = _Sub(pa_c), _Sub(qa_c), _Sub(pb_c), _Sub(qb_c)
        size_a, size_b = _Sub(size_a_c), _Sub(size_b_c)

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

        if self.hull_verts is not None:
            self._hull_narrowphase(
                put, pa, qa, pb, qb, size_a, size_b, None, ground_sdf, params,
            )

        if self.sdf_probes is not None:
            self._sdf_narrowphase(put, pa, qa, pb, qb, size_a, size_b)

        if acc:
            idx = np.concatenate([a[0] for a in acc])
            # assembly stays 2-D PER COMPONENT: one static inverse-
            # permutation gather per (N, Ctot) array — the former vector-form
            # gather on (N, C, 3) was a measured ~10 ms on its own (42x
            # lane padding on the trailing 3)
            if len(idx) == C and len(np.unique(idx)) == C:
                inv = np.empty(C, np.int64)
                inv[idx] = np.arange(C)

                def assemble(col, k=None):
                    parts = [
                        a[col][..., k] if k is not None else a[col]
                        for a in acc
                    ]
                    return jnp.concatenate(parts, 1)[:, inv]

                point = jnp.stack([assemble(1, k) for k in range(3)], -1)
                normal = jnp.stack([assemble(2, k) for k in range(3)], -1)
                depth = assemble(3)
            else:  # partial coverage (defensive)
                point = jnp.zeros((N, C, 3), body_pos.dtype)
                normal = jnp.zeros((N, C, 3), body_pos.dtype)
                depth = jnp.full((N, C), -1.0, body_pos.dtype)
                point = point.at[:, idx].set(jnp.concatenate([a[1] for a in acc], 1))
                normal = normal.at[:, idx].set(jnp.concatenate([a[2] for a in acc], 1))
                depth = depth.at[:, idx].set(jnp.concatenate([a[3] for a in acc], 1))
        else:
            point = jnp.zeros((N, C, 3), body_pos.dtype)
            normal = jnp.zeros((N, C, 3), body_pos.dtype)
            depth = jnp.full((N, C), -1.0, body_pos.dtype)

        from ..utils import debug as _debug

        if _debug.enabled():  # TIG_DEBUG trace-time invariants (§5.2)
            _debug.assert_contact_tables(point, normal, depth, N, C)
        active = depth > -self.scene.sim_params.physx.contact_offset
        return point, normal, depth, active

    # ------------------------------------------------------------------
    def _sdf_narrowphase(
        self, put, pa, qa, pb, qb, size_a, size_b
    ):
        """Probe-vs-SDF contacts (SURVEY.md N9, nut-bolt threading —
        /root/reference/examples/franka_nut_bolt_ik_osc.py:215-236).

        Each K_PT_SDF group is _SDF_MANIFOLD rows for one (probing mesh,
        SDF mesh) direction: all P probe points of side a are pushed
        through side b's signed-distance field. Fields come in two
        families (partitioned at build time): voxel grids (gathers +
        trilinear interpolation) and closed forms (re-evaluated inline —
        pure VPU math the r5 profile showed is ~100x cheaper than the
        equivalent grid gathers). Manifold selection is strided-grouped:
        slot m takes the deepest probe among {g*M + m : g}, an argmin +
        one-hot reduce instead of a (N, Q, 256) sort (the sort was 6 ms of
        an 11 ms non-gather step; FPS probe ordering makes each stride a
        well-spread surface subsample, so the manifold still covers the
        contact patch)."""
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
        # evaluate each family on its static q-slice, then reassemble
        fams = []  # (q_indices, phi (N, q, P), n_loc (N, q, P, 3))
        if len(self.sdf_voxel_q):
            qv = self.sdf_voxel_q
            phi_v, n_v = _sdf_trilinear(
                self.sdf_data,
                self.sdf_origin,
                self.sdf_spacing,
                self.sdf_voxel_grid,
                rel[:, qv],
            )
            fams.append((qv, phi_v, n_v))
        for fn, qs in self.sdf_analytic_groups:
            rel_q = rel[:, qs]
            phi_q = fn(rel_q)
            g = jax.grad(lambda r, f=fn: f(r).sum())(rel_q)
            n_q = g / jnp.linalg.norm(g, axis=-1, keepdims=True).clip(1e-9)
            fams.append((qs, phi_q, n_q))
        qcat = np.concatenate([f[0] for f in fams])
        if len(fams) == 1 and np.array_equal(qcat, np.arange(len(i0))):
            phi, n_loc = fams[0][1], fams[0][2]
        else:
            inv = np.argsort(qcat)
            phi = jnp.concatenate([f[1] for f in fams], 1)[:, inv]
            n_loc = jnp.concatenate([f[2] for f in fams], 1)[:, inv]
        phi = phi * jnp.mean(sig_b, -1)[..., None]  # uniform-scale approx
        n_w = quat_rotate(qb[:, i0, None], n_loc)
        N, Q, P = phi.shape
        G = P // M
        phi_g = phi.reshape(N, Q, G, M)  # [g, m] = probe g*M + m
        ti = jnp.argmin(phi_g, 2)  # deepest per stride -> (N, Q, M)
        oh = (ti[:, :, None] == jnp.arange(G)[None, None, :, None]).astype(
            w.dtype
        )  # (N, Q, G, M), exactly one g per slot (argmin breaks ties)
        vals = -jnp.sum(phi_g * oh, 2)  # depth = -phi, (N, Q, M)
        pts = jnp.stack(
            [jnp.sum(oh * w[..., k].reshape(N, Q, G, M), 2) for k in range(3)],
            -1,
        )
        nrm = jnp.stack(
            [
                jnp.sum(oh * n_w[..., k].reshape(N, Q, G, M), 2)
                for k in range(3)
            ],
            -1,
        )
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
            sd_raw = jnp.max(s_f, axis=-1)
            sd = sd_raw * sig_u[..., None]
            # argmax face normal via ONE-HOT mask-reduce: a gather indexed
            # by argmax runs ~40 elements/us on TPU (measured 4.3 ms for
            # 180k elements — the top cost of the whole franka_cube step);
            # the masked reduction rides the same (N, P, K, F) fusion as
            # s_f itself. Ties resolve by normalizing the mask sum.
            m = (s_f >= sd_raw[..., None]).astype(s_f.dtype)
            m = m / jnp.clip(jnp.sum(m, axis=-1, keepdims=True), 1.0)
            n_loc = tuple(
                jnp.sum(planes[..., k][None, :, None, :] * m, axis=-1)
                for k in range(3)
            )
            # an exact face-distance tie averages two unit normals — the
            # mean is NOT unit length and would scale the solver impulse;
            # renormalize (advisor round-4 finding)
            n_len = jnp.sqrt(
                jnp.clip(sum(c * c for c in n_loc), 1e-12)
            )
            n_loc = tuple(c / n_len for c in n_loc)
            return sd, qrot_c(q_c, n_loc)

        def top4(i0, pts_c, nrm_c, deps):
            """Emit the 4 deepest candidates into rows i0..i0+3.

            The top-k SELECTION is a one-hot mask-reduce, not a gather:
            take_along_axis here measured 2.8 ms per (N, 22, 4)<-(N, 22, V)
            call on TPU (~20 such calls per substep dominated the step)."""
            N = deps.shape[0]
            P = len(i0)
            # 4-pass masked argmax instead of lax.top_k: the top_k SORT of
            # (N, P, 64) measured 0.7 ms per call on TPU (4 calls/substep);
            # four max+onehot passes fuse into the surrounding elementwise
            # graph
            d = deps
            vals_l, oh_l = [], []
            for _ in range(M4):
                m = jnp.max(d, axis=-1)
                sel = (d >= m[..., None]).astype(deps.dtype)
                # break ties to a single column
                sel = sel * (jnp.cumsum(sel, axis=-1) <= 1.0)
                vals_l.append(m)
                oh_l.append(sel)
                d = jnp.where(sel > 0, -jnp.inf, d)
            vals = jnp.stack(vals_l, -1)  # (N, P, 4)
            oh = jnp.stack(oh_l, -2)  # (N, P, 4, V)
            p4 = [jnp.sum(pts_c[k][..., None, :] * oh, -1) for k in range(3)]
            n4 = [jnp.sum(nrm_c[k][..., None, :] * oh, -1) for k in range(3)]
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
                z_i0 = quat_rotate(qa[:, i0], jnp.array([0.0, 0, 1.0]))
                endp = pa[:, i0] + z_i0 * (hl * sign)[..., None]
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
        # ---- COMPONENT-FORM solve: every per-contact quantity below is a
        # tuple/list of (N, C) arrays with the contact axis LAST (lane dim).
        # (N, C, 3) vectors tile-pad their trailing 3 to 128 lanes (42x) and
        # a single gather/scatter/reduce over them measured 23-28 ms at
        # (1024, 245) on TPU — the whole franka_cube budget. The 2-D form
        # keeps the iteration loop in dense VPU fusions, and the per-body /
        # per-copy segment reductions become one-hot matmuls on the MXU. ----
        f32 = body_pos.dtype
        ptc = tuple(point[..., k] for k in range(3))
        nrm = tuple(normal[..., k] for k in range(3))

        def crossc(a, b):
            return (
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            )

        def dotc(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        def assemble_rows(parts):
            """[(static idx, (N, P) vals)] -> (N, C), zeros elsewhere; one
            static inverse-permutation gather, no scatters."""
            idx = np.concatenate([p[0] for p in parts])
            arrs = [p[1] for p in parts]
            rest = np.setdiff1d(np.arange(C), idx)
            if len(rest):
                arrs.append(jnp.zeros((N, len(rest)), f32))
                idx = np.concatenate([idx, rest])
            inv = np.empty(C, np.int64)
            inv[idx] = np.arange(C)
            return jnp.concatenate(arrs, 1)[:, inv]

        # --- material params per contact ---
        sb_safe = np.maximum(job.shape_b, 0)
        has_b_np = np.asarray(job.shape_b) >= 0
        has_b = jnp.asarray(has_b_np)
        fr_a = params.shape_friction[:, job.shape_a]
        fr_b = jnp.where(
            has_b[None],
            params.shape_friction[:, sb_safe],
            jnp.asarray(self.plane_friction),
        )
        # PhysX default material combine mode is AVERAGE — match it
        mu = 0.5 * (fr_a + fr_b)
        re_a = params.shape_restitution[:, job.shape_a]
        re_b = jnp.where(
            has_b[None],
            params.shape_restitution[:, sb_safe],
            jnp.asarray(self.plane_restitution),
        )
        rest = 0.5 * (re_a + re_b)

        # --- mass-splitting Jacobi scale: each responding body's inverse
        # mass is divided by its ACTIVE contact count (see class docstring);
        # the per-body count is a one-hot MXU reduction, not a scatter ---
        af = active.astype(f32)
        cnt = jnp.einsum("nc,bc->nb", af, jnp.asarray(self._oh_cnt_a)) + jnp.einsum(
            "nc,bc->nb", af, jnp.asarray(self._oh_cnt_b)
        )
        cnt = jnp.clip(cnt, 1.0)
        split_a = 1.0 / cnt[:, job.a.body]
        split_b = 1.0 / cnt[:, job.b.body]

        # --- free-body response data (component form) ---
        have_free = free_m is not None
        F = free_v.shape[1]
        is_free_a = job.a.type == T_FREE
        is_free_b = job.b.type == T_FREE
        fia = np.where(is_free_a, job.a.free, 0)
        fib = np.where(is_free_b, job.b.free, 0)
        mka = jnp.asarray(is_free_a & have_free)
        mkb = jnp.asarray(is_free_b & have_free)
        zc = jnp.zeros((N, C), f32)
        if have_free:
            inv_m = 1.0 / free_m
            inv_If = binv(free_I_w)
            com_c = tuple(free_com_w[..., k] for k in range(3))
            im_a = jnp.where(mka[None], inv_m[:, fia], 0.0)
            im_b = jnp.where(mkb[None], inv_m[:, fib], 0.0)
            iIa = [
                [jnp.where(mka[None], inv_If[..., j, k2][:, fia], 0.0) for k2 in range(3)]
                for j in range(3)
            ]
            iIb = [
                [jnp.where(mkb[None], inv_If[..., j, k2][:, fib], 0.0) for k2 in range(3)]
                for j in range(3)
            ]
            r_a = tuple(ptc[k] - com_c[k][:, fia] for k in range(3))
            r_b = tuple(ptc[k] - com_c[k][:, fib] for k in range(3))
            ohfa = np.zeros((F, C), np.float32)
            ohfa[fia[is_free_a], np.nonzero(is_free_a)[0]] = 1.0
            ohfb = np.zeros((F, C), np.float32)
            ohfb[fib[is_free_b], np.nonzero(is_free_b)[0]] = 1.0
            OHFA, OHFB = jnp.asarray(ohfa), jnp.asarray(ohfb)
        else:
            im_a = im_b = zc
            iIa = [[zc] * 3 for _ in range(3)]
            iIb = [[zc] * 3 for _ in range(3)]
            r_a = r_b = (zc, zc, zc)
            OHFA = OHFB = jnp.zeros((F, C), f32)

        # --- link-side response operators: joint-space impulse tables.
        # TRUE inverse masses drive the effective mass; the APPLICATION is
        # mass-split (see class docstring). All (6, nv) jacobian components
        # become separate (N, Cg) arrays via one transpose + 2-D gathers ---
        link_ops = []  # per group: [op_a | None, op_b | None]
        K3_parts_a = [[[] for _ in range(3)] for _ in range(3)]
        K3_parts_b = [[[] for _ in range(3)] for _ in range(3)]
        for g_id, (ia, ib) in enumerate(self.link_lists):
            if len(ia) == 0 and len(ib) == 0:
                link_ops.append(None)
                continue
            J = art_jac[g_id]  # (N, K, Ls, 6, nv)
            Ainv = art_Ainv[g_id]  # (N, K, nv, nv)
            K, Ls, _, nv = J.shape[1:]
            Jt = jnp.transpose(J, (3, 4, 0, 1, 2)).reshape(6, nv, N, K * Ls)

            def ops(idx, side, split, K3_parts):
                if len(idx) == 0:
                    return None
                cp = side.copy[idx].astype(np.int32)
                flat = (cp * Ls + side.link[idx]).astype(np.int32)
                Jl = [[Jt[r, v][:, flat] for v in range(nv)] for r in range(6)]
                lb = side.body[idx]
                rr = tuple(
                    ptc[k][:, idx] - body_pos[..., k][:, lb] for k in range(3)
                )
                Jp = [[None] * nv for _ in range(3)]
                for v in range(nv):
                    cr = crossc(rr, (Jl[3][v], Jl[4][v], Jl[5][v]))
                    for k in range(3):
                        Jp[k][v] = Jl[k][v] - cr[k]
                Acg = [
                    [Ainv[..., u, v2][:, cp] for v2 in range(nv)] for u in range(nv)
                ]
                W0 = [[None] * 3 for _ in range(nv)]
                for v in range(nv):
                    for k in range(3):
                        acc = Acg[v][0] * Jp[k][0]
                        for u in range(1, nv):
                            acc = acc + Acg[v][u] * Jp[k][u]
                        W0[v][k] = acc
                for k in range(3):
                    for l2 in range(3):
                        acc = Jp[k][0] * W0[0][l2]
                        for v in range(1, nv):
                            acc = acc + Jp[k][v] * W0[v][l2]
                        K3_parts[k][l2].append((idx, acc))
                sp = split[:, idx]
                W = [[W0[v][k] * sp for k in range(3)] for v in range(nv)]
                oh_cp = np.zeros((K, len(idx)), np.float32)
                oh_cp[cp, np.arange(len(idx))] = 1.0
                return dict(
                    g=g_id, idx=idx, Jp=Jp, W=W, cp=cp, nv=nv,
                    oh_cp=jnp.asarray(oh_cp),
                )

            link_ops.append(
                (
                    ops(ia, job.a, split_a, K3_parts_a),
                    ops(ib, job.b, split_b, K3_parts_b),
                )
            )

        def k3_table(parts):
            return [
                [assemble_rows(parts[k][l2]) if parts[k][l2] else zc for l2 in range(3)]
                for k in range(3)
            ]

        K3_a = k3_table(K3_parts_a)
        K3_b = k3_table(K3_parts_b)
        link_mask_a = np.zeros(C, bool)
        link_mask_b = np.zeros(C, bool)
        for lo in link_ops:
            if lo is None:
                continue
            if lo[0] is not None:
                link_mask_a[lo[0]["idx"]] = True
            if lo[1] is not None:
                link_mask_b[lo[1]["idx"]] = True
        lma, lmb = jnp.asarray(link_mask_a), jnp.asarray(link_mask_b)

        # --- kinematic surface velocity (statics; zero for world plane) ---
        kin_lin, kin_ang = body_vel_kin

        def kin_vel(side, valid_np):
            is_kin = jnp.asarray((side.type == T_STATIC) & valid_np)
            b = side.body
            kl = tuple(kin_lin[..., k][:, b] for k in range(3))
            ka = tuple(kin_ang[..., k][:, b] for k in range(3))
            rr = tuple(ptc[k] - body_pos[..., k][:, b] for k in range(3))
            cr = crossc(ka, rr)
            return tuple(
                jnp.where(is_kin[None], kl[k] + cr[k], 0.0) for k in range(3)
            )

        vkin_a = kin_vel(job.a, np.ones(C, bool))
        vkin_b = kin_vel(job.b, has_b_np)

        def quad(M9, x, y):
            acc = x[0] * M9[0][0] * y[0]
            for j in range(3):
                for k in range(3):
                    if j == 0 and k == 0:
                        continue
                    acc = acc + x[j] * M9[j][k] * y[k]
            return acc

        def eff_mass(d):
            ta = crossc(r_a, d)
            tb = crossc(r_b, d)
            ka = im_a + quad(iIa, ta, ta) + quad(K3_a, d, d)
            kb = im_b + quad(iIb, tb, tb) + quad(K3_b, d, d)
            return 1.0 / jnp.clip(ka + kb, 1e-9)

        k_n = eff_mass(nrm)

        px = self.scene.sim_params.physx
        beta = 0.2
        # penetration allowance (PhysX-like compliance — see original note)
        slop = px.rest_offset + px.contact_slop
        h_inv = 1.0 / h
        bias = jnp.minimum(
            beta * h_inv * jnp.clip(depth - slop, 0.0, None),
            px.max_depenetration_velocity,
        )

        def side_vel(vf, wf, qd_l, sel, fi, mask_f, r_f, vkin, lmask):
            """Point velocity comps of one contact side."""
            if have_free:
                vg = tuple(vf[k][:, fi] for k in range(3))
                wg = tuple(wf[k][:, fi] for k in range(3))
                cr = crossc(wg, r_f)
                base = tuple(
                    jnp.where(mask_f[None], vg[k] + cr[k], vkin[k])
                    for k in range(3)
                )
            else:
                base = vkin
            parts = [[] for _ in range(3)]
            for lo in link_ops:
                if lo is None or lo[sel] is None:
                    continue
                o = lo[sel]
                qd_g = qd_l[o["g"]]
                qv = [qd_g[..., v][:, o["cp"]] for v in range(o["nv"])]
                for k in range(3):
                    acc = o["Jp"][k][0] * qv[0]
                    for v in range(1, o["nv"]):
                        acc = acc + o["Jp"][k][v] * qv[v]
                    parts[k].append((o["idx"], acc))
            if not parts[0]:
                return base
            return tuple(
                jnp.where(lmask[None], assemble_rows(parts[k]), base[k])
                for k in range(3)
            )

        def rel_vel(vf, wf, qd_l):
            va = side_vel(vf, wf, qd_l, 0, fia, mka, r_a, vkin_a, lma)
            vb = side_vel(vf, wf, qd_l, 1, fib, mkb, r_b, vkin_b, lmb)
            return tuple(va[k] - vb[k] for k in range(3))

        vfc = tuple(free_v[..., k] for k in range(3))
        wfc = tuple(free_w[..., k] for k in range(3))
        vr0 = rel_vel(vfc, wfc, tuple(art_qd))
        vn0 = dotc(vr0, nrm)
        bounce = jnp.where(vn0 < -px.bounce_threshold_velocity, -rest * vn0, 0.0)
        # speculative contact (see original note)
        target_vn = jnp.where(
            depth > slop, jnp.maximum(bias, bounce), (depth - slop) * h_inv
        )

        relax = 0.8
        iters = max(6, 2 * px.num_position_iterations) + px.num_velocity_iterations

        def apply_impulse(vf, wf, qd_l, imp):
            """imp: 3-tuple (N, C); +imp on side a, -imp on side b (each body
            receives its mass-split share via one-hot MXU reductions)."""
            if have_free:
                im_as = im_a * split_a
                im_bs = im_b * split_b
                cra = crossc(r_a, imp)
                crb = crossc(r_b, imp)
                vf = list(vf)
                wf = list(wf)
                for k in range(3):
                    vf[k] = vf[k] + jnp.einsum("nc,fc->nf", imp[k] * im_as, OHFA)
                    vf[k] = vf[k] - jnp.einsum("nc,fc->nf", imp[k] * im_bs, OHFB)
                for j in range(3):
                    dwa = split_a * (
                        iIa[j][0] * cra[0] + iIa[j][1] * cra[1] + iIa[j][2] * cra[2]
                    )
                    dwb = split_b * (
                        iIb[j][0] * crb[0] + iIb[j][1] * crb[1] + iIb[j][2] * crb[2]
                    )
                    wf[j] = wf[j] + jnp.einsum("nc,fc->nf", dwa, OHFA)
                    wf[j] = wf[j] - jnp.einsum("nc,fc->nf", dwb, OHFB)
                vf, wf = tuple(vf), tuple(wf)
            qd_l = list(qd_l)
            for lo in link_ops:
                if lo is None:
                    continue
                for sel, sign in ((0, 1.0), (1, -1.0)):
                    o = lo[sel]
                    if o is None:
                        continue
                    sub = tuple(imp[k][:, o["idx"]] * sign for k in range(3))
                    cols = []
                    for v in range(o["nv"]):
                        acc = (
                            o["W"][v][0] * sub[0]
                            + o["W"][v][1] * sub[1]
                            + o["W"][v][2] * sub[2]
                        )
                        cols.append(jnp.einsum("nc,kc->nk", acc, o["oh_cp"]))
                    qd_l[o["g"]] = qd_l[o["g"]] + jnp.stack(cols, -1)
            return vf, wf, tuple(qd_l)

        lam_n = zc
        lamt = (zc, zc, zc)
        if warm is not None and warm[0] is not None:
            # warm start (see original note): re-apply previous impulses on
            # still-active rows up front, then refine the deltas
            lam_n = jnp.where(active, warm[0], 0.0)
            lamt = tuple(
                jnp.where(active, warm[1][..., k], 0.0) for k in range(3)
            )
            warm_imp = tuple(lam_n * nrm[k] + lamt[k] for k in range(3))
            vfc, wfc, art_qd = apply_impulse(vfc, wfc, tuple(art_qd), warm_imp)

        def iter_body(carry, _):
            vf, wf, qd_l, lam, lt = carry
            vr = rel_vel(vf, wf, qd_l)
            vn = dotc(vr, nrm)
            dlam = relax * k_n * (target_vn - vn)
            new_lam = jnp.clip(lam + dlam, 0.0, None)
            dl = jnp.where(active, new_lam - lam, 0.0)
            imp = [dl * nrm[k] for k in range(3)]

            # friction: ACCUMULATED tangential impulse on the Coulomb cone
            vt = tuple(vr[k] - vn * nrm[k] for k in range(3))
            vt_norm = jnp.sqrt(jnp.clip(dotc(vt, vt), 1e-18))
            t_dir = tuple(vt[k] / vt_norm for k in range(3))
            k_t = eff_mass(t_dir)
            lt_raw = tuple(lt[k] - (relax * k_t) * vt[k] for k in range(3))
            cap = mu * new_lam
            tnorm = jnp.sqrt(jnp.clip(dotc(lt_raw, lt_raw), 1e-18))
            scale = jnp.minimum(1.0, cap / tnorm)
            new_lt = tuple(lt_raw[k] * scale for k in range(3))
            for k in range(3):
                imp[k] = imp[k] + jnp.where(active, new_lt[k] - lt[k], 0.0)

            vf, wf, qd_l = apply_impulse(vf, wf, qd_l, tuple(imp))
            return (vf, wf, qd_l, new_lam, new_lt), None

        # UNROLLED (capped): the TPU profile of the scanned form showed
        # ~0.15 ms async copy-start latency per loop-carried/invariant
        # buffer per iteration (102 copies per 3 steps) — more wall time
        # than the solver math. Full unroll kills that but compile cost is
        # linear in the unroll factor, so high-iteration configs (nut-bolt
        # runs 65) keep a short loop of unrolled blocks.
        unroll = iters if iters <= 24 else 8
        (vfc, wfc, art_qd, lam_n, lamt), _ = jax.lax.scan(
            iter_body,
            (vfc, wfc, tuple(art_qd), lam_n, lamt),
            None,
            length=iters,
            unroll=unroll,
        )
        free_v = jnp.stack(vfc, -1)
        free_w = jnp.stack(wfc, -1)

        # net contact force per ENV BODY (normal impulses / h), symmetric
        f_cn = jnp.where(active, lam_n, 0.0) * h_inv
        cf_cols = []
        for k in range(3):
            f_k = f_cn * nrm[k]
            cf_cols.append(
                jnp.einsum("nc,bc->nb", f_k, jnp.asarray(self._oh_cf_a))
                - jnp.einsum("nc,bc->nb", f_k, jnp.asarray(self._oh_cf_b))
            )
        cf = cf_base + jnp.stack(cf_cols, -1)
        lam_t = jnp.stack(lamt, -1)
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


def _qrot_c(q, v):
    """Component-form quat rotate: q 4-tuple, v 3-tuple of broadcastable
    arrays -> 3-tuple. (The (N, C, 3/4) vector form tile-pads 42x on TPU.)"""
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


def _qmul_c(a, b):
    """Component-form quat multiply (xyzw)."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


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
