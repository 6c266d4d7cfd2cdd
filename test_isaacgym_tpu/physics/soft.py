"""FEM soft bodies: XPBD Neo-Hookean tetrahedra (SURVEY.md N11).

The reference runs soft bodies on the FleX backend — `<fem>` URDF links with
a `.tet` mesh, Young's/Poisson/damping materials, Von-Mises stress
visualization, and the tet/tri introspection API
(/root/reference/examples/soft_body.py:28-192, assets/urdf/icosphere.urdf).
FleX itself is a closed binary; this module re-designs the capability as a
TPU-native XPBD solver:

  * state is two dense arrays soft_pos/soft_vel (N, Vt, 3) riding in the
    SimState pytree — batched over envs like everything else;
  * each substep runs `flex.num_outer_iterations x num_inner_iterations`
    Jacobi XPBD iterations under `lax.scan` (static shapes, no host sync);
  * per-tet constraints follow the stable Neo-Hookean XPBD formulation
    (deviatoric C_D = ||F||_F and hydrostatic C_H = det(F) - 1 - mu/lambda,
    compliances 1/(mu V) and 1/(lambda V)), with Young's/Poisson mapped to
    (mu, lambda) the standard way — so `set_actor_soft_materials` is a pure
    array update on PhysParams;
  * scatter accumulation per vertex is a fixed-topology `.at[].add` with
    per-vertex constraint-count averaging (averaged Jacobi converges where
    raw Jacobi overshoots);
  * collision is one-way: soft vertices project out of the ground plane and
    the scene's rigid BOX shapes (the icosphere press arm), with Coulomb-
    style position friction. Rigid bodies do not feel the soft body — the
    reference examples never read that force back.
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# .tet loading + derived topology
# ---------------------------------------------------------------------------
def load_tet(path: str):
    """Parse the reference's `.tet` format: `v x y z` vertex lines and
    `t i j k l` tetrahedron lines (0-based indices) —
    /root/reference/assets/urdf/icosphere.tet."""
    verts, tets = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "t":
                tets.append([int(x) for x in parts[1:5]])
    v = np.asarray(verts, np.float32)
    t = np.asarray(tets, np.int32)
    if len(t) == 0 or t.max() >= len(v):
        raise ValueError(f"malformed tet file {path}")
    return v, t


def surface_triangles(tets: np.ndarray):
    """(tris (S, 3), parent_tet (S,)): boundary faces (appearing in exactly
    one tet), wound so the normal points AWAY from the opposite vertex."""
    face_count = {}
    face_info = {}
    FACES = [(1, 2, 3, 0), (0, 3, 2, 1), (0, 1, 3, 2), (0, 2, 1, 3)]
    for ti, tet in enumerate(tets):
        for (a, b, c, d) in FACES:
            tri = (int(tet[a]), int(tet[b]), int(tet[c]))
            key = tuple(sorted(tri))
            face_count[key] = face_count.get(key, 0) + 1
            face_info[key] = (tri, int(tet[d]), ti)
    tris, parents, opps = [], [], []
    for key, cnt in face_count.items():
        if cnt == 1:
            tri, opp, ti = face_info[key]
            tris.append(tri)
            parents.append(ti)
            opps.append(opp)
    tris = np.asarray(tris, np.int32)
    parents = np.asarray(parents, np.int32)
    return tris, parents, np.asarray(opps, np.int32)


def _fix_winding(verts, tris, opps):
    """Flip boundary faces whose normal points toward the opposite vertex."""
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    n = np.cross(b - a, c - a)
    to_opp = verts[opps] - a
    flip = np.einsum("ij,ij->i", n, to_opp) > 0
    out = tris.copy()
    out[flip] = out[flip][:, ::-1]
    return out


def lame_params(youngs, poissons):
    """(mu, lambda) from (E, nu) — jnp-friendly."""
    mu = youngs / (2.0 * (1.0 + poissons))
    lam = youngs * poissons / ((1.0 + poissons) * (1.0 - 2.0 * poissons))
    return mu, lam


# ---------------------------------------------------------------------------
# world spec (host side, built at Scene.finalize)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class SoftInstanceMeta:
    actor_slot: int
    name: str
    vert_start: int
    vert_count: int
    tet_start: int
    tet_count: int
    tri_start: int
    tri_count: int
    youngs: float
    poissons: float
    damping: float


@dataclasses.dataclass
class SoftWorld:
    """Static description of every soft body in one env (all envs identical).

    verts0 are env-LOCAL rest positions (actor pose composed in); tets/tris
    index the concatenated per-env vertex axis."""

    verts0: np.ndarray  # (Vt, 3)
    tets: np.ndarray  # (T, 4)
    inv_dm: np.ndarray  # (T, 3, 3)
    rest_vol: np.ndarray  # (T,)
    inv_mass: np.ndarray  # (Vt,)
    vert_tet_count: np.ndarray  # (Vt,) tets touching each vertex
    tet_jacobi_scale: np.ndarray  # (T,) 1/max vertex count — see SoftStepper
    tris: np.ndarray  # (S, 3)
    tri_parent: np.ndarray  # (S,)
    inst_of_tet: np.ndarray  # (T,) instance index
    instances: List[SoftInstanceMeta]
    # rigid colliders (shape indices into Scene.shapes): one-way coupled —
    # soft verts project out of sphere/box/capsule/convex-hull shapes
    # (VERDICT r4 item 6; box-only before round 5)
    col_shape: np.ndarray  # (M,) shape indices
    col_body: np.ndarray  # (M,) env body slots
    col_kind: np.ndarray  # (M,) SHAPE_* codes
    # convex-hull planes for SHAPE_MESH colliders, padded (M, F, 4) local
    # [n, d] rows ((0,0,0,-1) padding never constrains); zeros row for
    # non-mesh colliders
    col_planes: np.ndarray
    thickness: float = 0.0  # AssetOptions.thickness collision margin

    @property
    def num_verts(self):
        return len(self.verts0)

    @property
    def num_tets(self):
        return len(self.tets)


def build_soft_world(
    protos, actors, scene_shapes, env0_origin, hulls=None
) -> Optional[SoftWorld]:
    """Collect `<fem>` links of env-0's actors into one SoftWorld.

    Called from SceneBuilder.finalize; `protos` are env-0 _ProtoActor rows
    (all envs share the layout; per-env pose differences beyond the env
    origin are not supported for soft bodies)."""
    from ..assets.types import _quat_mul_np, _rot_np, zero_config_link_pose

    v_all, t_all, inst_meta, inst_of_tet = [], [], [], []
    tris_all, parents_all = [], []
    inv_m_all = []
    v_ofs = 0
    t_ofs = 0
    s_ofs = 0
    thickness = 0.0
    for slot, p in enumerate(protos):
        for li, link in enumerate(p.asset.links):
            fem = getattr(link, "fem", None)
            if fem is None:
                continue
            # soft body rest pose: actor pose ∘ zero-config link pose ∘ fem origin
            lp, lq = zero_config_link_pose(p.asset, li)
            fp = lp + _rot_np(lq, np.asarray(fem.origin_pos))
            fq = _quat_mul_np(lq, np.asarray(fem.origin_quat))
            wp = p.pos + _rot_np(p.quat, fp)
            wq = _quat_mul_np(p.quat, fq)
            verts = (
                _rot_np_batch(wq, fem.verts) + np.asarray(wp)[None]
            ).astype(np.float32)
            tets = fem.tets + v_ofs
            tris, parents, opps = surface_triangles(fem.tets)
            tris = _fix_winding(fem.verts, tris, opps)
            # per-vertex mass from tet rest volumes
            d0 = fem.verts[fem.tets[:, 1]] - fem.verts[fem.tets[:, 0]]
            d1 = fem.verts[fem.tets[:, 2]] - fem.verts[fem.tets[:, 0]]
            d2 = fem.verts[fem.tets[:, 3]] - fem.verts[fem.tets[:, 0]]
            vol = np.abs(np.einsum("ij,ij->i", np.cross(d0, d1), d2)) / 6.0
            m = np.zeros(len(fem.verts))
            for k in range(4):
                np.add.at(m, fem.tets[:, k], fem.density * vol / 4.0)
            inv_m_all.append(1.0 / np.clip(m, 1e-9, None))
            v_all.append(verts)
            t_all.append(tets)
            tris_all.append(tris + v_ofs)
            parents_all.append(parents + t_ofs)
            inst_of_tet.append(np.full(len(tets), len(inst_meta), np.int32))
            inst_meta.append(
                SoftInstanceMeta(
                    actor_slot=slot,
                    name=link.name,
                    vert_start=v_ofs,
                    vert_count=len(verts),
                    tet_start=t_ofs,
                    tet_count=len(tets),
                    tri_start=s_ofs,
                    tri_count=len(tris),
                    youngs=fem.youngs,
                    poissons=fem.poissons,
                    damping=fem.damping,
                )
            )
            v_ofs += len(verts)
            t_ofs += len(tets)
            s_ofs += len(tris)
            thickness = max(thickness, getattr(p.asset, "thickness", 0.0))
    if not inst_meta:
        return None

    verts0 = np.concatenate(v_all, 0)
    tets = np.concatenate(t_all, 0)
    # rest-shape matrices in the DEFORMED-space env frame
    d0 = verts0[tets[:, 1]] - verts0[tets[:, 0]]
    d1 = verts0[tets[:, 2]] - verts0[tets[:, 0]]
    d2 = verts0[tets[:, 3]] - verts0[tets[:, 0]]
    Dm = np.stack([d0, d1, d2], axis=-1)  # (T, 3, 3) columns
    rest_vol = np.abs(np.linalg.det(Dm)) / 6.0
    inv_dm = np.linalg.inv(Dm)
    vt_count = np.zeros(len(verts0))
    for k in range(4):
        np.add.at(vt_count, tets[:, k], 1.0)
    # consistent Jacobi under-relaxation: scale each tet's Δλ by 1/(max
    # count over its 4 verts) so the per-VERTEX aggregate correction stays
    # bounded while λ accumulation matches the applied positions (dividing
    # positions by count but accumulating the FULL Δλ diverges — λ winds up
    # against corrections that never happened)
    jac = 1.0 / np.maximum.reduce([vt_count[tets[:, k]] for k in range(4)])

    # rigid colliders: every sphere/box/capsule/hull shape in the env
    # (soft scenes are small; SHAPE_* codes per core/scene.py)
    kind_arr = np.asarray(scene_shapes.kind)
    col = np.nonzero(np.isin(kind_arr, (0, 1, 2, 3)))[0]
    # mesh shapes without a usable hull can't be projected — drop them
    hull_ids = (
        np.asarray(scene_shapes.hull_id)
        if scene_shapes.hull_id is not None
        else np.full(len(kind_arr), -1)
    )
    keep = [
        s
        for s in col
        if kind_arr[s] != 3
        or (hulls is not None and hull_ids[s] >= 0 and len(hulls[hull_ids[s]]) >= 4)
    ]
    col = np.asarray(keep, np.int64)
    plane_sets = []
    for s in col:
        if kind_arr[s] == 3:
            from .contacts import _hull_planes

            plane_sets.append(_hull_planes(np.asarray(hulls[hull_ids[s]])))
        else:
            plane_sets.append(np.zeros((0, 4), np.float32))
    F = max([len(pl) for pl in plane_sets], default=1) or 1
    planes = np.zeros((len(col), F, 4), np.float32)
    planes[..., 3] = -1.0  # pad: 0.x - 1 <= 0 never constrains
    for k, pl in enumerate(plane_sets):
        planes[k, : len(pl)] = pl
    return SoftWorld(
        verts0=verts0,
        tets=tets,
        inv_dm=inv_dm.astype(np.float32),
        rest_vol=rest_vol.astype(np.float32),
        inv_mass=np.concatenate(inv_m_all).astype(np.float32),
        vert_tet_count=np.clip(vt_count, 1.0, None).astype(np.float32),
        tet_jacobi_scale=jac.astype(np.float32),
        tris=np.concatenate(tris_all, 0),
        tri_parent=np.concatenate(parents_all, 0),
        inst_of_tet=np.concatenate(inst_of_tet),
        instances=inst_meta,
        col_shape=col.astype(np.int32),
        col_body=np.asarray(scene_shapes.body_slot)[col].astype(np.int32),
        col_kind=kind_arr[col].astype(np.int32),
        col_planes=planes,
        thickness=float(thickness),
    )


# ---------------------------------------------------------------------------
# the XPBD substep
# ---------------------------------------------------------------------------
class SoftStepper:
    """Device-side soft solve bound to one SoftWorld (static topology)."""

    def __init__(self, world: SoftWorld, scene):
        self.world = world
        self.scene = scene
        fx = scene.sim_params.flex
        # outer x inner mirrors the FleX iteration budget directly
        # (soft_body.py:40-41: 4 x 20); averaged Jacobi needs the full count
        self.iters = max(1, fx.num_outer_iterations) * max(
            1, fx.num_inner_iterations
        )
        self.relax = float(fx.relaxation)
        px = scene.sim_params.physx
        self.friction = 0.5
        if scene.ground is not None:
            n = np.asarray(scene.ground.normal, np.float64)
            self.plane_n = (n / max(np.linalg.norm(n), 1e-9)).astype(np.float32)
            self.plane_d = float(scene.ground.distance)
            self.friction = float(scene.ground.static_friction)
            self.has_ground = True
        else:
            self.plane_n = np.array([0, 0, 1], np.float32)
            self.plane_d = 0.0
            self.has_ground = False
        del px

    def substep(self, soft_pos, soft_vel, body_pos, body_quat, params, h, gravity):
        """One XPBD substep: returns (pos', vel')."""
        w = self.world
        tets = jnp.asarray(w.tets)
        inv_dm = jnp.asarray(w.inv_dm)
        vol = jnp.asarray(w.rest_vol)
        inv_m = jnp.asarray(w.inv_mass)
        jac_scale = jnp.asarray(w.tet_jacobi_scale) * self.relax
        inst = jnp.asarray(w.inst_of_tet)
        N = soft_pos.shape[0]
        T = w.num_tets

        E = params.soft_youngs[:, inst]  # (N, T)
        nu = params.soft_poissons[:, inst]
        mu, lam = lame_params(E, nu)
        alpha_d = 1.0 / jnp.clip(mu * vol[None], 1e-12) / (h * h)
        alpha_h = 1.0 / jnp.clip(lam * vol[None], 1e-12) / (h * h)
        gamma = 1.0 + mu / jnp.clip(lam, 1e-12)

        # --- predict ---
        v = soft_vel + h * gravity
        p = soft_pos + h * v

        # static box colliders' world pose for this substep
        colliders = None
        if len(w.col_shape):
            cb = jnp.asarray(w.col_body)
            cs = jnp.asarray(w.col_shape)
            sh_pos = jnp.asarray(params.shape_pos[:, cs])
            sh_size = jnp.asarray(params.shape_size[:, cs])
            sq = jnp.asarray(np.asarray(self.scene.shapes.quat, np.float32))[cs]
            from ..math.quat import quat_mul, quat_rotate

            cp = body_pos[:, cb] + quat_rotate(body_quat[:, cb], sh_pos)
            cq = quat_mul(body_quat[:, cb], jnp.broadcast_to(sq, body_quat[:, cb].shape))
            colliders = (cp, cq, sh_size)

        def gather4(x):
            return x[:, tets[:, 0]], x[:, tets[:, 1]], x[:, tets[:, 2]], x[:, tets[:, 3]]

        w0, w1, w2, w3 = (inv_m[tets[:, k]] for k in range(4))

        def project(p, lam_d, lam_h):
            x0, x1, x2, x3 = gather4(p)
            Ds = jnp.stack([x1 - x0, x2 - x0, x3 - x0], axis=-1)  # (N,T,3,3)
            F = Ds @ inv_dm  # (N, T, 3, 3)

            dx = jnp.zeros_like(p)

            def accumulate(dx, g1, g2, g3, dl):
                g0 = -(g1 + g2 + g3)
                dx = dx.at[:, tets[:, 0]].add(w0[None, :, None] * g0 * dl[..., None])
                dx = dx.at[:, tets[:, 1]].add(w1[None, :, None] * g1 * dl[..., None])
                dx = dx.at[:, tets[:, 2]].add(w2[None, :, None] * g2 * dl[..., None])
                dx = dx.at[:, tets[:, 3]].add(w3[None, :, None] * g3 * dl[..., None])
                return dx

            def wsum(g1, g2, g3):
                g0 = -(g1 + g2 + g3)
                return (
                    w0 * jnp.sum(g0 * g0, -1)
                    + w1 * jnp.sum(g1 * g1, -1)
                    + w2 * jnp.sum(g2 * g2, -1)
                    + w3 * jnp.sum(g3 * g3, -1)
                )

            # deviatoric: C = ||F||_F (UN-shifted — the Macklin/Müller
            # stable Neo-Hookean pairing: this rest tension is what cancels
            # the -mu/lam offset inside gamma at F=I; shifting it by
            # -sqrt(3) leaves a net rest force that inflates bodies by
            # ~mu/(mu+3 lam)); dC/dF = F / ||F||_F
            fn = jnp.sqrt(jnp.clip(jnp.sum(F * F, axis=(-2, -1)), 1e-12))
            C_d = fn
            # G[..., :, j] = gradient of C wrt vertex j+1 (chain rule
            # through Ds = [x1-x0 | x2-x0 | x3-x0]: dC/dxj = (dC/dF) invDm^T e_j)
            G = (F / fn[..., None, None]) @ jnp.swapaxes(inv_dm, -1, -2)
            g1, g2, g3 = G[..., :, 0], G[..., :, 1], G[..., :, 2]
            dl = -(C_d + alpha_d * lam_d) / jnp.clip(wsum(g1, g2, g3) + alpha_d, 1e-9)
            dl = dl * jac_scale
            lam_d = lam_d + dl
            dx = accumulate(dx, g1, g2, g3, dl)

            # hydrostatic: C = det(F) - gamma; dC/dF = cof(F)
            det = jnp.linalg.det(F)
            cof = jnp.stack(
                [
                    jnp.cross(F[..., :, 1], F[..., :, 2]),
                    jnp.cross(F[..., :, 2], F[..., :, 0]),
                    jnp.cross(F[..., :, 0], F[..., :, 1]),
                ],
                axis=-1,
            )  # (N, T, 3, 3) columns
            C_h = det - gamma
            Gh = cof @ jnp.swapaxes(inv_dm, -1, -2)
            h1, h2, h3 = Gh[..., :, 0], Gh[..., :, 1], Gh[..., :, 2]
            dlh = -(C_h + alpha_h * lam_h) / jnp.clip(wsum(h1, h2, h3) + alpha_h, 1e-9)
            dlh = dlh * jac_scale
            lam_h = lam_h + dlh
            dx = accumulate(dx, h1, h2, h3, dlh)

            p = p + dx

            # --- collisions (position projection, infinite-mass colliders;
            # idempotent per iteration — friction applies ONCE after the
            # loop, a per-iteration friction subtraction multiplies the
            # tangential correction by the iteration count and pumps energy) ---
            margin = self.world.thickness
            if self.has_ground:
                pn = jnp.asarray(self.plane_n)
                d = jnp.einsum("nvk,k->nv", p, pn) - self.plane_d - margin
                pen = jnp.minimum(d, 0.0)
                p = p - pen[..., None] * pn
            if colliders is not None:
                from ..math.quat import quat_rotate, quat_rotate_inverse

                cp, cq, csz = colliders
                kinds = self.world.col_kind
                pl = jnp.asarray(self.world.col_planes)
                M = cp.shape[1]
                for mi in range(M):
                    k = int(kinds[mi])
                    if k == 0:  # sphere
                        rel = p - cp[:, mi : mi + 1]
                        r = csz[:, mi : mi + 1, 0] + margin
                        d = jnp.linalg.norm(rel, axis=-1).clip(1e-9)
                        inside = d < r
                        p_out = cp[:, mi : mi + 1] + rel / d[..., None] * r[
                            ..., None
                        ]
                        p = jnp.where(inside[..., None], p_out, p)
                        continue
                    rel = quat_rotate_inverse(
                        cq[:, mi : mi + 1], p - cp[:, mi : mi + 1]
                    )
                    if k == 2:  # capsule: segment along local z
                        r = csz[:, mi : mi + 1, 0] + margin
                        hl = csz[:, mi : mi + 1, 1]
                        zc = jnp.clip(rel[..., 2], -hl, hl)
                        seg = jnp.stack(
                            [jnp.zeros_like(zc), jnp.zeros_like(zc), zc], -1
                        )
                        off = rel - seg
                        d = jnp.linalg.norm(off, axis=-1).clip(1e-9)
                        inside = d < r
                        rel_fixed = seg + off / d[..., None] * r[..., None]
                    elif k == 3:  # convex hull: push out of the max plane
                        n = pl[mi, :, :3]  # (F, 3)
                        dd = (
                            jnp.einsum("nvk,fk->nvf", rel, n)
                            + pl[mi, :, 3][None, None, :]
                            - margin * jnp.linalg.norm(n, axis=-1)
                        )
                        dmax = jnp.max(dd, -1)
                        fi = jnp.argmax(dd, -1)
                        inside = dmax < 0
                        n_hit = n[fi]  # static table, computed index: tiny F
                        nn = jnp.sum(n_hit * n_hit, -1).clip(1e-9)
                        rel_fixed = rel - (dmax / nn)[..., None] * n_hit
                    else:  # box
                        half = csz[:, mi : mi + 1] + margin
                        q = jnp.abs(rel) - half
                        inside = jnp.all(q < 0, axis=-1)
                        ax = jnp.argmax(q, axis=-1)
                        sgn = jnp.sign(
                            jnp.take_along_axis(rel, ax[..., None], -1)[..., 0]
                        )
                        tgt = (
                            sgn
                            * jnp.take_along_axis(half, ax[..., None], -1)[..., 0]
                        )
                        rel_fixed = _set_axis(rel, ax, tgt)
                    p_out = cp[:, mi : mi + 1] + quat_rotate(
                        cq[:, mi : mi + 1], rel_fixed
                    )
                    p = jnp.where(inside[..., None], p_out, p)
            return p, lam_d, lam_h

        def body(carry, _):
            p, lam_d, lam_h = carry
            p, lam_d, lam_h = project(p, lam_d, lam_h)
            return (p, lam_d, lam_h), None

        lam_d0 = jnp.zeros((N, T), p.dtype)
        lam_h0 = jnp.zeros((N, T), p.dtype)
        (p, _, _), _ = jax.lax.scan(
            body, (p, lam_d0, lam_h0), None, length=self.iters
        )

        # Coulomb-style position friction, ONCE per substep: ground-contact
        # verts lose tangential motion up to mu * (normal correction)
        if self.has_ground:
            pn = jnp.asarray(self.plane_n)
            d0 = (
                jnp.einsum("nvk,k->nv", soft_pos, pn)
                - self.plane_d
                - self.world.thickness
            )
            # normal correction this substep ~ how far the vert would have
            # sunk: approach distance clipped at 0
            appr = jnp.clip(-(d0 + h * jnp.einsum("nvk,k->nv", soft_vel, pn)), 0.0)
            in_contact = appr > 0
            mot = p - soft_pos
            tan = mot - jnp.einsum("nvk,k->nv", mot, pn)[..., None] * pn
            tn = jnp.linalg.norm(tan, axis=-1).clip(1e-9)
            keep = jnp.clip(1.0 - self.friction * appr / tn, 0.0, 1.0)
            p = p - jnp.where(in_contact[..., None], (1.0 - keep[..., None]) * tan, 0.0)

        v_new = (p - soft_pos) / h
        # per-instance damping mapped to verts through the tets
        damp_v = jnp.zeros((N, w.num_verts), p.dtype)
        dmp = params.soft_damping[:, inst]  # (N, T)
        damp_v = damp_v.at[:, tets[:, 0]].max(dmp)
        damp_v = damp_v.at[:, tets[:, 1]].max(dmp)
        damp_v = damp_v.at[:, tets[:, 2]].max(dmp)
        damp_v = damp_v.at[:, tets[:, 3]].max(dmp)
        v_new = v_new * jnp.clip(1.0 - damp_v[..., None], 0.0, 1.0)
        return p, v_new

    # -- introspection ------------------------------------------------------
    def tet_stress(self, soft_pos, params):
        """Per-tet Cauchy stress (N, T, 3, 3) from the Neo-Hookean model:
        sigma = mu/J (F F^T - I) + lambda (J - 1) I — the quantity behind
        get_sim_tetrahedra's tet_stress and the Von-Mises stress viz."""
        w = self.world
        tets = jnp.asarray(w.tets)
        inv_dm = jnp.asarray(w.inv_dm)
        inst = jnp.asarray(w.inst_of_tet)
        E = params.soft_youngs[:, inst]
        nu = params.soft_poissons[:, inst]
        mu, lam = lame_params(E, nu)
        x0 = soft_pos[:, tets[:, 0]]
        Ds = jnp.stack(
            [
                soft_pos[:, tets[:, 1]] - x0,
                soft_pos[:, tets[:, 2]] - x0,
                soft_pos[:, tets[:, 3]] - x0,
            ],
            axis=-1,
        )
        F = Ds @ inv_dm
        J = jnp.clip(jnp.linalg.det(F), 1e-6)
        B = F @ jnp.swapaxes(F, -1, -2)
        I3 = jnp.eye(3, dtype=F.dtype)
        sigma = (mu / J)[..., None, None] * (B - I3) + (
            lam * (J - 1.0)
        )[..., None, None] * I3
        return sigma

    def tri_normals(self, soft_pos):
        """(N, S, 3) outward unit normals of the surface triangles."""
        w = self.world
        t = jnp.asarray(w.tris)
        a = soft_pos[:, t[:, 0]]
        b = soft_pos[:, t[:, 1]]
        c = soft_pos[:, t[:, 2]]
        n = jnp.cross(b - a, c - a)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-9)


def _rot_np_batch(q, v):
    """Rotate (V, 3) numpy vectors by one xyzw quaternion."""
    qv, qw = np.asarray(q[:3]), float(q[3])
    t = 2.0 * np.cross(np.broadcast_to(qv, v.shape), v)
    return np.asarray(v) + qw * t + np.cross(np.broadcast_to(qv, v.shape), t)


def _set_axis(vec, ax, val):
    """Set component `ax` (..., idx) of vec (..., 3) to val."""
    onehot = jax.nn.one_hot(ax, 3, dtype=vec.dtype)
    return vec * (1.0 - onehot) + onehot * val[..., None]
