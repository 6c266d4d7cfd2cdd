"""All-pairs sphere-world contacts: the large-free-body fast path.

TPU-first replacement for a sparse broadphase + narrowphase + scatter solver
(the reference's PhysX pipeline, SURVEY.md N2) for worlds dominated by free
sphere actors (/root/reference/examples/1080_balls_of_solitude.py — 1080
balls in one collision world under --all_collisions, projectiles.py group -1).

Instead of pruning pairs and gathering/scattering sparse contacts — a memory
-bound, irregular pattern TPUs hate — we evaluate ALL O(F^2) candidate pairs
as dense (F, F) tiles on the VPU: narrowphase (sphere-sphere distance),
restitution targets, and a mass-split relaxed-Jacobi impulse solve with
accumulated normal/friction impulses, fused in one pass. Ground-plane
contacts ride along as one extra dense row block, so a balls-only scene
never touches the static contact table at all.

Two implementations with identical math:
  * a Pallas TPU kernel (`_pallas_solve`) that keeps the (F, F) impulse
    matrices resident in VMEM across ALL solver iterations — positions,
    velocities and lambdas never round-trip to HBM inside the solve;
  * a pure-jnp fallback (`_jnp_solve`) for CPU (tests / forced host meshes)
    and for F beyond the VMEM budget.

Conventions match physics/contacts.py: normal points b->a (j->i), Baumgarte
beta=0.2, slop = rest_offset + 1.5e-3, speculative targets below the slop
depth, PhysX AVERAGE material combine.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports are safe on CPU; kernels only trace on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = pltpu = None

# largest F the fused Pallas kernel accepts: (F, F) f32 lam_n (5.3 MB) +
# (F, F) bf16 lam_t + allow mask must fit VMEM (~16 MB) with headroom
PALLAS_F_MAX = 1152
_TI = 8  # i-tile rows per inner step (f32 sublane tile)


class SphereWorldSpec(NamedTuple):
    """Static (trace-time) description of the sphere world of one env."""

    shape_idx: np.ndarray  # (F,) env shape indices of the spheres
    free_idx: np.ndarray  # (F,) indices into the free-body batch
    body_slot: np.ndarray  # (F,) env body slots (for contact-force output)
    allow: np.ndarray  # (F, F) bool, upper-triangular collidable pairs
    has_ground: bool  # plane contacts handled here (no heightfield)
    plane_n: np.ndarray  # (3,)
    plane_d: float
    plane_friction: float
    plane_restitution: float


def build_spec(scene, threshold: int = 64) -> Optional[SphereWorldSpec]:
    """Pick out the free sphere actors of `scene` if there are enough of
    them to justify the dense path. Returns None for small scenes (the
    static table is cheaper there)."""
    from ..core.scene import SHAPE_SPHERE

    fg = scene.free_group
    if fg is None:
        return None
    sh = scene.shapes
    rows = []
    for fi, b in enumerate(fg.body_slot):
        s = np.nonzero(sh.body_slot == b)[0]
        if len(s) == 1 and sh.kind[s[0]] == SHAPE_SPHERE:
            rows.append((int(s[0]), fi, int(b)))
    if len(rows) < threshold:
        return None
    shape_idx = np.array([r[0] for r in rows], np.int32)
    free_idx = np.array([r[1] for r in rows], np.int32)
    body_slot = np.array([r[2] for r in rows], np.int32)

    grp = sh.collision_group[shape_idx]
    flt = sh.collision_filter[shape_idx]
    gi, gj = grp[:, None], grp[None, :]
    allow = (gi == gj) | (gi == -1) | (gj == -1)
    allow &= (flt[:, None] & flt[None, :]) == 0
    allow &= np.triu(np.ones_like(allow), 1) > 0  # i < j once per pair

    has_ground = scene.ground is not None and scene.heightfield is None
    if has_ground:
        n = np.asarray(scene.ground.normal, np.float32)
        n = n / max(np.linalg.norm(n), 1e-9)
        pd = float(scene.ground.distance)
        pf = float(scene.ground.static_friction)
        pr = float(scene.ground.restitution)
    else:
        n, pd, pf, pr = np.array([0, 0, 1], np.float32), 0.0, 1.0, 0.0
    return SphereWorldSpec(
        shape_idx=shape_idx,
        free_idx=free_idx,
        body_slot=body_slot,
        allow=np.asarray(allow, bool),
        has_ground=has_ground,
        plane_n=n,
        plane_d=pd,
        plane_friction=pf,
        plane_restitution=pr,
    )


def solve(
    spec: SphereWorldSpec,
    pos,  # (N, F, 3) sphere centers
    vel,  # (N, F, 3)
    omega,  # (N, F, 3)
    radius,  # (N, F)
    inv_m,  # (N, F)
    inv_i,  # (N, F) isotropic world inverse inertia
    mu,  # (N, F) shape friction
    rest,  # (N, F) shape restitution
    h: float,
    iters: int,
    contact_offset: float,
    slop: float,
    bounce_thresh: float,
):
    """Returns (vel', omega', cf (N, F, 3) normal contact force per sphere)."""
    import os

    F = pos.shape[1]
    use_pallas = jax.default_backend() == "tpu" and F <= PALLAS_F_MAX
    force = os.environ.get("TIG_SPHERE_PALLAS")
    if force is not None:
        use_pallas = force not in ("0", "off") and jax.default_backend() == "tpu"
    impl = _pallas_solve if use_pallas else _jnp_solve
    return impl(
        spec, pos, vel, omega, radius, inv_m, inv_i, mu, rest,
        float(h), int(iters), float(contact_offset), float(slop),
        float(bounce_thresh),
    )


# ---------------------------------------------------------------------------
# jnp reference implementation (CPU tests / oversized scenes)
# ---------------------------------------------------------------------------
def _jnp_solve(
    spec, pos, vel, omega, radius, inv_m, inv_i, mu, rest,
    h, iters, contact_offset, slop, bounce_thresh,
):
    N, F, _ = pos.shape
    dt = pos.dtype
    allow = jnp.asarray(spec.allow)  # (F, F) upper-tri
    pn = jnp.asarray(spec.plane_n, dt)
    pd = jnp.asarray(spec.plane_d, dt)

    # --- static pair geometry (positions don't move during the solve) ---
    d = pos[:, :, None, :] - pos[:, None, :, :]  # (N, F, F, 3) x_i - x_j
    dist = jnp.linalg.norm(d, axis=-1).clip(1e-9)
    n = d / dist[..., None]  # j -> i
    rsum = radius[:, :, None] + radius[:, None, :]
    depth = rsum - dist
    active = allow[None] & (depth > -contact_offset)
    mu_p = 0.5 * (mu[:, :, None] + mu[:, None, :])
    rest_p = 0.5 * (rest[:, :, None] + rest[:, None, :])

    # ground
    if spec.has_ground:
        dg = jnp.einsum("nfk,k->nf", pos, pn) - pd
        depth_g = radius - dg
        active_g = depth_g > -contact_offset
    else:
        depth_g = jnp.full((N, F), -1.0, dt)
        active_g = jnp.zeros((N, F), bool)
    mu_g = 0.5 * (mu + spec.plane_friction)
    rest_g = 0.5 * (rest + spec.plane_restitution)

    # --- mass splitting counts ---
    af = active.astype(dt)
    cnt = af.sum(2) + af.sum(1) + active_g.astype(dt)
    inv_cnt = 1.0 / jnp.clip(cnt, 1.0)

    im_i, im_j = inv_m[:, :, None], inv_m[:, None, :]
    ii_i, ii_j = inv_i[:, :, None], inv_i[:, None, :]
    r_i, r_j = radius[:, :, None], radius[:, None, :]
    k_n = 1.0 / jnp.clip(im_i + im_j, 1e-9)
    k_t = 1.0 / jnp.clip(im_i + im_j + r_i * r_i * ii_i + r_j * r_j * ii_j, 1e-9)
    k_ng = 1.0 / jnp.clip(inv_m, 1e-9)
    k_tg = 1.0 / jnp.clip(inv_m + radius * radius * inv_i, 1e-9)

    def pair_relvel(v, w):
        # surface velocity at the contact: vr = v_i - v_j - (r_i w_i + r_j w_j) x n
        wmix = r_i[..., None] * w[:, :, None, :] + r_j[..., None] * w[:, None, :, :]
        return v[:, :, None, :] - v[:, None, :, :] - jnp.cross(wmix, n)

    h_inv = 1.0 / h
    beta = 0.2
    vn0 = jnp.einsum("nijk,nijk->nij", pair_relvel(vel, omega), n)
    bias = beta * h_inv * jnp.clip(depth - slop, 0.0, None)
    bounce = jnp.where(vn0 < -bounce_thresh, -rest_p * vn0, 0.0)
    tvn = jnp.where(depth > slop, jnp.maximum(bias, bounce), (depth - slop) * h_inv)

    if spec.has_ground:
        # ground surface velocity: v + w x (-n r) -> normal comp = v.n
        vn0g = jnp.einsum("nfk,k->nf", vel, pn)
        bias_g = beta * h_inv * jnp.clip(depth_g - slop, 0.0, None)
        bounce_g = jnp.where(vn0g < -bounce_thresh, -rest_g * vn0g, 0.0)
        tvn_g = jnp.where(
            depth_g > slop, jnp.maximum(bias_g, bounce_g), (depth_g - slop) * h_inv
        )
    else:
        tvn_g = jnp.zeros((N, F), dt)

    relax = 0.8

    def body(carry, _):
        v, w, lam, lamt, lam_g, lamt_g = carry
        vr = pair_relvel(v, w)
        vn = jnp.einsum("nijk,nijk->nij", vr, n)
        new_lam = jnp.clip(lam + relax * k_n * (tvn - vn), 0.0, None)
        dlam = jnp.where(active, new_lam - lam, 0.0)
        new_lam = lam + dlam
        imp = dlam[..., None] * n

        vt = vr - vn[..., None] * n
        vtn = jnp.linalg.norm(vt, axis=-1).clip(1e-9)
        tdir = vt / vtn[..., None]
        # scalar accumulated friction magnitude along the (slowly-varying)
        # instantaneous tangent; cone cap mu * lam_n
        new_lamt = jnp.minimum(lamt + relax * k_t * vtn, mu_p * new_lam)
        dlamt = jnp.where(active, new_lamt - lamt, 0.0)
        new_lamt = lamt + dlamt
        imp = imp - dlamt[..., None] * tdir

        # apply with mass splitting (i gets +imp, j gets -imp)
        s_i = inv_cnt[:, :, None]
        s_j = inv_cnt[:, None, :]
        dv = jnp.einsum("nijk->nik", imp * (im_i * s_i)[..., None]) - jnp.einsum(
            "nijk->njk", imp * (im_j * s_j)[..., None]
        )
        # torques: arm_i = -n r_i, arm_j = +n r_j; tau_j = arm_j x (-imp)
        tq = jnp.cross(n, imp)  # = n x imp
        dw = jnp.einsum(
            "nijk->nik", tq * (-r_i * ii_i * s_i)[..., None]
        ) + jnp.einsum("nijk->njk", tq * (-r_j * ii_j * s_j)[..., None])
        v = v + dv
        w = w + dw

        if spec.has_ground:
            vr_g = v - jnp.cross(w, pn) * radius[..., None]
            vn_g = jnp.einsum("nfk,k->nf", vr_g, pn)
            new_lg = jnp.clip(lam_g + relax * k_ng * (tvn_g - vn_g), 0.0, None)
            dlg = jnp.where(active_g, new_lg - lam_g, 0.0)
            new_lg = lam_g + dlg
            imp_g = dlg[..., None] * pn
            vt_g = vr_g - vn_g[..., None] * pn
            vtn_g = jnp.linalg.norm(vt_g, axis=-1).clip(1e-9)
            tdir_g = vt_g / vtn_g[..., None]
            new_ltg = jnp.minimum(lamt_g + relax * k_tg * vtn_g, mu_g * new_lg)
            dltg = jnp.where(active_g, new_ltg - lamt_g, 0.0)
            new_ltg = lamt_g + dltg
            imp_g = imp_g - dltg[..., None] * tdir_g
            sg = inv_cnt
            v = v + imp_g * (inv_m * sg)[..., None]
            w = w + jnp.cross(-pn * radius[..., None], imp_g) * (inv_i * sg)[..., None]
            lam_g, lamt_g = new_lg, new_ltg
        return (v, w, new_lam, new_lamt, lam_g, lamt_g), None

    z2 = jnp.zeros((N, F, F), dt)
    z1 = jnp.zeros((N, F), dt)
    (vel, omega, lam, _, lam_g, _), _ = jax.lax.scan(
        body, (vel, omega, z2, z2, z1, z1), None, length=iters
    )

    # net normal contact force per sphere (both sides + ground)
    f = jnp.where(active, lam, 0.0)[..., None] * n / h
    cf = f.sum(2) - f.sum(1)
    if spec.has_ground:
        cf = cf + (jnp.where(active_g, lam_g, 0.0) / h)[..., None] * pn
    return vel, omega, cf


# ---------------------------------------------------------------------------
# Pallas TPU kernel: all iterations fused, lambda matrices resident in VMEM
# ---------------------------------------------------------------------------
def _pallas_solve(
    spec, pos, vel, omega, radius, inv_m, inv_i, mu, rest,
    h, iters, contact_offset, slop, bounce_thresh,
):
    N, F, _ = pos.shape
    Fp = ((F + 127) // 128) * 128
    dt = jnp.float32

    def padF(x, fill=0.0):
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, Fp - F)
        return jnp.pad(x.astype(dt), pad, constant_values=fill)

    # dyn rows: 0-2 pos, 3-5 vel, 6-8 omega, 9 radius, 10 inv_m, 11 inv_i,
    # 12 mu, 13 rest (padded bodies: zero inv mass, zero radius, far away)
    pos_p = padF(pos, 1e6)
    dyn = jnp.concatenate(
        [
            jnp.swapaxes(pos_p, 1, 2),
            jnp.swapaxes(padF(vel), 1, 2),
            jnp.swapaxes(padF(omega), 1, 2),
            padF(radius)[:, None, :],
            padF(inv_m)[:, None, :],
            padF(inv_i)[:, None, :],
            padF(mu)[:, None, :],
            padF(rest)[:, None, :],
            jnp.zeros((N, 2, Fp), dt),
        ],
        axis=1,
    )  # (N, 16, Fp)
    dynT = jnp.swapaxes(dyn, 1, 2)  # (N, Fp, 16)
    allow = np.zeros((Fp, Fp), np.float32)
    allow[:F, :F] = spec.allow
    allow = jnp.asarray(allow)

    n_tiles = Fp // _TI
    pn = spec.plane_n
    scalars = jnp.array(
        [
            h, float(iters), contact_offset, slop, bounce_thresh,
            float(pn[0]), float(pn[1]), float(pn[2]), spec.plane_d,
            spec.plane_friction, spec.plane_restitution,
            1.0 if spec.has_ground else 0.0,
        ],
        dt,
    )

    kernel = functools.partial(_sw_kernel, Fp=Fp, n_tiles=n_tiles, iters=iters)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 16, Fp), dt),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 16, Fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, Fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 16, Fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((Fp, Fp), jnp.float32),  # lam_n
            pltpu.VMEM((Fp, Fp), jnp.bfloat16),  # lam_t (scalar magnitude)
            pltpu.VMEM((16, Fp), jnp.float32),  # cur: vel/omega/ground lam/cnt
            pltpu.VMEM((Fp, 16), jnp.float32),  # curT (i-side reads)
            pltpu.VMEM((16, Fp), jnp.float32),  # acc (j-side sums)
            pltpu.VMEM((Fp, 16), jnp.float32),  # accT (i-side sums)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(15.5 * 1024 * 1024)
        ),
    )(dyn, dynT, allow, scalars)

    vel_o = jnp.swapaxes(out[:, 0:3, :F], 1, 2)
    om_o = jnp.swapaxes(out[:, 3:6, :F], 1, 2)
    cf_o = jnp.swapaxes(out[:, 6:9, :F], 1, 2)
    return vel_o, om_o, cf_o


def _sw_kernel(
    dyn_ref, dynT_ref, allow_ref, sc_ref, out_ref,
    lam_n, lam_t, cur, curT, acc, accT, *, Fp, n_tiles, iters,
):
    """One env's full sphere-world solve. See _jnp_solve for the math."""
    import jax.numpy as jnp  # noqa: F811 (kernel-local for clarity)

    h = sc_ref[0]
    contact_offset = sc_ref[2]
    slop = sc_ref[3]
    bounce_thresh = sc_ref[4]
    pnx, pny, pnz = sc_ref[5], sc_ref[6], sc_ref[7]
    pd = sc_ref[8]
    pf = sc_ref[9]
    pr = sc_ref[10]
    has_ground = sc_ref[11] > 0.5
    h_inv = 1.0 / h
    beta = 0.2
    relax = 0.8

    def row(r):  # (1, Fp) j-side view of a dyn row
        return dyn_ref[0, r : r + 1, :]

    px, py, pz = row(0), row(1), row(2)
    rad, im, ii = row(9), row(10), row(11)
    mu_r, re_r = row(12), row(13)

    # cur rows: 0-2 vel, 3-5 omega, 6-8 vel0/omega0 packed? -> use 6-8 = cf,
    # 9 lam_g, 10 lamt_g, 11 inv_cnt, 12-14 vel0, 15 spare
    cur[0:6, :] = dyn_ref[0, 3:9, :]
    cur[6:12, :] = jnp.zeros((6, Fp), jnp.float32)
    cur[12:15, :] = dyn_ref[0, 3:6, :]  # vel0 (for ground restitution)
    cur[15:16, :] = jnp.zeros((1, Fp), jnp.float32)
    lam_n[:, :] = jnp.zeros((Fp, Fp), jnp.float32)
    lam_t[:, :] = jnp.zeros((Fp, Fp), jnp.bfloat16)

    def iside(ti, r):  # (TI, 1) i-side view of dynT column r
        return dynT_ref[0, pl.ds(ti * _TI, _TI), r : r + 1]

    # ---- pass 0: active-contact counts (geometry is static) ----
    dg = px * pnx + py * pny + pz * pnz - pd
    depth_g = rad - dg
    active_g = jnp.logical_and(depth_g > -contact_offset, has_ground)
    cnt = active_g.astype(jnp.float32)  # (1, Fp)
    accT[:, :] = jnp.zeros((Fp, 16), jnp.float32)

    def cnt_body(t, cnt):
        dx = iside(t, 0) - px
        dy = iside(t, 1) - py
        dz = iside(t, 2) - pz
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        depth = (iside(t, 9) + rad) - dist
        a = allow_ref[pl.ds(t * _TI, _TI), :] * (depth > -contact_offset)
        accT[pl.ds(t * _TI, _TI), 0:1] = jnp.sum(a, axis=1, keepdims=True)
        return cnt + jnp.sum(a, axis=0, keepdims=True)

    cnt = jax.lax.fori_loop(0, n_tiles, cnt_body, cnt)
    cnt = cnt + accT[:, 0:1].reshape(1, Fp)
    cur[11:12, :] = 1.0 / jnp.maximum(cnt, 1.0)  # inv_cnt

    # curT mirror for i-side reads of vel/omega/inv_cnt/vel0
    curT[:, :] = cur[:, :].T

    def tile_pass(t, _):
        """One i-tile Jacobi sweep: updates lam tiles, accumulates dv/dw."""
        ti = t * _TI
        dx = iside(t, 0) - px
        dy = iside(t, 1) - py
        dz = iside(t, 2) - pz
        dist = jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-9)
        inv_d = 1.0 / dist
        nx, ny, nz = dx * inv_d, dy * inv_d, dz * inv_d
        r_i = iside(t, 9)
        depth = (r_i + rad) - dist
        a = allow_ref[pl.ds(ti, _TI), :] * (depth > -contact_offset)

        im_i, ii_i = iside(t, 10), iside(t, 11)
        k_n = 1.0 / jnp.maximum(im_i + im, 1e-9)
        k_t = 1.0 / jnp.maximum(
            im_i + im + r_i * r_i * ii_i + rad * rad * ii, 1e-9
        )

        # relative velocity vr = v_i - v_j - (r_i w_i + r_j w_j) x n
        vix = curT[pl.ds(ti, _TI), 0:1] - cur[0:1, :]
        viy = curT[pl.ds(ti, _TI), 1:2] - cur[1:2, :]
        viz = curT[pl.ds(ti, _TI), 2:3] - cur[2:3, :]
        wx = r_i * curT[pl.ds(ti, _TI), 3:4] + rad * cur[3:4, :]
        wy = r_i * curT[pl.ds(ti, _TI), 4:5] + rad * cur[4:5, :]
        wz = r_i * curT[pl.ds(ti, _TI), 5:6] + rad * cur[5:6, :]
        # w x n
        cx = wy * nz - wz * ny
        cy = wz * nx - wx * nz
        cz = wx * ny - wy * nx
        vrx, vry, vrz = vix - cx, viy - cy, viz - cz
        vn = vrx * nx + vry * ny + vrz * nz

        # restitution from vel0 (rows 12-14 of cur / curT)
        v0x = curT[pl.ds(ti, _TI), 12:13] - cur[12:13, :]
        v0y = curT[pl.ds(ti, _TI), 13:14] - cur[13:14, :]
        v0z = curT[pl.ds(ti, _TI), 14:15] - cur[14:15, :]
        vn0 = v0x * nx + v0y * ny + v0z * nz  # omega0 term dropped (small)
        rest_p = 0.5 * (iside(t, 13) + re_r)
        bias = beta * h_inv * jnp.maximum(depth - slop, 0.0)
        bounce = jnp.where(vn0 < -bounce_thresh, -rest_p * vn0, 0.0)
        tvn = jnp.where(
            depth > slop, jnp.maximum(bias, bounce), (depth - slop) * h_inv
        )

        lam = lam_n[pl.ds(ti, _TI), :]
        new_lam = jnp.maximum(lam + relax * k_n * (tvn - vn), 0.0)
        dlam = a * (new_lam - lam)
        new_lam = lam + dlam
        lam_n[pl.ds(ti, _TI), :] = new_lam

        vtx = vrx - vn * nx
        vty = vry - vn * ny
        vtz = vrz - vn * nz
        vtn = jnp.maximum(jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz), 1e-9)
        itn = 1.0 / vtn
        tx, ty, tz = vtx * itn, vty * itn, vtz * itn
        mu_p = 0.5 * (iside(t, 12) + mu_r)
        lamt = lam_t[pl.ds(ti, _TI), :].astype(jnp.float32)
        new_lamt = jnp.minimum(lamt + relax * k_t * vtn, mu_p * new_lam)
        dlamt = a * (new_lamt - lamt)
        lam_t[pl.ds(ti, _TI), :] = (lamt + dlamt).astype(jnp.bfloat16)

        ix = dlam * nx - dlamt * tx
        iy = dlam * ny - dlamt * ty
        iz = dlam * nz - dlamt * tz

        # i-side: row sums, mass-split by i's count
        s_i = im_i * curT[pl.ds(ti, _TI), 11:12]
        accT[pl.ds(ti, _TI), 0:1] = accT[pl.ds(ti, _TI), 0:1] + jnp.sum(
            ix, 1, keepdims=True
        ) * s_i
        accT[pl.ds(ti, _TI), 1:2] = accT[pl.ds(ti, _TI), 1:2] + jnp.sum(
            iy, 1, keepdims=True
        ) * s_i
        accT[pl.ds(ti, _TI), 2:3] = accT[pl.ds(ti, _TI), 2:3] + jnp.sum(
            iz, 1, keepdims=True
        ) * s_i
        # torque: tau_i = (-n r_i) x imp -> -r_i (n x imp)
        qx = ny * iz - nz * iy
        qy = nz * ix - nx * iz
        qz = nx * iy - ny * ix
        w_i = ii_i * curT[pl.ds(ti, _TI), 11:12] * (-r_i)
        accT[pl.ds(ti, _TI), 3:4] = accT[pl.ds(ti, _TI), 3:4] + jnp.sum(
            qx, 1, keepdims=True
        ) * w_i
        accT[pl.ds(ti, _TI), 4:5] = accT[pl.ds(ti, _TI), 4:5] + jnp.sum(
            qy, 1, keepdims=True
        ) * w_i
        accT[pl.ds(ti, _TI), 5:6] = accT[pl.ds(ti, _TI), 5:6] + jnp.sum(
            qz, 1, keepdims=True
        ) * w_i
        # cf row sums (normal impulse only)
        accT[pl.ds(ti, _TI), 6:7] = accT[pl.ds(ti, _TI), 6:7] + jnp.sum(
            dlam * nx, 1, keepdims=True
        )
        accT[pl.ds(ti, _TI), 7:8] = accT[pl.ds(ti, _TI), 7:8] + jnp.sum(
            dlam * ny, 1, keepdims=True
        )
        accT[pl.ds(ti, _TI), 8:9] = accT[pl.ds(ti, _TI), 8:9] + jnp.sum(
            dlam * nz, 1, keepdims=True
        )

        # j-side: column sums, -imp, mass-split by j's count
        s_j = im * cur[11:12, :]
        w_j = ii * cur[11:12, :] * (-rad)
        acc[0:1, :] = acc[0:1, :] - jnp.sum(ix, 0, keepdims=True) * s_j
        acc[1:2, :] = acc[1:2, :] - jnp.sum(iy, 0, keepdims=True) * s_j
        acc[2:3, :] = acc[2:3, :] - jnp.sum(iz, 0, keepdims=True) * s_j
        # tau_j = (n r_j) x (-imp) = -r_j (n x imp)
        acc[3:4, :] = acc[3:4, :] + jnp.sum(qx, 0, keepdims=True) * w_j
        acc[4:5, :] = acc[4:5, :] + jnp.sum(qy, 0, keepdims=True) * w_j
        acc[5:6, :] = acc[5:6, :] + jnp.sum(qz, 0, keepdims=True) * w_j
        acc[6:7, :] = acc[6:7, :] - jnp.sum(dlam * nx, 0, keepdims=True)
        acc[7:8, :] = acc[7:8, :] - jnp.sum(dlam * ny, 0, keepdims=True)
        acc[8:9, :] = acc[8:9, :] - jnp.sum(dlam * nz, 0, keepdims=True)
        return 0

    def iter_body(it, _):
        acc[:, :] = jnp.zeros((16, Fp), jnp.float32)
        accT[:, 0:9] = jnp.zeros((Fp, 9), jnp.float32)
        jax.lax.fori_loop(0, n_tiles, tile_pass, 0)

        aT = accT[:, :].T  # (16, Fp)
        vx = cur[0:1, :] + acc[0:1, :] + aT[0:1, :]
        vy = cur[1:2, :] + acc[1:2, :] + aT[1:2, :]
        vz = cur[2:3, :] + acc[2:3, :] + aT[2:3, :]
        ox = cur[3:4, :] + acc[3:4, :] + aT[3:4, :]
        oy = cur[4:5, :] + acc[4:5, :] + aT[4:5, :]
        oz = cur[5:6, :] + acc[5:6, :] + aT[5:6, :]
        cur[6:7, :] = cur[6:7, :] + acc[6:7, :] + aT[6:7, :]
        cur[7:8, :] = cur[7:8, :] + acc[7:8, :] + aT[7:8, :]
        cur[8:9, :] = cur[8:9, :] + acc[8:9, :] + aT[8:9, :]

        # ---- ground pass (sequential after the pair sweep) ----
        vrx = vx - (oy * pnz - oz * pny) * rad
        vry = vy - (oz * pnx - ox * pnz) * rad
        vrz = vz - (ox * pny - oy * pnx) * rad
        vng = vrx * pnx + vry * pny + vrz * pnz
        vn0g = cur[12:13, :] * pnx + cur[13:14, :] * pny + cur[14:15, :] * pnz
        bias_g = beta * h_inv * jnp.maximum(depth_g - slop, 0.0)
        rest_g = 0.5 * (re_r + pr)
        bounce_g = jnp.where(vn0g < -bounce_thresh, -rest_g * vn0g, 0.0)
        tvn_g = jnp.where(
            depth_g > slop,
            jnp.maximum(bias_g, bounce_g),
            (depth_g - slop) * h_inv,
        )
        k_ng = 1.0 / jnp.maximum(im, 1e-9)
        k_tg = 1.0 / jnp.maximum(im + rad * rad * ii, 1e-9)
        lg = cur[9:10, :]
        new_lg = jnp.maximum(lg + relax * k_ng * (tvn_g - vng), 0.0)
        dlg = jnp.where(active_g, new_lg - lg, 0.0)
        cur[9:10, :] = lg + dlg
        vtx = vrx - vng * pnx
        vty = vry - vng * pny
        vtz = vrz - vng * pnz
        vtn = jnp.maximum(jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz), 1e-9)
        itn = 1.0 / vtn
        mu_gr = 0.5 * (mu_r + pf)
        ltg = cur[10:11, :]
        new_ltg = jnp.minimum(ltg + relax * k_tg * vtn, mu_gr * cur[9:10, :])
        dltg = jnp.where(active_g, new_ltg - ltg, 0.0)
        cur[10:11, :] = ltg + dltg
        gx = dlg * pnx - dltg * vtx * itn
        gy = dlg * pny - dltg * vty * itn
        gz = dlg * pnz - dltg * vtz * itn
        sg = cur[11:12, :]
        cur[0:1, :] = vx + gx * im * sg
        cur[1:2, :] = vy + gy * im * sg
        cur[2:3, :] = vz + gz * im * sg
        # tau = (-n r) x imp_g
        cur[3:4, :] = ox + (pny * gz - pnz * gy) * (-rad) * ii * sg
        cur[4:5, :] = oy + (pnz * gx - pnx * gz) * (-rad) * ii * sg
        cur[5:6, :] = oz + (pnx * gy - pny * gx) * (-rad) * ii * sg

        curT[:, :] = cur[:, :].T
        return 0

    jax.lax.fori_loop(0, iters, iter_body, 0)

    out_ref[0, 0:6, :] = cur[0:6, :]
    # cf = normal impulses / h (pairs accumulated in rows 6-8) + ground
    out_ref[0, 6:7, :] = (cur[6:7, :] + cur[9:10, :] * pnx) * h_inv
    out_ref[0, 7:8, :] = (cur[7:8, :] + cur[9:10, :] * pny) * h_inv
    out_ref[0, 8:9, :] = (cur[8:9, :] + cur[9:10, :] * pnz) * h_inv
    out_ref[0, 9:16, :] = jnp.zeros((7, Fp), jnp.float32)
