"""Nut-bolt SDF threading (SURVEY.md N9).

The reference screws an M4 nut down a bolt with PhysX SDF contact
(/root/reference/examples/franka_nut_bolt_ik_osc.py:41-236, 32 position
iterations :231). The capability under test: SDF thread contact converts a
driven rotation into descent at pitch/(2*pi) per radian.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_isaacgym_tpu.assets.sdf import (
    BoltSpec,
    bolt_sdf_fn,
    sdf_from_fn,
    sdf_from_mesh,
)


def test_bolt_grid_matches_analytic():
    """Voxel grid + trilinear interpolation reproduces the analytic thread
    profile: amplitude within 15% and exact flank slope at mid-flank."""
    spec = BoltSpec(scale=5.0)
    s = 5.0
    l, hh, hr = spec.length * s, spec.head_h * s, spec.head_r * s
    half_z = (l + hh) * 0.5
    fn = bolt_sdf_fn(spec)
    grid = sdf_from_fn(fn, (-hr, -hr, -half_z), (hr, hr, half_z))

    r = 0.5 * (spec.major_r + spec.minor_r) * s
    th = np.linspace(0, 2 * np.pi, 128, endpoint=False)
    z = 3.0 * spec.pitch * s - half_z + hh
    pts = np.stack(
        [r * np.cos(th), r * np.sin(th), np.full_like(th, z)], -1
    ).astype(np.float32)

    def tri(p):
        u = (p - grid.origin) / grid.spacing
        i0 = np.clip(np.floor(u).astype(int), 0, grid.data.shape[0] - 2)
        f = u - i0
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[:, 0] if dx else 1 - f[:, 0])
                        * (f[:, 1] if dy else 1 - f[:, 1])
                        * (f[:, 2] if dz else 1 - f[:, 2])
                    )
                    out = out + w * grid.data[
                        i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz
                    ]
        return out

    exact = fn(pts.copy())
    approx = tri(pts)
    assert np.ptp(approx) > 0.85 * np.ptp(exact)
    assert np.abs(approx - exact).max() < 0.25e-3  # < quarter thread depth


def test_sdf_probe_contact_depth():
    """K_PT_SDF narrowphase ground truth: a probe mesh vs an analytic box
    SDF recovers known penetration depth and outward normal (ADVICE r2)."""
    from test_isaacgym_tpu.assets import create_mesh_asset
    from test_isaacgym_tpu.core.config import SimParams
    from test_isaacgym_tpu.core.scene import SceneBuilder
    from test_isaacgym_tpu.core.sim import Simulator

    # unit box SDF (analytic), exact inside/outside
    def box_sdf(p, h=0.1):
        q = np.abs(p) - h
        outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
        inside = np.minimum(q.max(-1), 0.0)
        return outside + inside

    grid = sdf_from_fn(box_sdf, (-0.1, -0.1, -0.1), (0.1, 0.1, 0.1))
    # box mesh for the SDF carrier
    c = np.array(
        [[sx, sy, sz] for sx in (-0.1, 0.1) for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)],
        np.float32,
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
        np.int32,
    )
    carrier = create_mesh_asset(
        "sdfbox", c, faces, density=1000.0, sdf=grid, fix_base_link=True
    )
    # small tetra probe mesh dropped onto the box top
    tv = np.array(
        [[0, 0, -0.02], [0.02, 0, 0.02], [-0.02, 0.02, 0.02], [-0.02, -0.02, 0.02]],
        np.float32,
    )
    tf = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], np.int32)
    probe = create_mesh_asset("tetra", tv, tf, density=500.0)

    sp = SimParams(dt=1 / 120, substeps=2, gravity=(0.0, 0.0, -9.8))
    b = SceneBuilder(sp)
    b.create_env((-1, -1, 0), (1, 1, 1), 1)
    b.create_actor(0, carrier, pos=(0, 0, 0.5), name="box", group=0, filter=0)
    b.create_actor(0, probe, pos=(0, 0, 0.64), name="tetra", group=0, filter=0)
    sim = Simulator(*b.finalize())
    run = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 60))
    s = run(sim.state)
    tslot = sim.scene.find_actor("tetra").slot
    z = float(s.root_pos[0, tslot, 2])
    # rests with its lowest vertex on the box top: z approx 0.6 + 0.02
    assert abs(z - 0.62) < 5e-3
    assert float(jnp.abs(s.root_linvel[0, tslot]).max()) < 0.05


@pytest.mark.slow
def test_nut_threads_down():
    """240 steps at 1 rev/s (dt=1/120) must descend ~2*pitch, and identical
    envs must agree (the VERDICT r2 acceptance bar)."""
    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    env = NutBoltEnv(num_envs=2)
    run = jax.jit(env.rollout_fn(240))
    s = run(env.sim.state)
    z0 = np.asarray(env.nut_height(env.sim.state))
    z1 = np.asarray(env.nut_height(s))
    dz = z1 - z0
    expected = 2 * env.pitch * env.spin / (2 * np.pi)  # negative: descends
    assert expected < 0
    np.testing.assert_allclose(dz, expected, rtol=0.20)
    # envs at different world origins agree up to f32 coordinate noise
    assert abs(dz[0] - dz[1]) < 5e-4


def test_nut_bolt_bitwise_deterministic():
    """Co-located identical envs produce bitwise-identical trajectories
    (catches any cross-env leak in the contact pipeline)."""
    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    env = NutBoltEnv(num_envs=2, env_spacing=0.0)
    run = jax.jit(env.rollout_fn(60))
    s = run(env.sim.state)
    a = np.asarray(s.root_pos[0])
    b = np.asarray(s.root_pos[1])
    np.testing.assert_array_equal(a, b)


def test_analytic_vs_voxel_narrowphase_parity():
    """The r5 analytic-SDF fast path (recompute-over-gather, PERF_NOTES
    rule 5) must produce the same thread-contact physics as the voxel
    path it replaced: a short rollout of the SAME scene with the closed
    form stripped (forcing voxel trilinear + the bidirectional pairs the
    voxel policy keeps) stays within trilinear-interpolation error of the
    analytic single-direction run."""
    import test_isaacgym_tpu.assets.sdf as sdfmod
    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    def run(strip_analytic):
        orig = sdfmod.sdf_from_fn
        if strip_analytic:
            def patched(fn, lo, hi, resolution=sdfmod.SDF_RES, pad=3):
                return orig(fn, lo, hi, resolution, pad)._replace(
                    analytic=None
                )

            sdfmod.sdf_from_fn = patched
        try:
            import test_isaacgym_tpu.envs.nut_bolt as nb

            nb.sdf_from_fn = sdfmod.sdf_from_fn
            env = NutBoltEnv(num_envs=2)
            s = jax.jit(env.rollout_fn(30))(env.sim.state)
            return np.asarray(s.root_pos[:, env.nut_slot])
        finally:
            sdfmod.sdf_from_fn = orig
            import test_isaacgym_tpu.envs.nut_bolt as nb

            nb.sdf_from_fn = orig

    ana = run(strip_analytic=False)
    vox = run(strip_analytic=True)
    # 30 steps at dt=1/120: descent ~0.44 mm; the runs differ by BOTH
    # the field evaluation (exact vs trilinear, ~0.1 voxel) and the pair
    # policy (single analytic direction vs bidirectional), yet stay
    # within a millimeter-scale envelope before chaos amplifies
    np.testing.assert_allclose(ana, vox, atol=1e-3)
