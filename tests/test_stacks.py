"""Solver stress: ball pyramids and large-mass-ratio box stacks.

Counterparts of /root/reference/examples/1080_balls_of_solitude.py:117-158
(4-layer ball pyramid per env, per-env collision groups) and
/root/reference/examples/large_mass_ratio.py:106-131 (5-box stack with 10x
density per level, substeps 6, 100 position iterations).
"""
import jax
import numpy as np
import pytest

from test_isaacgym_tpu.assets import create_box, create_sphere
from test_isaacgym_tpu.core.config import PlaneParams, SimParams
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.sim import Simulator


def _pyramid_scene(num_envs=2):
    """Reference pyramid: n=4 layers, radius 0.2, spacing 2.5r (Z-up port)."""
    sp = SimParams(dt=1 / 60, substeps=2)
    sp.physx.num_position_iterations = 4
    sp.physx.num_velocity_iterations = 1
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    ball = create_sphere(0.2, density=500.0)
    rng = np.random.RandomState(17)
    count = 0
    for i in range(num_envs):
        b.create_env((-1.25, -1.25, 0), (1.25, 1.25, 1.25), max(int(np.sqrt(num_envs)), 1))
        n = 4
        spacing = 2.5 * 0.2
        min_coord = -0.5 * (n - 1) * spacing
        z = min_coord + 4 * spacing
        while n > 0:
            y = min_coord
            for j in range(n):
                x = min_coord
                for k in range(n):
                    b.create_actor(
                        i, ball, pos=(x, y, 1.5 + z - 4 * spacing + 0.6),
                        name=f"ball{count}", group=i, filter=0,
                    )
                    count += 1
                    x += spacing
                y += spacing
            z += spacing
            n -= 1
            min_coord = -0.5 * (n - 1) * spacing
    return Simulator(*b.finalize())


def test_ball_pyramid_settles():
    sim = _pyramid_scene(num_envs=2)
    assert sim.scene.num_bodies_per_env == 30  # 16+9+4+1
    step = jax.jit(sim.stepper.step)
    st = sim.state
    for _ in range(420):
        st = step(st, sim.actions, sim.params)
    z = np.asarray(st.root_pos)[..., 2]
    v = np.asarray(st.root_linvel)
    # every ball rests at or above ground-supported height, nothing tunnels
    assert (z > 0.19).all(), z.min()
    assert (z < 2.0).all(), z.max()  # nothing launched
    # the PILE is calm (balls may still roll — no rolling friction — and a
    # straggler can still be dropping off the scatter edge at a knife-edge
    # seed: the outcome of one marginal contact flips under any float
    # reordering, so the assertion is on the ensemble, not every ball)
    vz = np.abs(v[..., 2])
    assert (vz < 0.5).mean() > 0.92, (vz.max(), (vz < 0.5).mean())
    assert vz.max() < 4.0, vz.max()  # nothing energetically bouncing


@pytest.mark.slow
def test_large_mass_ratio_stack():
    """5-box stack, 10x density per level (1..10^4 kg/m^3): stays standing
    for 300 steps (reference: substeps 6, 100 position iterations)."""
    sp = SimParams(dt=1 / 60, substeps=6)
    sp.physx.num_position_iterations = 100
    sp.physx.num_velocity_iterations = 0
    sp.physx.rest_offset = 0.001
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    size = 0.5
    disp = 0.002
    density = 1.0
    assets = []
    for _ in range(5):
        assets.append(create_box(size, size, size, density=density))
        density *= 10.0
    for i in range(2):
        b.create_env((-2, -2, 0), (2, 2, 4), 2)
        for k, a in enumerate(assets):
            b.create_actor(
                i, a, pos=(0, 0, 0.5 * size + (size + disp) * k + 0.001),
                name=f"box{k}", group=i, filter=0,
            )
    sim = Simulator(*b.finalize())
    step = jax.jit(sim.stepper.step)
    st = sim.state
    for _ in range(300):
        st = step(st, sim.actions, sim.params)
    pos = np.asarray(st.root_pos)  # (N, 5, 3), world coords
    pos = pos - np.asarray(sim.scene.env_origins)[:, None, :]  # env-local
    z = pos[..., 2]
    expect = np.array([0.25 + 0.502 * k for k in range(5)])
    # stack stands: ordered, centered, and near its rest heights. The
    # velocity-level Jacobi solve leaves a sustained ~7 cm penetration at
    # the bottom box (it bears a 1389 kg column at 5 decades of mass
    # ratio); a position-level projection pass would tighten this.
    assert np.abs(z - expect).max() < 0.15, z
    assert np.abs(pos[..., :2]).max() < 0.25, pos[..., :2]
    assert (np.diff(z, axis=-1) > 0.3).all(), z  # strictly ordered stack
    v = np.abs(np.asarray(st.root_linvel)).max()
    assert v < 0.3, v


@pytest.mark.slow
def test_uniform_stack_warm_start_low_iters():
    """Cross-step warm starting (physx.warm_start_contacts) lets a uniform
    5-box stack stand at num_position_iterations=4 with LESS penetration
    than the cold solver — VERDICT r2 item 10's acceptance scenario. The
    impulses persist in SimState keyed by static contact row; separation
    zeroes them (the solver's `active` gate)."""

    def build(warm):
        sp = SimParams(dt=1 / 60, substeps=2)
        sp.physx.num_position_iterations = 4
        sp.physx.num_velocity_iterations = 1
        sp.physx.warm_start_contacts = warm
        b = SceneBuilder(sp)
        b.add_ground(PlaneParams())
        size = 0.5
        box = create_box(size, size, size, density=500.0)
        b.create_env((-2, -2, 0), (2, 2, 4), 1)
        for k in range(5):
            b.create_actor(
                0, box, pos=(0, 0, 0.25 + (size + 0.002) * k + 0.001),
                name=f"box{k}", group=0, filter=0,
            )
        return Simulator(*b.finalize())

    def run(sim):
        step = jax.jit(sim.stepper.step)
        st = sim.state
        for _ in range(300):
            st = step(st, sim.actions, sim.params)
        return st

    sim_w = build(True)
    assert sim_w.state.warm_n is not None  # persistent rows allocated
    st_w = run(sim_w)
    st_c = run(build(False))
    expect = np.array([0.25 + 0.502 * k for k in range(5)])

    z_w = np.asarray(st_w.root_pos)[0, :, 2]
    z_c = np.asarray(st_c.root_pos)[0, :, 2]
    # warm stack stands upright and close to rest heights (measured: 2.4 cm
    # worst error vs 7.6 cm cold; residual ~0.5 m/s jitter on one box is the
    # warm/bias interplay — bounded, not divergent)
    assert np.abs(z_w - expect).max() < 0.05, z_w
    assert np.abs(np.asarray(st_w.root_linvel)).max() < 0.8
    # and it beats the cold solver's sag
    assert np.abs(z_w - expect).max() < np.abs(z_c - expect).max(), (z_w, z_c)
