"""Golden-trajectory parity harness (BASELINE.json correctness bar; SURVEY §4).

The reference offers no automated tests — its "tests" are run-and-inspect
scripts under fixed seeds (np.random.seed(17) 1080_balls:91, seed(42)
franka_cube_ik_osc.py:83). The operational equivalent here: committed `.npz`
trajectory snapshots under fixed seeds, asserted per-frame. These freeze
today's behavior against refactor regressions (the round-2 lesson).

Regeneration requires an EXPLICIT opt-in:
    TIG_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
Each regenerated test SKIPS (so a regen run can never silently "pass").
"""
import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _check(name: str, arrays: dict, atol: float = 1e-4):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if os.environ.get("TIG_REGEN_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
        pytest.skip(f"regenerated golden {name}")
    assert os.path.exists(path), (
        f"golden {name} missing — run with TIG_REGEN_GOLDENS=1 to record"
    )
    ref = np.load(path)
    assert set(ref.files) == set(arrays.keys())
    for k in ref.files:
        got = np.asarray(arrays[k])
        want = ref[k]
        assert got.shape == want.shape, f"{name}/{k}: {got.shape} vs {want.shape}"
        scale = max(float(np.abs(want).max()), 1.0)
        err = float(np.abs(got - want).max())
        assert err <= atol * scale, (
            f"{name}/{k}: max |err| {err:.3e} > {atol:.0e} * scale {scale:.3g}"
        )


def _chunked(step_chunk, state, chunks, extract):
    frames = [extract(state)]
    for _ in range(chunks):
        state = step_chunk(state)
        frames.append(extract(state))
    return {
        k: np.stack([f[k] for f in frames]) for k in frames[0]
    }


def test_golden_uav_car():
    """UAV-car CCLVF pursuit + pixel servo (test06/test10 scene), 16 envs,
    300 steps sampled every 15."""
    from test_isaacgym_tpu.envs.uav_car import UavCarEnv

    env = UavCarEnv(num_envs=16)
    chunk = jax.jit(lambda s: env.rollout(15, s)[0])

    def extract(s):
        return {
            "uav_pos": np.asarray(s.sim.root_pos[:, env.uav_slot]),
            "car_pos": np.asarray(s.sim.root_pos[:, env.car_slot]),
            "uav_quat": np.asarray(s.sim.root_quat[:, env.uav_slot]),
        }

    _check("uav_car", _chunked(chunk, env.init_state, 20, extract))


def test_golden_franka_osc_circle():
    """Franka OSC circle tracking (franka_osc.py), 8 envs, 200 steps / 10."""
    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    env = FrankaOscEnv(num_envs=8)
    chunk = jax.jit(env.rollout_fn(10))

    def extract(s):
        return {
            "hand_pos": np.asarray(s.body_pos[:, env.hand_body]),
            "dof_pos": np.asarray(s.dof_pos),
        }

    _check("franka_osc", _chunked(chunk, env.sim.state, 20, extract))


def test_golden_balls_drop():
    """Ball-pyramid drop (1080_balls_of_solitude seeds 17), 4 pyramids,
    120 steps / 10."""
    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=1, pyramids=4)
    chunk = jax.jit(env.rollout_fn(10))

    def extract(s):
        return {"pos": np.asarray(s.root_pos[0])}

    _check("balls_drop", _chunked(chunk, env.sim.state, 12, extract))


@pytest.mark.slow
def test_golden_franka_cube_grasp():
    """Franka cube grasp-lift timeline (franka_cube_ik_osc.py seed 42),
    4 envs, 150 steps / 15."""
    from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

    env = FrankaCubeEnv(num_envs=4, controller="ik")
    chunk = jax.jit(lambda s: env.rollout(15, s)[0])

    def extract(s):
        return {
            "box_pos": np.asarray(s.sim.root_pos[:, env.box_slot]),
            "dof_pos": np.asarray(s.sim.dof_pos),
        }

    _check("franka_cube_grasp", _chunked(chunk, env.init_state, 10, extract))


def test_golden_nut_bolt_thread():
    """Nut threading descent profile, 2 envs, 120 steps / 20.

    atol is LOOSER than the other goldens: SDF thread contact is chaotic —
    a single-ulp difference from XLA fusion reordering (compiler flags, op
    restructuring that is bitwise-identical under one config) grows
    exponentially to ~1e-3 by step 110 (round-4 adjudication of the r3
    red suite: old/new narrowphase bitwise-equal for 120 steps under one
    flag set, 1.2e-3 apart across flag sets). 5e-3 still catches real
    physics changes — wrong descent is ~1e-2/s, penetration ~1e-2."""
    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    env = NutBoltEnv(num_envs=2)
    chunk = jax.jit(env.rollout_fn(20))

    def extract(s):
        return {"nut_state": np.asarray(s.root_pos[:, env.nut_slot])}

    _check("nut_bolt", _chunked(chunk, env.sim.state, 6, extract), atol=5e-3)


def test_golden_nut_bolt_thread_short():
    """SHORT-horizon nut threading golden at the TIGHT tolerance (VERDICT
    r4 item 5 / ADVICE r4): 24 steps is before SDF-contact chaos amplifies
    ulp-level reordering (the 120-step profile above needs 5e-3 by step
    ~110), so solver-math regressions are caught at 1e-4 where the long
    golden would absorb them."""
    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    env = NutBoltEnv(num_envs=2)
    chunk = jax.jit(env.rollout_fn(8))

    def extract(s):
        return {
            "nut_state": np.asarray(s.root_pos[:, env.nut_slot]),
            "nut_quat": np.asarray(s.root_quat[:, env.nut_slot]),
        }

    _check(
        "nut_bolt_short", _chunked(chunk, env.sim.state, 3, extract),
        atol=1e-4,
    )
