#!/usr/bin/env python
"""Benchmarks. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N,
   "extra": {...}}

Flagship metric (BASELINE.json): env-steps/s at 4096 Franka-arm envs with
OSC control; vs_baseline is against the 1M env-steps/s/host north star
(/root/repo/BASELINE.md — the reference repo publishes no numbers).

`extra` carries the contact-rich configs:
  * franka_cube@N  — Franka grasp-lift envs (table + cube + two-way
    articulated contact), env-steps/s
  * balls1080      — 1080 free balls in ONE collision world (dense
    sphere-world Pallas path), ball-steps/s

Run a single config with --config {franka,franka_cube,balls1080}.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _bench_franka(num_envs, steps):
    import jax

    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    env = FrankaOscEnv(num_envs=num_envs)
    run = jax.jit(env.rollout_fn(steps), donate_argnums=0)
    state = run(env.sim.state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def _bench_franka_cube(num_envs, steps):
    import jax

    from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

    env = FrankaCubeEnv(num_envs=num_envs, controller="osc")
    run = jax.jit(lambda s: env.rollout(steps, s)[0])
    state = run(env.init_state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def _bench_balls(steps):
    """1080 balls, one world. Steps via repeated jit(step): the Pallas
    sphere-world kernel inside a long lax.scan tickles a pathological
    XLA:TPU loop pass (minutes of compile); the per-step dispatch is
    fully pipelined (~0.08 ms/step measured), so a Python loop is the
    honest fast path here."""
    import jax

    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=1, pyramids=36)
    st = env.sim.stepper
    f = jax.jit(st.step)
    s = f(env.sim.state, env.sim.actions, env.sim.params)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = f(s, env.sim.actions, env.sim.params)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    return env.balls_per_world * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument(
        "--config",
        choices=["all", "franka", "franka_cube", "balls1080"],
        default="all",
    )
    ap.add_argument("--smoke", action="store_true", help="tiny fast config")
    args = ap.parse_args()
    if args.smoke:
        args.num_envs, args.steps = 64, 10

    extra = {}
    flagship = None
    if args.config in ("all", "franka"):
        flagship = _bench_franka(args.num_envs, args.steps)
    if args.config in ("all", "franka_cube"):
        n = min(args.num_envs, 4096)
        extra[f"franka_cube@{n} env-steps/s"] = round(
            _bench_franka_cube(n, max(args.steps // 2, 5)), 1
        )
    if args.config in ("all", "balls1080"):
        extra["balls1080 ball-steps/s"] = round(
            _bench_balls(steps=50 if args.smoke else 400), 1
        )

    if flagship is None:  # single non-flagship config: report it as main
        key, val = next(iter(extra.items()))
        out = {"metric": key, "value": val, "unit": key.split()[-1],
               "vs_baseline": round(val / 1_000_000.0, 4)}
    else:
        out = {
            "metric": f"env-steps/s @ {args.num_envs} Franka OSC envs (1 chip)",
            "value": round(flagship, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(flagship / 1_000_000.0, 4),
        }
        if extra:
            out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
