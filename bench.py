#!/usr/bin/env python
"""Flagship benchmark: env-steps/s at 4096 Franka-arm envs with OSC control
(BASELINE.json metric). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is against the north-star target of 1M env-steps/s/host
(/root/repo/BASELINE.md — the reference repo publishes no numbers).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--smoke", action="store_true", help="tiny fast config")
    args = ap.parse_args()
    if args.smoke:
        args.num_envs, args.steps = 64, 10

    import jax

    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    env = FrankaOscEnv(num_envs=args.num_envs)
    run = jax.jit(env.rollout_fn(args.steps), donate_argnums=0)

    # warmup / compile
    state = run(env.sim.state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    env_steps_per_s = args.num_envs * args.steps / dt
    out = {
        "metric": f"env-steps/s @ {args.num_envs} Franka OSC envs (1 chip)",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / 1_000_000.0, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
