"""Shared helpers for the headless example scripts."""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import test_isaacgym_tpu  # noqa: F401, E402  (selects backend before jax init)


def example_args(description: str, **extra_ints):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--steps", type=int, default=extra_ints.pop("steps", 120))
    p.add_argument("--num-envs", type=int, default=extra_ints.pop("num_envs", 4))
    for k, v in extra_ints.items():
        p.add_argument(f"--{k.replace('_', '-')}", type=int, default=v)
    return p.parse_args()


def check(ok: bool, msg: str):
    print(("PASS " if ok else "FAIL ") + msg)
    if not ok:
        sys.exit(1)
