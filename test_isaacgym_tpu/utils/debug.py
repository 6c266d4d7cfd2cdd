"""Debug mode (SURVEY.md §5.2).

The reference has no sanitizers at all — its tensor API's stale-view hazard
is handled purely by call-ordering convention (SURVEY §5.2; e.g.
/root/reference/test/test05_isaacgym_vel_batch.py:407-409). The functional
TPU design makes data races impossible, so the debug mode checks the
hazards that DO exist here:

  * non-finite state escaping a substep (solver blow-up, bad asset mass),
  * unintended buffer donation/aliasing (a jitted step mutating its input),
  * contact-table shape/dtype invariants drifting during a rewrite.

Enable with ``TIG_DEBUG=1`` in the environment. The per-substep finite
check runs INSIDE jit via `jax.debug.callback`, so it works under
`lax.scan` rollouts too; it raises FloatingPointError on the host with the
substep tag that produced the first non-finite value.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "enabled",
    "check_finite",
    "assert_contact_tables",
    "verify_step_purity",
]


def enabled() -> bool:
    return os.environ.get("TIG_DEBUG", "0") not in ("", "0")


def check_finite(tree, tag: str):
    """In-jit finite check over every floating leaf of `tree`. No-op cost
    when clean apart from one fused reduce; raises FloatingPointError on
    the host if any leaf went non-finite."""
    leaves = [
        l
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not leaves:
        return tree
    bad = functools.reduce(
        jnp.logical_or, [~jnp.all(jnp.isfinite(l)) for l in leaves]
    )

    def _raise(b):
        if bool(b):
            raise FloatingPointError(
                f"TIG_DEBUG: non-finite simulation state after {tag}"
            )

    jax.debug.callback(_raise, bad)
    return tree


def assert_contact_tables(point, normal, depth, num_envs, num_rows):
    """Trace-time static-shape invariants of the contact tables (the
    component-form layout the TPU solver depends on — docs/PERF_NOTES.md)."""
    assert point.shape == (num_envs, num_rows, 3), point.shape
    assert normal.shape == (num_envs, num_rows, 3), normal.shape
    assert depth.shape == (num_envs, num_rows), depth.shape
    assert depth.dtype == jnp.float32, depth.dtype


def verify_step_purity(stepper, state, actions, params):
    """Donation/aliasing check: a jitted step must not mutate its input
    buffers, and a donated step must equal the non-donated one bitwise.

    Returns the stepped state. Raises AssertionError on any violation."""
    f = jax.jit(stepper.step)
    base = f(state, actions, params)
    jax.block_until_ready(base)
    # re-running on the SAME input must be bitwise identical — if the first
    # call wrote through an aliased input buffer this diverges
    again = f(state, actions, params)
    don = jax.jit(stepper.step, donate_argnums=0)(state, actions, params)
    for name, a, b in (("purity", base, again), ("donation", base, don)):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        for la, lb in zip(fa, fb):
            if not np.array_equal(np.asarray(la), np.asarray(lb), equal_nan=True):
                raise AssertionError(
                    f"TIG_DEBUG: step not reproducible under {name} check"
                )
    return base
