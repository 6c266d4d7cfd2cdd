"""Small linalg helpers that stay sharding-friendly under GSPMD."""
from __future__ import annotations

import jax.numpy as jnp


def binv(a):
    """Batched matrix inverse via solve with an identity RHS that inherits the
    operand's sharding (jnp.linalg.inv builds a replicated identity, which
    breaks vmap sharding checks when `a` is sharded over a device mesh)."""
    n = a.shape[-1]
    eye = jnp.zeros_like(a) + jnp.eye(n, dtype=a.dtype)
    return jnp.linalg.solve(a, eye)
