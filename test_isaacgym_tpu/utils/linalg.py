"""Small batched linear algebra, TPU-first.

XLA's batched LU/Cholesky (`jnp.linalg.solve`) lowers to a sequential
column-loop with dynamic slicing — catastrophic for the tiny (3x3..9x9)
systems articulated dynamics needs at 4k+ env batch (measured ~10ms for one
(4096,9,9) LU solve on a v5e chip). Every system in the simulator is SPD
(mass matrices, JM^-1J^T operational-space inertias, world-frame rotational
inertias, soft-constraint Schur complements), so we unroll a batched Cholesky
at trace time: each matrix entry becomes one (batch,) vector and the O(n^3)
recurrence becomes a few hundred fused elementwise ops — two orders of
magnitude faster, and sharding-transparent (no replicated identities, no
dynamic slices).
"""
from __future__ import annotations

import jax.numpy as jnp

_UNROLL_MAX = 24


def _chol_unrolled(A):
    """Unrolled batched Cholesky. Returns (L, rinv): L[i][j] (i>=j) and
    1/L[j][j], each a (batch,) array."""
    n = A.shape[-1]
    a = [[A[..., i, j] for j in range(i + 1)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    rinv = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        r = 1.0 / d
        rinv[j] = r
        for i in range(j + 1, n):
            t = a[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * r
    return L, rinv


def spd_solve(A, B):
    """Solve A X = B for SPD A, batched over arbitrary leading axes.

    A: (..., n, n); B: (..., n) or (..., n, k). Unrolled Cholesky for
    n <= _UNROLL_MAX, else falls back to jnp.linalg.solve.
    """
    n = A.shape[-1]
    if n > _UNROLL_MAX:
        if B.ndim == A.ndim - 1:
            return jnp.linalg.solve(A, B[..., None])[..., 0]
        return jnp.linalg.solve(A, B)
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    L, rinv = _chol_unrolled(A)
    b = [B[..., i, :] for i in range(n)]
    y = [None] * n
    for i in range(n):
        t = b[i]
        for k in range(i):
            t = t - L[i][k][..., None] * y[k]
        y[i] = t * rinv[i][..., None]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i][..., None] * x[k]
        x[i] = t * rinv[i][..., None]
    X = jnp.stack(x, axis=-2)
    return X[..., 0] if vec else X


def spd_inv(A):
    """Batched SPD inverse via unrolled Cholesky solve against identity
    (identity built with the operand's sharding — replicated-eye-free)."""
    n = A.shape[-1]
    eye = jnp.zeros_like(A) + jnp.eye(n, dtype=A.dtype)
    if n > _UNROLL_MAX:
        return jnp.linalg.solve(A, eye)
    return spd_solve(A, eye)


# Historical name: every inverse in the simulator is of an SPD operator.
binv = spd_inv
