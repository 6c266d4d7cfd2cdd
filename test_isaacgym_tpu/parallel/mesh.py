"""Multi-chip env-axis sharding.

The reference has exactly one parallelism axis — the env batch (SURVEY.md
§2.4) — and no distributed backend. Here envs shard over a device mesh
('env' axis = dp over ICI within a slice, dcn across slices when 2-D); every
state/action/param array has the env batch as its leading axis, the step
function is elementwise over envs, so GSPMD propagates the sharding with zero
collectives inside the hot loop. Observation gathers to a learner become
explicit all_gathers at the loop boundary (obs_gather).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(devices=None, axis: str = "env") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return jax.make_mesh((len(devices),), (axis,), devices=devices)


def shard_env_tree(tree, mesh: Mesh, num_envs: int, axis: str = "env"):
    """Place every leaf whose leading dim == num_envs on the env axis;
    replicate everything else (gravity vector, scalars, clocks)."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def env_specs(tree, num_envs: int, axis: str = "env"):
    """PartitionSpec pytree: env-leading leaves on `axis`, rest replicated."""

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return P(axis, *([None] * (x.ndim - 1)))
        return P()

    return jax.tree.map(spec, tree)


def shard_step(step_fn, mesh: Mesh, state, actions, params, axis: str = "env"):
    """Wrap a step(state, actions, params) -> state in shard_map over the env
    axis. The per-shard program contains no collectives (envs are independent),
    so compile cost equals the single-device compile — this is the multi-chip
    fast path (GSPMD propagation over the large unrolled physics graph is far
    slower to compile)."""
    n = state.root_pos.shape[0]
    s_spec = env_specs(state, n, axis)
    a_spec = env_specs(actions, n, axis)
    p_spec = env_specs(params, n, axis)
    f = jax.shard_map(
        step_fn, mesh=mesh, in_specs=(s_spec, a_spec, p_spec), out_specs=s_spec
    )
    return jax.jit(f)


def obs_gather(obs, mesh: Mesh, axis: str = "env"):
    """All-gather per-env observations to every device (learner-side gather
    of the north star). obs: (N, ...) sharded -> fully replicated."""
    return jax.device_put(
        obs, NamedSharding(mesh, P(*([None] * obs.ndim)))
    )


def psum_metrics(tree, mesh: Mesh, axis: str = "env"):
    """Cross-shard scalar reduction for telemetry inside shard_map regions."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)
