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


def make_2d_mesh(dcn: Optional[int] = None, ici: Optional[int] = None, devices=None) -> Mesh:
    """2-D ('dcn', 'ici') mesh: slow DCN links across hosts/slices as the
    OUTER axis, fast ICI within a slice as the inner one. jax.make_mesh
    orders devices so the last mesh axis varies fastest — exactly the
    layout that keeps env-shard collectives riding ICI (scaling-book
    recipe). Env arrays shard over BOTH axes (see env_specs axis tuple)."""
    devices = devices if devices is not None else jax.devices()
    if dcn is None:
        dcn = max(getattr(jax, "process_count", lambda: 1)(), 1)
    if ici is None:
        ici = len(devices) // dcn
    assert dcn * ici == len(devices), (dcn, ici, len(devices))
    return jax.make_mesh((dcn, ici), ("dcn", "ici"), devices=devices)


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Multi-host entry: initialize the JAX distributed runtime.

    On a real pod each host calls this once before building envs (args or
    the standard JAX_COORDINATOR_ADDRESS/... env vars); single-process runs
    are a no-op so the same script works 1-host and N-host."""
    if num_processes in (None, 1) and coordinator is None and not any(
        k in __import__("os").environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_env_tree(tree, mesh: Mesh, num_envs: int, axis="env"):
    """Multi-process variant of shard_env_tree: build GLOBAL arrays over a
    mesh that spans processes. Every process passes the identical full-size
    host tree (env construction is deterministic); each only materializes
    its addressable shards (jax.make_array_from_callback slices the host
    array per local device). Works unchanged in single-process runs."""

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx, x=x: x[idx]
        )

    return jax.tree.map(place, tree)


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
    """Host-side reshard of per-env observations to every device. For the
    IN-PROGRAM collective (the north star's learner gather) use
    gather_obs / rollout_with_obs below — this helper is for one-off host
    reads outside a jitted region."""
    return jax.device_put(
        obs, NamedSharding(mesh, P(*([None] * obs.ndim)))
    )


def gather_obs(obs, axis="env"):
    """IN-PROGRAM learner gather: all_gather per-env observations across the
    env shards, inside a shard_map body. obs (n_local, ...) -> (N, ...)
    replicated on every shard. `axis` may be a tuple (('dcn','ici')) for a
    2-D mesh — XLA lowers it to an ICI all-gather within slices plus a DCN
    exchange across them."""
    return jax.lax.all_gather(obs, axis, axis=0, tiled=True)


def rollout_with_obs(step_fn, obs_fn, mesh: Mesh, state, actions, params, num_steps: int, axis="env"):
    """Sharded rollout with an in-program learner gather each step:

        carry -> scan(step; obs = obs_fn(state); all_gather(obs)) -> (state, obs_traj)

    Returns a jitted fn(state, actions, params) -> (final_state,
    (num_steps, N, ...) replicated obs) — the exact 'sim shards produce,
    learner consumes' loop of BASELINE.json, with the gather riding the
    mesh collectives instead of host transfers."""
    n = state.root_pos.shape[0]
    s_spec = env_specs(state, n, axis)
    a_spec = env_specs(actions, n, axis)
    p_spec = env_specs(params, n, axis)

    def sharded(state, actions, params):
        def body(carry, _):
            nxt = step_fn(carry, actions, params)
            obs = gather_obs(obs_fn(nxt), axis)
            return nxt, obs

        return jax.lax.scan(body, state, None, length=num_steps)

    f = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(s_spec, a_spec, p_spec),
        out_specs=(s_spec, P()),
        check_vma=False,
    )
    return jax.jit(f)


def psum_metrics(tree, mesh: Mesh, axis: str = "env"):
    """Cross-shard scalar reduction for telemetry inside shard_map regions."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)
