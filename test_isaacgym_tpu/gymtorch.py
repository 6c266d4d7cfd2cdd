"""`gymtorch` equivalent: tensor-view interop (SURVEY.md N12).

The reference bridges CUDA sim buffers to torch with zero-copy pointer
wrapping (/root/reference/examples/interop_torch.py:131-149). Here the sim
state is JAX arrays; acquire_* returns a host-synced buffer handle and
`wrap_tensor` exposes it as a shared-memory torch (CPU) tensor so reference
scripts' torch math runs unchanged: refresh_* writes into the same memory the
torch view sees, set_* reads back from it.

The fast path does not use this module at all — batched envs work on the
state pytree directly (`core.Simulator`).
"""
from __future__ import annotations

import numpy as np


def wrap_tensor(handle):
    """acquire_* handle -> mutable torch tensor sharing the handle's buffer
    (falls back to the numpy buffer if torch is unavailable)."""
    buf = handle.buf if hasattr(handle, "buf") else np.asarray(handle)
    try:
        import torch

        return torch.from_numpy(buf)
    except Exception:
        return buf


def unwrap_tensor(tensor):
    """torch tensor (or numpy) -> raw buffer accepted by set_* calls."""
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)
