"""Pallas TPU kernels for the hot physics ops.

Each op ships two implementations with identical math: a fused Pallas TPU
kernel and a pure-jnp fallback (CPU meshes / shapes beyond the VMEM budget).
Dispatch happens inside each op on `jax.default_backend()`.
"""
from . import sphere_world

__all__ = ["sphere_world"]
