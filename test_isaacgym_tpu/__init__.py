"""test_isaacgym_tpu — a TPU-native vectorized rigid-body simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
wp133716/test_isaacgym (NVIDIA Isaac Gym Preview client scripts): batched
rigid-body + articulation physics, URDF/MJCF assets, DOF drives, task-space
controllers, camera sensors, terrain, and domain randomization — all as pure
pytree state stepped under jit, sharded over device meshes.

Entry points:
  - `test_isaacgym_tpu.gymapi`  : reference-compatible handle-based API facade
  - `test_isaacgym_tpu.core`    : native Scene/Simulator (the fast path)
  - `test_isaacgym_tpu.envs`    : batched env suite mirroring the reference tests
"""

__version__ = "0.1.0"

from . import math  # noqa: F401
