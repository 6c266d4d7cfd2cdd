"""Simulation state and runtime-parameter pytrees.

The TPU-native replacement for the reference's CUDA tensor pipeline
(SURVEY.md N12): state IS the pytree — `acquire_*_tensor` becomes attribute
access, `refresh_*` is a no-op (body states are recomputed by `step`), and
`set_*` is functional replacement. Layouts match the reference tensors:

  root state row  = [pos(3), quat-xyzw(4), linvel(3), angvel(3)]   (N, A, 13)
  dof state row   = [pos, vel]                                      (N, D, 2)
  body state row  = like root                                       (N, B, 13)
  contact force   =                                                 (N, B, 3)

(/root/reference/test/test10_servo_vecenv.py:372-374,
 examples/franka_cube_ik_osc.py:323-326, test12_add_joint.py.py:131)

`PhysParams` holds everything the reference exposes through property setters
(DOF props, rigid-body/shape props, gravity) as device arrays with a leading
env axis so domain randomization is a pure array update.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SimState(NamedTuple):
    # actor roots (N, A, ...)
    root_pos: jax.Array
    root_quat: jax.Array
    root_linvel: jax.Array
    root_angvel: jax.Array
    # generalized joint coordinates (N, D)
    dof_pos: jax.Array
    dof_vel: jax.Array
    # derived rigid-body states (N, B, ...), refreshed by step()/forward_kinematics
    body_pos: jax.Array
    body_quat: jax.Array
    body_linvel: jax.Array
    body_angvel: jax.Array
    # net contact force per body (N, B, 3)
    contact_force: jax.Array
    # sim clock
    time: jax.Array  # scalar f32
    steps: jax.Array  # scalar i32
    # persistent contact impulses for CROSS-STEP warm starting of the static
    # contact table, keyed by static row id: (N, C) normal + (N, C, 3)
    # friction. C=0 until the Simulator sizes them to its contact table;
    # stale rows decay naturally (the solver masks by `active` on re-entry).
    warm_n: jax.Array = None
    warm_t: jax.Array = None
    # FEM soft-body vertex state (N, Vt, 3); None when the scene has no
    # `<fem>` links (physics/soft.py — SURVEY.md N11)
    soft_pos: jax.Array = None
    soft_vel: jax.Array = None

    @property
    def num_envs(self):
        return self.root_pos.shape[0]

    def root_state_tensor(self, origins=None):
        """(N*A, 13) view matching acquire_actor_root_state_tensor.

        Positions are env-LOCAL when `origins` (N, 3) is given — IsaacGym
        tensor-API semantics (the reference's franka_osc.py:144-147 compares
        rb_states against env-local get_rigid_transform poses)."""
        n, a = self.root_pos.shape[:2]
        pos = self.root_pos if origins is None else self.root_pos - origins[:, None, :]
        return jnp.concatenate(
            [pos, self.root_quat, self.root_linvel, self.root_angvel],
            axis=-1,
        ).reshape(n * a, 13)

    def body_state_tensor(self, origins=None):
        n, b = self.body_pos.shape[:2]
        pos = self.body_pos if origins is None else self.body_pos - origins[:, None, :]
        return jnp.concatenate(
            [pos, self.body_quat, self.body_linvel, self.body_angvel],
            axis=-1,
        ).reshape(n * b, 13)

    def dof_state_tensor(self):
        n, d = self.dof_pos.shape[:2] if self.dof_pos.ndim > 1 else (self.dof_pos.shape[0], 0)
        return jnp.stack([self.dof_pos, self.dof_vel], axis=-1).reshape(n * d, 2)

    def with_root_state_tensor(self, tensor, origins=None):
        """Functional set_actor_root_state_tensor (env-local in, if origins)."""
        n, a = self.root_pos.shape[:2]
        t = tensor.reshape(n, a, 13)
        if origins is not None:
            t = t.at[..., 0:3].add(origins[:, None, :])
        return self._replace(
            root_pos=t[..., 0:3],
            root_quat=t[..., 3:7],
            root_linvel=t[..., 7:10],
            root_angvel=t[..., 10:13],
        )

    def with_dof_state_tensor(self, tensor):
        n, d = self.dof_pos.shape
        t = tensor.reshape(n, d, 2)
        return self._replace(dof_pos=t[..., 0], dof_vel=t[..., 1])


class PhysParams(NamedTuple):
    """Runtime-mutable physical parameters, leading env axis N."""

    # per-DOF (N, D)
    dof_stiffness: jax.Array
    dof_damping: jax.Array
    dof_armature: jax.Array
    dof_friction: jax.Array
    dof_lower: jax.Array
    dof_upper: jax.Array
    dof_has_limits: jax.Array  # bool
    dof_max_effort: jax.Array
    dof_max_velocity: jax.Array
    dof_drive_mode: jax.Array  # int32; 0 none 1 pos 2 vel 3 effort
    # per-body (N, B)
    body_mass: jax.Array
    body_com: jax.Array  # (N, B, 3) in link frame
    body_inertia: jax.Array  # (N, B, 3, 3) about com, link frame
    body_disable_gravity: jax.Array  # bool (N, B)
    # per-shape (N, S)
    shape_friction: jax.Array
    shape_restitution: jax.Array
    # runtime shape geometry — sizes/offsets live here (not in the static
    # scene) so set_actor_scale and domain randomization are pure array
    # updates (/root/reference/examples/actor_scaling.py:126)
    shape_size: jax.Array  # (N, S, 3)
    shape_pos: jax.Array  # (N, S, 3) shape offset in link frame
    # per-attractor (N, T) — (/root/reference/examples/franka_attractor.py:89-94)
    attractor_stiffness: jax.Array
    attractor_damping: jax.Array
    attractor_force_limit: jax.Array
    # globals
    gravity: jax.Array  # (3,)
    # per-soft-instance FEM materials (N, S_soft); None without soft bodies.
    # set_actor_soft_materials is a pure update on these
    # (/root/reference/examples/soft_body.py:120-133 randomizes per env)
    soft_youngs: jax.Array = None
    soft_poissons: jax.Array = None
    soft_damping: jax.Array = None


class Actions(NamedTuple):
    """Per-step control inputs (the reference's set_dof_*_tensor /
    apply_*_force_tensors / attractor targets collapsed into one pytree)."""

    dof_pos_target: jax.Array  # (N, D)
    dof_vel_target: jax.Array  # (N, D)
    dof_effort: jax.Array  # (N, D)
    body_force: jax.Array  # (N, B, 3) ENV_SPACE (world axes)
    body_torque: jax.Array  # (N, B, 3)
    body_force_pos: jax.Array  # (N, B, 3) world application point offsets... (abs pos)
    use_force_pos: jax.Array  # bool scalar
    # attractors: (N, T, 7) pose targets + enable mask (N, T)
    attractor_target_pos: jax.Array
    attractor_target_quat: jax.Array
    attractor_enabled: jax.Array


def zero_actions(num_envs: int, num_dofs: int, num_bodies: int, num_attractors: int = 0):
    f = jnp.zeros
    return Actions(
        dof_pos_target=f((num_envs, num_dofs)),
        dof_vel_target=f((num_envs, num_dofs)),
        dof_effort=f((num_envs, num_dofs)),
        body_force=f((num_envs, num_bodies, 3)),
        body_torque=f((num_envs, num_bodies, 3)),
        body_force_pos=f((num_envs, num_bodies, 3)),
        use_force_pos=jnp.zeros((), dtype=bool),
        attractor_target_pos=f((num_envs, max(num_attractors, 0), 3)),
        attractor_target_quat=f((num_envs, max(num_attractors, 0), 4)),
        attractor_enabled=jnp.zeros((num_envs, max(num_attractors, 0)), dtype=bool),
    )
