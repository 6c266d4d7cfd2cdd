"""Domain randomization as pure functions over PhysParams / render state.

Replaces the reference's ad-hoc `random.uniform` loops
(/root/reference/examples/domain_randomization.py:163-197: every N frames —
random camera pose, per-body color+texture, light params, image dump) with
jax.random-keyed pure updates (SURVEY.md §7.2.10). Physics randomization
(masses, friction, gains) is a pure array update because every randomizable
quantity lives in PhysParams with a leading env axis.

All functions: (key, params, ...) -> new params; compose freely under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core.state import PhysParams


def _u(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


# -- physics ------------------------------------------------------------------
def randomize_shape_friction(key, params: PhysParams, lo=0.5, hi=1.5) -> PhysParams:
    return params._replace(
        shape_friction=_u(key, params.shape_friction.shape, lo, hi)
    )


def randomize_restitution(key, params: PhysParams, lo=0.0, hi=0.7) -> PhysParams:
    return params._replace(
        shape_restitution=_u(key, params.shape_restitution.shape, lo, hi)
    )


def randomize_body_mass(key, params: PhysParams, scale_lo=0.8, scale_hi=1.2) -> PhysParams:
    """Multiplicative mass scaling (inertia scales with mass)."""
    s = _u(key, params.body_mass.shape, scale_lo, scale_hi)
    return params._replace(
        body_mass=params.body_mass * s,
        body_inertia=params.body_inertia * s[..., None, None],
    )


def randomize_dof_gains(
    key, params: PhysParams, kp_scale=(0.8, 1.2), kd_scale=(0.8, 1.2)
) -> PhysParams:
    k1, k2 = jax.random.split(key)
    return params._replace(
        dof_stiffness=params.dof_stiffness * _u(k1, params.dof_stiffness.shape, *kp_scale),
        dof_damping=params.dof_damping * _u(k2, params.dof_damping.shape, *kd_scale),
    )


def randomize_gravity(key, params: PhysParams, scale=(0.9, 1.1)) -> PhysParams:
    return params._replace(gravity=params.gravity * _u(key, (), *scale))


def randomize_shape_scale(key, params: PhysParams, scale=(0.9, 1.1)) -> PhysParams:
    """Per-shape geometric scale (sizes + offsets), mass untouched — the
    visual/collision-size axis of DR."""
    s = _u(key, params.shape_size.shape[:2] + (1,), *scale)
    return params._replace(
        shape_size=params.shape_size * s, shape_pos=params.shape_pos * s
    )


# -- rendering ----------------------------------------------------------------
def randomize_colors(key, shape_color) -> jax.Array:
    """(N, S, 3) new albedos (domain_randomization.py:174-180)."""
    return _u(key, jnp.asarray(shape_color).shape, 0.05, 1.0)


def randomize_light(key) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(color, ambient, direction) like set_light_parameters randomization
    (domain_randomization.py:183-186, test02.1:351)."""
    k1, k2, k3 = jax.random.split(key, 3)
    color = _u(k1, (3,), 0.4, 1.0)
    ambient = _u(k2, (3,), 0.1, 0.5)
    d = jax.random.normal(k3, (3,))
    d = d.at[2].set(-jnp.abs(d[2]) - 0.5)  # from above
    return color, ambient, d / jnp.linalg.norm(d)


def randomize_camera_pose(
    key, num_envs: int, center, radius=(2.0, 4.0), height=(0.5, 2.5)
):
    """(pos (N,3), look_target (N,3)) random orbit poses around `center`
    (domain_randomization.py:169-172)."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = _u(k1, (num_envs,), 0.0, 2 * jnp.pi)
    r = _u(k2, (num_envs,), *radius)
    h = _u(k3, (num_envs,), *height)
    center = jnp.broadcast_to(jnp.asarray(center, jnp.float32), (num_envs, 3))
    pos = center + jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), h], -1)
    return pos, center


# -- composite ----------------------------------------------------------------
@dataclasses.dataclass
class DomainRandomizer:
    """Composable randomization schedule: `maybe(params, key, step)` applies
    the enabled randomizations every `interval` steps (the reference's
    every-100-frames pattern, domain_randomization.py:163)."""

    interval: int = 100
    friction: Optional[Tuple[float, float]] = (0.5, 1.5)
    restitution: Optional[Tuple[float, float]] = None
    mass_scale: Optional[Tuple[float, float]] = (0.8, 1.2)
    gain_scale: Optional[Tuple[float, float]] = None
    gravity_scale: Optional[Tuple[float, float]] = None

    def apply(self, key, params: PhysParams) -> PhysParams:
        keys = jax.random.split(key, 5)
        if self.friction is not None:
            params = randomize_shape_friction(keys[0], params, *self.friction)
        if self.restitution is not None:
            params = randomize_restitution(keys[1], params, *self.restitution)
        if self.mass_scale is not None:
            params = randomize_body_mass(keys[2], params, *self.mass_scale)
        if self.gain_scale is not None:
            params = randomize_dof_gains(keys[3], params, self.gain_scale, self.gain_scale)
        if self.gravity_scale is not None:
            params = randomize_gravity(keys[4], params, self.gravity_scale)
        return params

    def maybe(self, key, params: PhysParams, step) -> PhysParams:
        """jit-safe conditional application on the step counter."""
        do = (step % self.interval) == 0
        new = self.apply(key, params)
        return jax.tree.map(lambda a, b: jnp.where(do, a, b), new, params)
