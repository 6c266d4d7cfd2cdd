"""Native Simulator: the fast-path API bundling Scene + Stepper + pytrees.

This is what the batched envs use directly; the `gymapi` facade wraps it with
reference-compatible handle semantics. Replaces the reference's Sim handle +
tensor API (`prepare_sim`/`acquire_*`/`refresh_*`/`set_*` —
/root/reference/examples/franka_cube_ik_osc.py:286-346): here state is a
pytree attribute, acquire is attribute access, refresh happens inside step.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import dynamics
from ..physics.kinematics import body_jacobian, fk, jacobian as link_jacobian
from ..physics.step import Stepper
from .scene import Scene
from .state import Actions, PhysParams, SimState, zero_actions


class Simulator:
    def __init__(self, scene: Scene, state: SimState, params: PhysParams):
        self.scene = scene
        self.stepper = Stepper(scene)
        self.env_origins = jnp.asarray(scene.env_origins, jnp.float32)
        self.params = params
        # size the persistent warm-start impulse rows to the contact table
        # (opt-in: physx.warm_start_contacts)
        C = self.stepper.contact.num_contacts
        if C and scene.sim_params.physx.warm_start_contacts:
            n = state.root_pos.shape[0]
            state = state._replace(
                warm_n=jnp.zeros((n, C), jnp.float32),
                warm_t=jnp.zeros((n, C, 3), jnp.float32),
            )
        self.state = self.stepper.refresh_body_state(state, params)
        self.initial_state = self.state
        self.actions = zero_actions(
            scene.num_envs,
            scene.num_dofs_per_env,
            scene.num_bodies_per_env,
            num_attractors=len(scene.attractors),
        )
        if scene.attractors:
            ai = scene.attractor_init
            self.actions = self.actions._replace(
                attractor_target_pos=jnp.asarray(ai["target_pos"]),
                attractor_target_quat=jnp.asarray(ai["target_quat"]),
                attractor_enabled=jnp.ones(
                    ai["stiffness"].shape, dtype=bool
                ),
            )
        self._step_fn = jax.jit(self.stepper.step)

    # -- stepping -----------------------------------------------------------
    def step(self):
        self.state = self._step_fn(self.state, self.actions, self.params)

    def rollout(self, num_steps: int):
        self.state = jax.jit(self.stepper.rollout, static_argnums=3)(
            self.state, self.actions, self.params, num_steps
        )

    def reset(self, env_mask=None):
        """Snapshot-restore (the reference's get/set_sim_rigid_body_states
        checkpoint path — /root/reference/examples/1080_balls_of_solitude.py:150-158),
        optionally per-env."""
        if env_mask is None:
            self.state = self.initial_state
        else:
            m = jnp.asarray(env_mask)

            def sel(new, old):
                if new.ndim == 0:
                    return old
                mm = m.reshape(m.shape + (1,) * (new.ndim - 1))
                return jnp.where(mm, new, old)

            self.state = jax.tree.map(sel, self.initial_state, self.state)

    # -- tensor API equivalents --------------------------------------------
    @property
    def root_state(self):
        """Env-local (IsaacGym tensor semantics)."""
        return self.state.root_state_tensor(self.env_origins)

    @root_state.setter
    def root_state(self, tensor):
        self.state = self.state.with_root_state_tensor(
            jnp.asarray(tensor), self.env_origins
        )
        self.state = self.stepper.refresh_body_state(self.state, self.params)

    @property
    def dof_state(self):
        return self.state.dof_state_tensor()

    @dof_state.setter
    def dof_state(self, tensor):
        self.state = self.state.with_dof_state_tensor(jnp.asarray(tensor))
        self.state = self.stepper.refresh_body_state(self.state, self.params)

    @property
    def body_state(self):
        """Env-local (IsaacGym tensor semantics)."""
        return self.state.body_state_tensor(self.env_origins)

    @property
    def net_contact_force(self):
        n, b = self.state.contact_force.shape[:2]
        return self.state.contact_force.reshape(n * b, 3)

    def set_dof_position_targets(self, targets):
        self.actions = self.actions._replace(
            dof_pos_target=jnp.asarray(targets).reshape(
                self.scene.num_envs, self.scene.num_dofs_per_env
            )
        )

    def set_dof_velocity_targets(self, targets):
        self.actions = self.actions._replace(
            dof_vel_target=jnp.asarray(targets).reshape(
                self.scene.num_envs, self.scene.num_dofs_per_env
            )
        )

    def set_dof_actuation_forces(self, efforts):
        self.actions = self.actions._replace(
            dof_effort=jnp.asarray(efforts).reshape(
                self.scene.num_envs, self.scene.num_dofs_per_env
            )
        )

    def apply_body_forces(self, forces=None, torques=None, positions=None):
        a = self.actions
        shape = (self.scene.num_envs, self.scene.num_bodies_per_env, 3)
        if forces is not None:
            a = a._replace(body_force=jnp.asarray(forces).reshape(shape))
        if torques is not None:
            a = a._replace(body_torque=jnp.asarray(torques).reshape(shape))
        if positions is not None:
            a = a._replace(
                body_force_pos=jnp.asarray(positions).reshape(shape),
                use_force_pos=jnp.ones((), bool),
            )
        self.actions = a

    # -- jacobian / mass matrix --------------------------------------------
    def _group_of_actor(self, actor_name: str):
        meta = self.scene.find_actor(actor_name)
        for gi, g in enumerate(self.scene.art_groups):
            if meta.slot in g.slots:
                return self.stepper.groups[gi], g, meta
        raise KeyError(f"{actor_name} is not an articulated actor")

    def _link_pose_fn(self, gi, copy, slot, didx):
        """state -> (pos, quat) of every sim link for one actor copy.
        Reuses the always-fresh body-state cache when all links are real
        bodies (no FK re-sweep); falls back to FK otherwise."""
        if bool(gi.link_is_real.all()):
            idx = jnp.asarray(gi.link_body_idx[copy])

            def fn(state: SimState):
                return state.body_pos[:, idx], state.body_quat[:, idx]

            return fn
        topo = gi.topo

        def fn(state: SimState):
            pos, quat, _, _ = fk(
                topo,
                state.root_pos[:, slot],
                state.root_quat[:, slot],
                state.root_linvel[:, slot],
                state.root_angvel[:, slot],
                state.dof_pos[:, didx],
                state.dof_vel[:, didx],
            )
            return pos, quat

        return fn

    def jacobian_fn(self, actor_name: str):
        """Returns a pure fn state -> jacobian tensor with IsaacGym layout:
        fixed base: (N, num_bodies-1, 6, D); floating: (N, num_bodies, 6, 6+D).
        Rows are [linear(3); angular(3)] of each body origin
        (/root/reference/examples/franka_cube_ik_osc.py:305-311)."""
        gi, g, meta = self._group_of_actor(actor_name)
        topo = gi.topo
        copy = list(g.slots).index(meta.slot)
        slot = meta.slot
        didx = jnp.asarray(gi.dof_idx[copy])
        real = [int(x) for x in gi.real_links]
        pose = self._link_pose_fn(gi, copy, slot, didx)

        def fn(state: SimState):
            pos, quat = pose(state)
            J = link_jacobian(topo, pos, quat)  # (N, Ls, 6, nv)
            J = J[:, jnp.asarray(real)]
            if topo.fixed_base:
                J = J[:, 1:]  # base row dropped, matching reference indexing
            return J

        return fn

    def body_jacobian_fn(self, actor_name: str, body_name: str):
        """Pure fn state -> (N, 6, nv) jacobian of one named body — the hot-loop
        variant (full-tensor jacobian_fn matches the reference layout)."""
        gi, g, meta = self._group_of_actor(actor_name)
        topo = gi.topo
        copy = list(g.slots).index(meta.slot)
        slot = meta.slot
        didx = jnp.asarray(gi.dof_idx[copy])
        body_idx = meta.asset.rigid_body_dict()[body_name]
        link = [int(l) for l, b in enumerate(gi.topo.body_of_link) if b == body_idx][0]
        pose = self._link_pose_fn(gi, copy, slot, didx)

        def fn(state: SimState):
            pos, quat = pose(state)
            return body_jacobian(topo, pos, quat, link)

        return fn

    def mass_matrix_fn(self, actor_name: str):
        """Pure fn (state[, params]) -> (N, D, D) joint-space mass matrix
        (fixed-base layout of acquire_mass_matrix_tensor).

        Consumes the RUNTIME body params (mass/com/inertia), so the exposed
        tensor agrees with the dynamics after domain randomization
        (randomize_body_mass) — the same gather physics/step.py does.
        `params` defaults to the simulator's current params."""
        gi, g, meta = self._group_of_actor(actor_name)
        topo = gi.topo
        copy = list(g.slots).index(meta.slot)
        slot = meta.slot
        didx = jnp.asarray(gi.dof_idx[copy])
        base = 0 if topo.fixed_base else 6
        pose = self._link_pose_fn(gi, copy, slot, didx)
        lbidx = jnp.asarray(gi.link_body_idx[copy])  # (Ls,) env body index
        is_real = jnp.asarray(gi.link_is_real)

        def fn(state: SimState, params=None):
            p = params if params is not None else self.params
            pos, quat = pose(state)
            mass_l = jnp.where(is_real, p.body_mass[:, lbidx], topo.mass)
            com_l = jnp.where(
                is_real[..., None], p.body_com[:, lbidx], topo.com
            )
            inert_l = jnp.where(
                is_real[..., None, None], p.body_inertia[:, lbidx], topo.inertia
            )
            M = dynamics.mass_matrix(
                topo, pos, quat, mass=mass_l, com=com_l, inertia=inert_l
            )
            return M[..., base:, base:]

        return fn

    def jacobian(self, actor_name: str):
        return jax.jit(self.jacobian_fn(actor_name))(self.state)

    def mass_matrix(self, actor_name: str):
        return jax.jit(self.mass_matrix_fn(actor_name))(self.state)


def make_sim(builder) -> Simulator:
    scene, state, params = builder.finalize()
    return Simulator(scene, state, params)
