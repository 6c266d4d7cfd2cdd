"""Flagship batched Franka env: OSC circle tracking, the minimum end-to-end
slice of SURVEY.md §7.2.6 and the bench workload of BASELINE.json
("env-steps/s/chip at 4096 Franka envs").

Mirrors /root/reference/examples/franka_osc.py: fixed-base Franka per env,
arm dofs in EFFORT mode driven by an OSC torque tracking a circle with the
hand, grippers in POS mode. Here the whole control+step loop is one jitted
scan over pure state.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import load_urdf
from ..assets.types import DOF_MODE_EFFORT, DOF_MODE_POS
from ..control.osc import orientation_error
from ..core.config import SimParams
from ..core.scene import SceneBuilder
from ..core.sim import Simulator
from ..core.state import SimState
from ..physics import dynamics
from ..physics.kinematics import fk, jacobian as link_jacobian
from ..utils.linalg import spd_solve

ASSET_ROOT = "/root/reference/assets"
FRANKA_URDF = "urdf/franka_description/robots/franka_panda.urdf"

# mid-range default pose (franka_osc.py:95-97 uses joint mids)
DEFAULT_DOF_POS = np.array(
    [0.0, 0.0, 0.0, -1.57, 0.0, 1.87, 0.0, 0.02, 0.02], np.float32
)


@dataclasses.dataclass
class FrankaOscEnv:
    num_envs: int = 256
    kp: float = 5.0
    kv: float = 2.0 * np.sqrt(5.0)  # franka_osc.py:189-190
    asset_root: str = ASSET_ROOT

    def __post_init__(self):
        sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
        asset = load_urdf(
            self.asset_root, FRANKA_URDF, fix_base_link=True, armature=0.01
        )
        asset.disable_gravity = True  # franka_osc.py:82
        b = SceneBuilder(sp)
        n_row = max(int(np.sqrt(self.num_envs)), 1)
        for i in range(self.num_envs):
            b.create_env((-1, -1, 0), (1, 1, 1), n_row)
            b.create_actor(i, asset, pos=(0, 0, 0), name="franka", group=i, filter=1)
        self.sim = Simulator(*b.finalize())
        scene = self.sim.scene

        # control properties: arm EFFORT, grippers POS (franka_osc.py:99-107)
        p = self.sim.params
        stiff = np.zeros((self.num_envs, 9), np.float32)
        damp = np.zeros((self.num_envs, 9), np.float32)
        mode = np.zeros((self.num_envs, 9), np.int32)
        mode[:, :7] = DOF_MODE_EFFORT
        mode[:, 7:] = DOF_MODE_POS
        stiff[:, 7:] = 800.0
        damp[:, 7:] = 40.0
        self.sim.params = p._replace(
            dof_stiffness=jnp.asarray(stiff),
            dof_damping=jnp.asarray(damp),
            dof_drive_mode=jnp.asarray(mode),
        )
        # default dof state
        q0 = jnp.tile(jnp.asarray(DEFAULT_DOF_POS), (self.num_envs, 1))
        self.sim.state = self.sim.state._replace(dof_pos=q0)
        self.sim.state = self.sim.stepper.refresh_body_state(
            self.sim.state, self.sim.params
        )
        self.sim.initial_state = self.sim.state

        meta = scene.find_actor("franka")
        self.hand_body = meta.body_start + asset.rigid_body_dict()["panda_hand"]
        self._jac_fn = self.sim.jacobian_fn("franka")
        self._hand_jac_fn = self.sim.body_jacobian_fn("franka", "panda_hand")
        self._mm_fn = self.sim.mass_matrix_fn("franka")
        self.hand_row = asset.rigid_body_dict()["panda_hand"] - 1  # fixed-base layout

        # initial hand pose defines the circle center (env-local + origins,
        # matching franka_osc.py's env-local init_pos + absolute sin/cos target)
        st = self.sim.state
        self.origins = jnp.asarray(scene.env_origins, jnp.float32)
        self.init_hand_pos = st.body_pos[:, self.hand_body]
        self.init_hand_quat = st.body_quat[:, self.hand_body]

        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------------
    def _control(self, state: SimState, itr, refs=None, params=None):
        """OSC torque for circle tracking (franka_osc.py:215-245 semantics).

        refs = (init_hand_pos, init_hand_quat, origins), passed explicitly so
        the function stays shard_map-able (no closed-over (N, .) constants);
        same for `params` (the runtime mass matrix gathers body params)."""
        init_hand_pos, init_hand_quat, origins = (
            refs if refs is not None
            else (self.init_hand_pos, self.init_hand_quat, self.origins)
        )
        j_eef = self._hand_jac_fn(state)[:, :, :7]  # (N, 6, 7)
        mm = self._mm_fn(state, params)  # (N, 9, 9)
        mm77 = mm[:, :7, :7]

        hand_pos = state.body_pos[:, self.hand_body]
        hand_quat = state.body_quat[:, self.hand_body]

        t = itr.astype(jnp.float32)
        pos_des = jnp.stack(
            [
                init_hand_pos[:, 0] - 0.1,
                origins[:, 1] + jnp.sin(t / 50.0) * 0.2,
                init_hand_pos[:, 2] + jnp.cos(t / 50.0) * 0.2,
            ],
            axis=-1,
        )
        orn_err = orientation_error(init_hand_quat, hand_quat)
        pos_err = self.kp * (pos_des - hand_pos)
        dpose = jnp.concatenate([pos_err, orn_err], axis=-1)

        jt = jnp.swapaxes(j_eef, -1, -2)
        m_eef_inv = j_eef @ spd_solve(mm77, jt)  # (N, 6, 6)
        dof_vel = state.dof_vel[:, :7]
        u = (
            jt @ spd_solve(m_eef_inv, self.kp * dpose)[..., None]
            - self.kv * (mm77 @ dof_vel[..., None])
        )[..., 0]
        effort = jnp.concatenate([u, jnp.zeros_like(u[:, :2])], axis=-1)
        pos_target = jnp.zeros_like(effort) + jnp.asarray(DEFAULT_DOF_POS)
        return effort, pos_target

    def _step_impl(self, state, actions, params, itr, refs=None):
        effort, pos_target = self._control(state, itr, refs, params)
        actions = actions._replace(dof_effort=effort, dof_pos_target=pos_target)
        return self.sim.stepper.step(state, actions, params)

    # ------------------------------------------------------------------
    def step(self):
        self.sim.state = self._step(
            self.sim.state, self.sim.actions, self.sim.params, self.sim.state.steps
        )

    def rollout_fn(self, num_steps: int):
        """Pure scan-rollout function for benchmarking/sharding:
        state -> state after num_steps control+physics steps."""
        stepper = self.sim.stepper
        actions = self.sim.actions
        params = self.sim.params

        def body(carry, _):
            state = carry
            state = self._step_impl(state, actions, params, state.steps)
            return state, None

        def run(state):
            out, _ = jax.lax.scan(body, state, None, length=num_steps)
            return out

        return run

    @property
    def hand_pos(self):
        return self.sim.state.body_pos[:, self.hand_body]

    def tracking_error(self, itr: int):
        t = float(itr)
        pos_des = np.stack(
            [
                np.asarray(self.init_hand_pos[:, 0]) - 0.1,
                np.asarray(self.origins[:, 1]) + np.sin(t / 50.0) * 0.2,
                np.asarray(self.init_hand_pos[:, 2]) + np.cos(t / 50.0) * 0.2,
            ],
            axis=-1,
        )
        return np.linalg.norm(np.asarray(self.hand_pos) - pos_des, axis=-1)
