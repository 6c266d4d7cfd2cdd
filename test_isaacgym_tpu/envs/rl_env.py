"""Gym-style vectorized RL wrapper: the isaacgymenvs.make surface.

Counterpart of /root/reference/common/capture_videos.py:6-31 — the RL stack
there wraps envs as `isaacgymenvs.make(task=..., num_envs=...)` with
`reset() -> obs`, `step(actions) -> (obs, reward, done, info)`,
`render(mode="rgb_array") -> (H, W, 3)`, `action_space.shape`, and
`is_vector_env`. Here the same surface fronts the native batched Simulator:
one jitted step runs control + physics for every env, and render() ray-casts
a viewer-style camera over env 0 (render/raster.py).

Tasks:
  * "Ant"    — nv_ant MJCF, floating base, torque-controlled joints,
               forward-velocity reward, fall termination + reset.
  * "Franka" — fixed-base arm, position-drive deltas, reach reward.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

ASSET_ROOT = "/root/reference/assets"


class _Space(NamedTuple):
    shape: tuple
    low: float
    high: float

    def sample(self, rng=None):
        rng = rng or np.random
        return rng.uniform(self.low, self.high, self.shape).astype(np.float32)


def make(
    seed: int = 0,
    task: str = "Ant",
    num_envs: int = 20,
    sim_device: str = "tpu",
    rl_device: str = "tpu",
    graphics_device_id: int = 0,
    headless: bool = True,
    multi_gpu: bool = False,
    virtual_screen_capture: bool = False,
    force_render: bool = False,
):
    """isaacgymenvs.make-shaped constructor (capture_videos.py:6-16);
    device arguments are accepted for surface parity — placement is jax's."""
    if task == "Ant":
        return AntVecEnv(num_envs=num_envs, seed=seed)
    if task == "Franka":
        return FrankaReachVecEnv(num_envs=num_envs, seed=seed)
    raise ValueError(f"unknown task {task!r} (have: Ant, Franka)")


@dataclasses.dataclass
class _VecEnvBase:
    num_envs: int = 20
    seed: int = 0
    is_vector_env: bool = True

    # -- gym surface --------------------------------------------------------
    def reset(self):
        self.state = self.sim.initial_state
        return np.asarray(self._obs(self.state))

    def step(self, actions):
        actions = jnp.asarray(np.asarray(actions, np.float32))
        self.state, obs, reward, done = self._step(self.state, actions)
        return (
            np.asarray(obs),
            np.asarray(reward),
            np.asarray(done),
            {},
        )

    def render(self, mode="rgb_array"):
        """Viewer-style image of env 0 (capture_videos.py:26-29)."""
        from ..render.raster import (
            render_camera_batch, shape_world_poses, tables_from_scene,
        )

        if getattr(self, "_rtables", None) is None:
            self._rtables = tables_from_scene(self.sim.scene)
        st = self.state
        sp, sq = shape_world_poses(st, self.sim.params, self._rtables, self.sim.scene)
        eye, target = self._camera()
        from ..render.camera import look_at_quat

        quat = look_at_quat(eye, target)
        rgba, _, _, _ = render_camera_batch(
            jnp.asarray(eye, jnp.float32)[None],
            jnp.asarray(quat, jnp.float32)[None],
            sp[:1],
            sq[:1],
            self.sim.params.shape_size[:1],
            self._rtables.kind,
            self._rtables.color,
            self._rtables.seg,
            np.array([0, 0, 1, 0], np.float32),
            np.array([-0.3, -0.3, -0.9], np.float32) / np.linalg.norm([0.3, 0.3, 0.9]),
            np.array([0.8, 0.8, 0.8], np.float32),
            np.array([0.25, 0.25, 0.25], np.float32),
            np.array([0.32, 0.45, 0.6], np.float32),
            90.0,
            width=320,
            height=240,
            far=100.0,
        )
        return np.asarray(rgba)[0, ..., :3]


class AntVecEnv(_VecEnvBase):
    """nv_ant locomotion: obs = [root h, root quat, lin/ang vel, dof pos/vel],
    reward = forward velocity + alive bonus - control cost, done on fall."""

    def __init__(self, num_envs=20, seed=0):
        super().__init__(num_envs=num_envs, seed=seed)
        from ..assets import load_mjcf
        from ..core.config import PlaneParams, SimParams
        from ..core.scene import SceneBuilder
        from ..core.sim import Simulator

        sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
        sp.physx.num_position_iterations = 4
        ant = load_mjcf(ASSET_ROOT, "mjcf/nv_ant.xml")
        b = SceneBuilder(sp)
        b.add_ground(PlaneParams())
        n_row = max(int(np.sqrt(num_envs)), 1)
        for i in range(num_envs):
            b.create_env((-2, -2, 0), (2, 2, 1), n_row)
            b.create_actor(i, ant, pos=(0, 0, 0.55), name="ant", group=i, filter=0)
        self.sim = Simulator(*b.finalize())
        meta = self.sim.scene.find_actor("ant")
        self.slot = meta.slot
        self.dof_sl = slice(meta.dof_start, meta.dof_start + meta.dof_count)
        self.nd = meta.dof_count
        p = self.sim.params
        self.sim.params = p._replace(
            dof_drive_mode=p.dof_drive_mode.at[:, self.dof_sl].set(3),  # EFFORT
            dof_max_effort=p.dof_max_effort.at[:, self.dof_sl].set(30.0),
        )
        self.action_space = _Space((self.nd,), -1.0, 1.0)
        self.observation_space = _Space((11 + 2 * self.nd,), -np.inf, np.inf)
        self.state = self.sim.initial_state
        self._step = jax.jit(self._step_impl)

    def _obs(self, st):
        return jnp.concatenate(
            [
                st.root_pos[:, self.slot, 2:3],
                st.root_quat[:, self.slot],
                st.root_linvel[:, self.slot],
                st.root_angvel[:, self.slot],
                st.dof_pos[:, self.dof_sl],
                st.dof_vel[:, self.dof_sl],
            ],
            axis=-1,
        )

    def _camera(self):
        root = np.asarray(self.state.root_pos[0, self.slot])
        return root + np.array([-1.5, -1.5, 1.0]), root

    def _step_impl(self, st, actions):
        a = self.sim.actions
        eff = jnp.clip(actions, -1, 1) * 30.0
        a = a._replace(dof_effort=a.dof_effort.at[:, self.dof_sl].set(eff))
        st = self.sim.stepper.step(st, a, self.sim.params)
        h = st.root_pos[:, self.slot, 2]
        vx = st.root_linvel[:, self.slot, 0]
        reward = vx + 0.5 - 0.005 * jnp.sum(actions**2, -1)
        done = h < 0.25
        # auto-reset fallen envs (vectorized-env semantics)
        init = self.sim.initial_state

        def sel(new, old):
            m = done.reshape(done.shape + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        st = jax.tree.map(
            lambda i, s: sel(i, s) if hasattr(s, "ndim") and s.ndim and s.shape[:1] == done.shape else s,
            init, st,
        )
        return st, self._obs(st), reward, done


class FrankaReachVecEnv(_VecEnvBase):
    """Franka arm position-delta control toward a fixed goal; reward =
    -|hand - goal|."""

    def __init__(self, num_envs=20, seed=0):
        super().__init__(num_envs=num_envs, seed=seed)
        from .franka import FrankaOscEnv

        self.env = FrankaOscEnv(num_envs=num_envs)
        self.sim = self.env.sim
        self.nd = 7
        self.action_space = _Space((self.nd,), -1.0, 1.0)
        self.observation_space = _Space((14,), -np.inf, np.inf)
        self.goal = jnp.asarray(np.tile([0.5, 0.0, 0.5], (num_envs, 1)), jnp.float32)
        self.state = self.sim.initial_state
        self._step = jax.jit(self._step_impl)

    def _obs(self, st):
        return jnp.concatenate(
            [st.dof_pos[:, :7], st.dof_vel[:, :7]], axis=-1
        )

    def _camera(self):
        return np.array([1.5, 0.0, 0.8]), np.array([0.3, 0.0, 0.4])

    def _step_impl(self, st, actions):
        a = self.sim.actions
        tgt = st.dof_pos[:, :7] + 0.05 * jnp.clip(actions, -1, 1)
        a = a._replace(dof_pos_target=a.dof_pos_target.at[:, :7].set(tgt))
        st = self.sim.stepper.step(st, a, self.sim.params)
        hand = st.body_pos[:, self.env.hand_body]
        reward = -jnp.linalg.norm(hand - self.goal, axis=-1)
        done = jnp.zeros(self.num_envs, bool)
        return st, self._obs(st), reward, done
