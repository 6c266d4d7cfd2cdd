"""Batched UAV-car pursuit vecenv with visual servo — the reference's
north-star workload family (test06 vecenv root-state control, test07/test08
camera projection, test10 batched servo — SURVEY.md §3.3).

Per env: a kinematic car loitering around a target under CCLVF guidance, a
UAV pursuing the car under CCLVF, and a gimballed camera on the UAV that
visual-servos to keep the car centered in the image. The whole control+write+
step loop is ONE jitted function over the state pytree — the reference's
refresh/set tensor round-trips (test10:394-456) disappear.

Assets: the reference's own UAV/car URDFs when available, primitive fallbacks
otherwise (the dynamics are kinematic root writes either way).
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import load_urdf
from ..assets.primitives import create_box
from ..control.guidance import cclvf, heading_quat
from ..control.servo import align_axis_to, camera_matrix, pixel_to_ray, recenter_rotation
from ..core.config import SimParams
from ..core.scene import SceneBuilder
from ..core.sim import Simulator
from ..core.state import SimState
from ..math.quat import matrix_to_quat, quat_mul, quat_rotate_inverse, quat_to_matrix
from ..render.camera import world_to_pixel

ASSET_ROOT = "/root/reference/assets"
UAV_URDF = "urdf/uav/urdf/rq-1-predator-mae-uav.urdf"
CAR_URDF = "urdf/uav/urdf/tpz-fuchs-apc.urdf"


class ServoState(NamedTuple):
    """Carry of the vecenv rollout: sim state + per-env camera rotation."""

    sim: SimState
    cam_rot: jax.Array  # (N, 3, 3) world<-camera


@dataclasses.dataclass
class UavCarEnv:
    num_envs: int = 16
    car_speed: float = 10.0
    car_radius: float = 10.0
    uav_speed: float = 20.0
    uav_radius: float = 20.0
    uav_altitude: float = 20.0
    cam_width: int = 160
    cam_height: int = 90
    cam_hfov: float = 90.0
    target: tuple = (1.0, 1.0, 0.0)  # loiter target (test06:422)

    def __post_init__(self):
        sp = SimParams(dt=1 / 60, substeps=1, gravity=(0.0, 0.0, -9.8))
        uav = self._load(UAV_URDF, "uav", (0.4, 0.4, 0.1))
        car = self._load(CAR_URDF, "car", (0.6, 0.3, 0.15))
        uav.disable_gravity = True
        car.disable_gravity = True
        b = SceneBuilder(sp)
        n_row = max(int(np.sqrt(self.num_envs)), 1)
        rng = np.random.RandomState(17)
        for i in range(self.num_envs):
            b.create_env((-25, -25, 0), (25, 25, 30), n_row)
            # spread initial positions so envs decorrelate
            b.create_actor(
                i, uav,
                pos=(rng.uniform(-5, 5), rng.uniform(-5, 5), self.uav_altitude),
                name="uav", group=i, filter=1,
            )
            b.create_actor(
                i, car,
                pos=(rng.uniform(-15, 15), rng.uniform(-15, 15), 0.2),
                name="car", group=i, filter=1,
            )
        self.sim = Simulator(*b.finalize())
        self.uav_slot = self.sim.scene.find_actor("uav").slot
        self.car_slot = self.sim.scene.find_actor("car").slot
        self.K = camera_matrix(self.cam_width, self.cam_height, self.cam_hfov)
        self.target_w = jnp.asarray(
            self.sim.env_origins + jnp.asarray(self.target, jnp.float32)
        )
        # camera starts looking straight down from the UAV
        down = np.array(
            [[0, 0, -1.0], [0, 1.0, 0], [1.0, 0, 0]]
        ).T  # columns: fwd=-z_w, left=+y_w, up=+x_w
        self.init_state = ServoState(
            sim=self.sim.state,
            cam_rot=jnp.tile(jnp.asarray(down, jnp.float32), (self.num_envs, 1, 1)),
        )
        self._step = jax.jit(self.step_fn)

    def _load(self, rel, name, fallback_box):
        path = os.path.join(ASSET_ROOT, rel)
        if os.path.exists(path):
            a = load_urdf(ASSET_ROOT, rel)
            if a.num_dofs == 0 and a.num_bodies == 1:
                return a
        return create_box(*fallback_box, density=200.0)

    # ------------------------------------------------------------------
    def step_fn(self, state: ServoState, _=None):
        """One control + physics step (pure; scanned in rollout)."""
        st = state.sim
        dt = self.sim.scene.sim_params.dt
        uav_pos = st.root_pos[:, self.uav_slot]
        car_pos = st.root_pos[:, self.car_slot]

        # -- guidance (test06:420-441 semantics, batched) --
        car_vel = cclvf(car_pos, self.target_w, self.car_speed, self.car_radius)
        car_vel = car_vel.at[:, 2].set(0.0)  # car stays on the ground
        uav_goal = car_pos.at[:, 2].add(self.uav_altitude)
        uav_vel = cclvf(uav_pos, uav_goal, self.uav_speed, self.uav_radius)
        car_quat = heading_quat(car_vel)
        uav_quat = heading_quat(uav_vel)

        # functional root-state write (replaces set_actor_root_state_tensor)
        rp = st.root_pos
        rq = st.root_quat
        rl = st.root_linvel
        rq = rq.at[:, self.uav_slot].set(uav_quat)
        rq = rq.at[:, self.car_slot].set(car_quat)
        rl = rl.at[:, self.uav_slot].set(uav_vel)
        rl = rl.at[:, self.car_slot].set(car_vel)
        st = st._replace(root_quat=rq, root_linvel=rl)

        # physics step (kinematic integration of the written velocities)
        st = self.sim.stepper.step(st, self.sim.actions, self.sim.params)

        # -- visual servo (test10:427-456 semantics) --
        cam_pos = st.root_pos[:, self.uav_slot]  # camera at UAV origin
        cam_quat_now = matrix_to_quat(state.cam_rot)
        pixel, depth = world_to_pixel(
            cam_pos, cam_quat_now, st.root_pos[:, self.car_slot], self._props()
        )
        center = jnp.array(
            [self.cam_width / 2, self.cam_height / 2], jnp.float32
        )
        pixel_move = pixel - center
        # measurement-driven servo while the car is in front of the image
        # plane; direct-bearing acquisition otherwise (pixel coordinates are
        # undefined for points behind the camera)
        new_rot, rpy = recenter_rotation(state.cam_rot, pixel_move, self.K)
        rel = st.root_pos[:, self.car_slot] - cam_pos
        bearing = rel / jnp.linalg.norm(rel, axis=-1, keepdims=True).clip(1e-9)
        acq_rot = align_axis_to(state.cam_rot, bearing)
        behind = (depth <= 1e-6)[:, None, None]
        new_rot = jnp.where(behind, acq_rot, new_rot)
        return ServoState(sim=st, cam_rot=new_rot), (pixel, rpy)

    def _props(self):
        from ..core.config import CameraProperties

        return CameraProperties(
            width=self.cam_width, height=self.cam_height,
            horizontal_fov=self.cam_hfov,
        )

    # ------------------------------------------------------------------
    def rollout(self, num_steps: int, state: Optional[ServoState] = None):
        """Scan rollout; returns final state + per-step (pixel, servo rpy)."""
        state = state or self.init_state

        def body(carry, _):
            return self.step_fn(carry)

        return jax.lax.scan(body, state, None, length=num_steps)

    def car_pixel(self, state: ServoState):
        """Where the car lands in the (already servoed) camera image."""
        cam_pos = state.sim.root_pos[:, self.uav_slot]
        q = matrix_to_quat(state.cam_rot)
        pix, _ = world_to_pixel(
            cam_pos, q, state.sim.root_pos[:, self.car_slot], self._props()
        )
        return pix
