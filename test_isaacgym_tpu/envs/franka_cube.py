"""Batched Franka cube pick: IK/OSC grasp state machine, fully jitted.

The native-fast-path counterpart of
/root/reference/examples/franka_cube_ik_osc.py (256 envs grasping randomized
cubes off a table): damped-least-squares IK or OSC task-space control
(:53-79), the tensor-conditional grasp state machine (:336-406) re-expressed
as pure jnp.where logic, and gripper-link contact carrying the cube — all in
ONE jitted step over the state pytree.

Scene constants mirror the reference (:153-260): 0.6x1.0x0.4 table at
x=0.5, 0.045 cube randomized on it, franka at the origin, stiffness 400/80
drives for IK, effort mode for OSC.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import load_urdf
from ..assets.primitives import create_box
from ..control.osc import control_ik, orientation_error
from ..core.config import PlaneParams, SimParams
from ..core.scene import SceneBuilder
from ..core.sim import Simulator
from ..core.state import SimState
from ..math.quat import quat_conjugate, quat_mul, quat_rotate
from ..utils.linalg import spd_solve

ASSET_ROOT = "/root/reference/assets"
FRANKA_URDF = "urdf/franka_description/robots/franka_panda.urdf"

TABLE_DIMS = (0.6, 1.0, 0.4)
BOX_SIZE = 0.045
DEFAULT_DOF_POS = np.array(
    [0.0, 0.0, 0.0, -1.57, 0.0, 1.87, 0.0, 0.04, 0.04], np.float32
)
# hand pointing straight down (the reference's down_q, :295)
DOWN_Q = jnp.array([1.0, 0.0, 0.0, 0.0])


def _box_grasp_yaw(box_quat):
    """Yaw quaternion of the nearest graspable cube face (the reference's
    cube_grasping_yaw helper): cube x-axis heading folded into [-pi/4, pi/4]."""
    ax = quat_rotate(box_quat, jnp.array([1.0, 0.0, 0.0]))
    yaw = jnp.arctan2(ax[..., 1], ax[..., 0])
    yaw = yaw - jnp.round(yaw / (jnp.pi / 2)) * (jnp.pi / 2)
    half = yaw / 2
    z = jnp.zeros_like(half)
    return jnp.stack([z, z, jnp.sin(half), jnp.cos(half)], axis=-1)


class PickState(NamedTuple):
    sim: SimState
    hand_restart: jax.Array  # (N,) bool


@dataclasses.dataclass
class FrankaCubeEnv:
    num_envs: int = 16
    controller: str = "ik"  # "ik" | "osc"
    seed: int = 42  # reference seeds 42 (:83)
    ik_damping: float = 0.05
    osc_kp: float = 150.0

    def __post_init__(self):
        sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
        sp.physx.num_position_iterations = 8
        franka = load_urdf(ASSET_ROOT, FRANKA_URDF, fix_base_link=True, armature=0.01)
        franka.disable_gravity = True
        table = create_box(*TABLE_DIMS, fix_base_link=True)
        cube = create_box(BOX_SIZE, BOX_SIZE, BOX_SIZE, density=400.0)

        rng = np.random.RandomState(self.seed)
        b = SceneBuilder(sp)
        b.add_ground(PlaneParams())  # reference :232-235
        n_row = max(int(np.sqrt(self.num_envs)), 1)
        for i in range(self.num_envs):
            b.create_env((-1, -1, 0), (1, 1, 1.5), n_row)
            b.create_actor(
                i, table, pos=(0.5, 0.0, 0.5 * TABLE_DIMS[2]), name="table",
                group=i, filter=0,
            )
            b.create_actor(
                i, cube,
                pos=(
                    0.5 + rng.uniform(-0.1, 0.1),
                    rng.uniform(-0.2, 0.2),
                    TABLE_DIMS[2] + 0.5 * BOX_SIZE,
                ),
                quat=_yaw_quat(rng.uniform(-np.pi, np.pi)),
                name="box", group=i, filter=0,
            )
            b.create_actor(i, franka, pos=(0, 0, 0), name="franka", group=i, filter=2)
        self.sim = Simulator(*b.finalize())
        scene = self.sim.scene

        meta = scene.find_actor("franka")
        self.box_slot = scene.find_actor("box").slot
        hand_i = franka.rigid_body_dict()["panda_hand"]
        self.hand_body = meta.body_start + hand_i
        self.dof0 = meta.dof_start
        self._hand_jac = self.sim.body_jacobian_fn("franka", "panda_hand")
        self._mm = self.sim.mass_matrix_fn("franka")

        # drive modes (reference :183-191): IK -> stiff position drives;
        # OSC -> zero-gain effort on the arm. Grippers always POS.
        p = self.sim.params
        stiff = np.zeros((self.num_envs, 9), np.float32)
        damp = np.zeros((self.num_envs, 9), np.float32)
        mode = np.zeros((self.num_envs, 9), np.int32)
        if self.controller == "ik":
            mode[:, :7] = 1  # POS
            stiff[:, :7] = 400.0
            damp[:, :7] = 80.0
        else:
            mode[:, :7] = 3  # EFFORT
        mode[:, 7:] = 1
        stiff[:, 7:] = 800.0
        damp[:, 7:] = 40.0
        sl = slice(self.dof0, self.dof0 + 9)
        self.sim.params = p._replace(
            dof_stiffness=p.dof_stiffness.at[:, sl].set(jnp.asarray(stiff)),
            dof_damping=p.dof_damping.at[:, sl].set(jnp.asarray(damp)),
            dof_drive_mode=p.dof_drive_mode.at[:, sl].set(jnp.asarray(mode)),
        )
        # default pose = joint-limit mids, grippers open (reference :195-198)
        lo = np.asarray(self.sim.params.dof_lower)[0, sl]
        hi = np.asarray(self.sim.params.dof_upper)[0, sl]
        mids = 0.5 * (lo + hi)
        mids[7:] = hi[7:]
        q0 = jnp.tile(jnp.asarray(mids, jnp.float32), (self.num_envs, 1))
        st = self.sim.state
        st = st._replace(dof_pos=st.dof_pos.at[:, sl].set(q0))
        self.sim.state = self.sim.stepper.refresh_body_state(st, self.sim.params)
        self.sim.initial_state = self.sim.state

        self.init_hand_pos = self.sim.state.body_pos[:, self.hand_body]
        self.init_hand_quat = self.sim.state.body_quat[:, self.hand_body]
        self.grasp_offset = 0.11 if self.controller == "ik" else 0.10
        self.init_state = PickState(
            sim=self.sim.state,
            hand_restart=jnp.zeros(self.num_envs, dtype=bool),
        )
        self._step = jax.jit(self.step_fn)

    # ------------------------------------------------------------------
    def step_fn(self, state: PickState, _=None):
        """Grasp FSM + task-space control + physics (reference :336-410)."""
        st = state.sim
        N = self.num_envs
        box_pos = st.root_pos[:, self.box_slot]
        box_rot = st.root_quat[:, self.box_slot]
        hand_pos = st.body_pos[:, self.hand_body]
        hand_rot = st.body_quat[:, self.hand_body]
        sl = slice(self.dof0, self.dof0 + 9)
        dof_pos = st.dof_pos[:, sl]
        dof_vel = st.dof_vel[:, sl]

        to_box = box_pos - hand_pos
        box_dist = jnp.linalg.norm(to_box, axis=-1)
        box_dot = -to_box[:, 2] / jnp.maximum(box_dist, 1e-9) * -1.0
        box_dot = (to_box / jnp.maximum(box_dist, 1e-9)[:, None]) @ jnp.array(
            [0.0, 0.0, -1.0]
        )

        gripper_sep = dof_pos[:, 7] + dof_pos[:, 8]
        gripped = (gripper_sep < 0.045) & (
            box_dist < self.grasp_offset + 0.5 * BOX_SIZE
        )

        yaw_q = _box_grasp_yaw(box_rot)
        box_yaw_dir = quat_rotate(yaw_q, jnp.array([1.0, 0.0, 0.0]))
        hand_yaw_dir = quat_rotate(hand_rot, jnp.array([1.0, 0.0, 0.0]))
        yaw_dot = jnp.einsum("nk,nk->n", box_yaw_dir, hand_yaw_dir)

        to_init = self.init_hand_pos - hand_pos
        init_dist = jnp.linalg.norm(to_init, axis=-1)
        hand_restart = state.hand_restart & (init_dist > 0.02)
        return_to_start = hand_restart | gripped

        above_box = (
            (box_dot >= 0.99) & (yaw_dot >= 0.95)
            & (box_dist < self.grasp_offset * 3)
        )
        grasp_z = jnp.where(
            above_box,
            box_pos[:, 2] + self.grasp_offset,
            box_pos[:, 2] + self.grasp_offset * 2.5,
        )
        grasp_pos = box_pos.at[:, 2].set(grasp_z)

        goal_pos = jnp.where(return_to_start[:, None], self.init_hand_pos, grasp_pos)
        goal_rot = jnp.where(
            return_to_start[:, None],
            self.init_hand_quat,
            quat_mul(jnp.broadcast_to(DOWN_Q, box_rot.shape), quat_conjugate(yaw_q)),
        )

        pos_err = goal_pos - hand_pos
        orn_err = orientation_error(goal_rot, hand_rot)
        dpose = jnp.concatenate([pos_err, orn_err], axis=-1)

        j_eef = self._hand_jac(st)[:, :, :7]
        actions = self.sim.actions
        if self.controller == "ik":
            dq = control_ik(j_eef, dpose, damping=self.ik_damping)
            arm_target = dof_pos[:, :7] + dq
            effort = jnp.zeros((N, 9))
        else:
            mm7 = self._mm(st, self.sim.params)[:, :7, :7]
            jt = jnp.swapaxes(j_eef, -1, -2)
            m_eef_inv = j_eef @ spd_solve(mm7, jt)
            u = (
                jt @ spd_solve(m_eef_inv, self.osc_kp * dpose)[..., None]
                - 2.0 * jnp.sqrt(self.osc_kp)
                * (mm7 @ dof_vel[:, :7, None])
            )[..., 0]
            arm_target = dof_pos[:, :7]
            effort = jnp.concatenate([u, jnp.zeros((N, 2))], axis=-1)

        close_gripper = (box_dist < self.grasp_offset + 0.02) | gripped
        hand_restart = hand_restart | (box_pos[:, 2] > 0.6)
        close_gripper = close_gripper & (~hand_restart)
        # target 0 like the reference (:404): the fingers stop ON the cube
        # because finger-link contact is two-way (joint-space impulses) and
        # the drive torque is force-limited — PhysX-style squeeze
        grip_target = jnp.where(close_gripper[:, None], 0.0, 0.04)
        pos_target = jnp.concatenate([arm_target, grip_target + jnp.zeros((N, 2))], -1)

        full_pos = actions.dof_pos_target.at[:, sl].set(pos_target)
        full_eff = actions.dof_effort.at[:, sl].set(effort)
        actions = actions._replace(dof_pos_target=full_pos, dof_effort=full_eff)

        st = self.sim.stepper.step(st, actions, self.sim.params)
        return PickState(sim=st, hand_restart=hand_restart), (gripped, box_pos[:, 2])

    # ------------------------------------------------------------------
    def rollout(self, num_steps: int, state: Optional[PickState] = None):
        state = state or self.init_state

        def body(carry, _):
            return self.step_fn(carry)

        return jax.lax.scan(body, state, None, length=num_steps)

    def box_height(self, state: PickState):
        return state.sim.root_pos[:, self.box_slot, 2]


def _yaw_quat(yaw):
    return (0.0, 0.0, float(np.sin(yaw / 2)), float(np.cos(yaw / 2)))
