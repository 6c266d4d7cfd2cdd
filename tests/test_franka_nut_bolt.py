"""Arm-driven nut-bolt screwing (VERDICT r3 item 7; the reference's
ScrewFSM — /root/reference/examples/franka_nut_bolt_ik_osc.py:41-203).

The PASS bar is the core physical claim: during screw_motion the GRIPPER'S
forced wrist rotation turns the free nut and the SDF thread contact
converts that rotation into descent. (envs/nut_bolt.py's kinematic-spin env
stays the thread-physics unit test.)
"""
import jax
import numpy as np
import pytest

from test_isaacgym_tpu.envs.franka_nut_bolt import (
    S_LIFT, S_SCREW, FrankaNutBoltEnv,
)


def _yaw(q):
    return np.arctan2(
        2 * (q[..., 3] * q[..., 2] + q[..., 0] * q[..., 1]),
        1 - 2 * (q[..., 1] ** 2 + q[..., 2] ** 2),
    )


@pytest.mark.slow
def test_gripper_driven_screw_descent():
    env = FrankaNutBoltEnv(num_envs=2, start_on_bolt=True)
    roll = jax.jit(lambda s: env.rollout(15, s))
    st = env.init_state
    prev_yaw = _yaw(np.asarray(st.sim.root_quat[:, env.nut_slot]))
    prev_z = np.asarray(env.nut_height_now(st))
    best_turn = np.zeros(2)
    best_drop = np.zeros(2)
    for _ in range(48):  # 12 s
        st, _ = roll(st)
        fsm = np.asarray(st.fsm)
        yaw = _yaw(np.asarray(st.sim.root_quat[:, env.nut_slot]))
        z = np.asarray(env.nut_height_now(st))
        in_screw = fsm == S_SCREW
        dyaw = np.unwrap(np.stack([prev_yaw, yaw]), axis=0)[1] - prev_yaw
        turn = np.where(in_screw, -dyaw, 0.0)
        drop = np.where(in_screw, prev_z - z, 0.0)
        both = (turn > 0.05) & (drop > 0)
        best_turn = np.maximum(best_turn, np.where(both, turn, 0))
        best_drop = np.maximum(best_drop, np.where(both, drop, 0))
        prev_yaw, prev_z = yaw, z
    # a gripped screw sweep must both TURN the nut and DROP it
    assert (best_turn > np.deg2rad(15)).any(), np.rad2deg(best_turn)
    assert (best_drop > 3e-4).any(), best_drop
    assert np.isfinite(np.asarray(st.sim.root_pos)).all()


@pytest.mark.slow
def test_pick_fsm_progresses():
    env = FrankaNutBoltEnv(num_envs=2)
    roll = jax.jit(lambda s: env.rollout(30, s))
    st = env.init_state
    z0 = np.asarray(env.nut_height_now(st)).copy()
    max_state = np.zeros(2, np.int64)
    z_peak = z0.copy()
    for _ in range(12):  # 6 s
        st, (fsm_tr, _) = roll(st)
        max_state = np.maximum(max_state, np.asarray(fsm_tr).max(0))
        z_peak = np.maximum(z_peak, np.asarray(env.nut_height_now(st)))
    assert (max_state >= S_LIFT).any(), max_state
    assert (z_peak - z0 > 0.01).any(), z_peak - z0
