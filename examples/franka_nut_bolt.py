"""Franka nut-bolt screwing: arm-driven pick -> place -> screw.

Counterpart of /root/reference/examples/franka_nut_bolt_ik_osc.py — the
11-state ScrewFSM (:41-203) drives the Franka with damped-least-squares IK.
Two lanes:

1. PICK lane (the full task from the table): the FSM approaches, grips,
   and lifts the free nut. The pads-on-a-16mm-coned-nut pinch is marginal
   physics (it is in PhysX too); the PASS bar is FSM progress through the
   pick states with the nut actually leaving the table.
2. SCREW lane (start_on_bolt=True): the nut begins threaded at the bolt
   top and the FSM runs the wrench cycle — grip the flats at screw_sep,
   twist the wrist -120 deg, release, rotate back, re-grip. The PASS bar
   is the VERDICT's core demand: during the gripped screw sweep the NUT'S
   yaw follows the hand and its height DROPS down the thread (the SDF
   contact converts gripper-driven rotation into descent; the kinematic
   spin variant lives in envs/nut_bolt.py).
"""
import numpy as np

from _common import check, example_args

import jax

from test_isaacgym_tpu.envs.franka_nut_bolt import (
    FrankaNutBoltEnv, S_LIFT, S_SCREW,
)


def yaw_of(q):
    return np.arctan2(
        2 * (q[..., 3] * q[..., 2] + q[..., 0] * q[..., 1]),
        1 - 2 * (q[..., 1] ** 2 + q[..., 2] ** 2),
    )


args = example_args("Franka IK nut-bolt screwing", steps=600, num_envs=2)

# ---- lane 1: pick from the table ----------------------------------------
env = FrankaNutBoltEnv(num_envs=args.num_envs)
roll = jax.jit(lambda s: env.rollout(30, s))
st = env.init_state
z_table = np.asarray(env.nut_height_now(st)).copy()
max_state = np.zeros(args.num_envs, np.int64)
z_peak = z_table.copy()
for chunk in range(max(args.steps // 30, 1)):
    st, (fsm_tr, err_tr) = roll(st)
    max_state = np.maximum(max_state, np.asarray(fsm_tr).max(0))
    z_peak = np.maximum(z_peak, np.asarray(env.nut_height_now(st)))
print(f"pick lane: max fsm state {max_state}, nut lift {np.round(z_peak - z_table, 4)} m")
check(bool((max_state >= S_LIFT).any()),
      f"FSM grips and lifts in at least one env (max state {max_state})")
check(bool((z_peak - z_table > 0.01).any()),
      f"the nut leaves the table ({np.round(z_peak - z_table, 4)})")

# ---- lane 2: the screw cycle on the bolt --------------------------------
envs2 = FrankaNutBoltEnv(num_envs=2, start_on_bolt=True)
roll2 = jax.jit(lambda s: envs2.rollout(15, s))
st2 = envs2.init_state
prev_yaw = yaw_of(np.asarray(st2.sim.root_quat[:, envs2.nut_slot]))
prev_z = np.asarray(envs2.nut_height_now(st2))
best_turn = np.zeros(2)
best_drop = np.zeros(2)
for chunk in range(56):  # 14 s
    st2, _ = roll2(st2)
    fsm = np.asarray(st2.fsm)
    yaw = yaw_of(np.asarray(st2.sim.root_quat[:, envs2.nut_slot]))
    z = np.asarray(envs2.nut_height_now(st2))
    in_screw = fsm == S_SCREW
    dyaw = np.unwrap(np.stack([prev_yaw, yaw]), axis=0)[1] - prev_yaw
    turn = np.where(in_screw, -dyaw, 0.0)  # screw turns clockwise (-yaw)
    drop = np.where(in_screw, prev_z - z, 0.0)
    both = (turn > 0.05) & (drop > 0)
    best_turn = np.maximum(best_turn, np.where(both, turn, 0))
    best_drop = np.maximum(best_drop, np.where(both, drop, 0))
    prev_yaw, prev_z = yaw, z

print(f"screw lane: best gripped (turn, drop) per env: "
      f"{np.round(np.rad2deg(best_turn), 1)} deg, {np.round(best_drop * 1000, 2)} mm")
check(bool((best_turn > np.deg2rad(15)).any()),
      "gripper rotation turns the nut during screw_motion")
check(bool((best_drop > 3e-4).any()),
      "the turned nut DESCENDS the thread (gripper-driven, not kinematic)")
check(bool(np.isfinite(np.asarray(st2.sim.root_pos)).all()), "state finite")
print("franka_nut_bolt OK")
