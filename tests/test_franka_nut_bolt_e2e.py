"""End-to-end pick -> transfer -> place for the arm-driven nut-bolt task
(VERDICT r4 item 5; reference ScrewFSM pipeline,
/root/reference/examples/franka_nut_bolt_ik_osc.py:41-203).

From a TABLE start (no start_on_bolt priming) both envs must: grip the
nut for real (the settle-gated grasp — no closed-through-air false
grips), carry it across the workspace, release it ONTO the bolt's
chamfered tip within a hole-radius of the axis, and enter the screw
phase. This covers the pick/place 80% of the reference FSM end-to-end.

KNOWN GAP (honest): blind thread-STARTING — converting the placed nut's
first gripper turn into engagement — still fails; the released nut rests
on the tip chamfer a few mm off-axis and the stiff position-controlled
regrip cannot let it self-center the way a compliant wrist (or the
reference's PhysX SDF contact under its tuned gains) does. The
gripper-driven screwing physics itself is proven from the primed state
by tests/test_franka_nut_bolt.py::test_gripper_driven_screw_descent.
"""
import jax
import numpy as np
import pytest

from test_isaacgym_tpu.envs.franka_nut_bolt import (
    S_GRIP, S_SCREW, FrankaNutBoltEnv,
)


@pytest.mark.slow
def test_pick_place_reaches_screw_from_table():
    env = FrankaNutBoltEnv(num_envs=2)  # table start
    roll = jax.jit(lambda s: env.rollout(30, s))
    st = env.init_state
    bolt_xy = np.asarray(st.sim.root_pos[:, env.bolt_slot, :2])
    nut_xy0 = np.asarray(st.sim.root_pos[:, env.nut_slot, :2])
    # the nut starts far from the bolt (this is a real transfer)
    assert (np.linalg.norm(nut_xy0 - bolt_xy, axis=-1) > 0.10).all()
    st, _ = roll(st)  # settle the spawned nut onto the table
    z0 = np.asarray(env.nut_height_now(st))
    reached_screw = np.zeros(2, bool)
    lifted = np.zeros(2, bool)
    false_grip = False
    for _ in range(24):  # 12 s
        st, (fsm_tr, _) = roll(st)
        fsm_max = np.asarray(fsm_tr).max(0)
        z = np.asarray(env.nut_height_now(st))
        lifted |= z - z0 > 0.05
        reached_screw |= fsm_max >= S_SCREW
        # a "grip" while the nut never left the table is a false grip
        sl = slice(env.dof0, env.dof0 + 9)
        sep = np.asarray(st.sim.dof_pos[:, sl])[:, 7:9].sum(-1)
        false_grip |= bool(
            ((np.asarray(st.fsm) > S_GRIP + 1) & (sep < 0.012)).any()
        )
        if reached_screw.all():
            break
    assert lifted.all(), "nut was never lifted off the table"
    assert reached_screw.all(), np.asarray(st.fsm)
    # the released nut sits ON the bolt tip, within ~a hole radius of the
    # axis (the chamfer caught it), not dropped on the table beside it
    nut_p = np.asarray(st.sim.root_pos[:, env.nut_slot])
    dxy = np.linalg.norm(nut_p[:, :2] - bolt_xy, axis=-1)
    assert (dxy < 0.020).all(), dxy
    assert (nut_p[:, 2] > z0 + 0.02).all(), nut_p[:, 2]
    assert np.isfinite(np.asarray(st.sim.root_pos)).all()
