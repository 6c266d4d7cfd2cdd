"""Franka cube pick with IK / OSC task-space control — the reference's
flagship manipulation example.

Counterpart of /root/reference/examples/franka_cube_ik_osc.py:83-96: N envs,
each with a table, a yaw-randomized 4.5 cm cube (seed 42), and a Franka; a
tensor-conditional grasp state machine approaches, grasps, and lifts the
cube, dropping and retrying boxes carried above 0.6 m. The FSM, IK
(damped least squares, :53-59) and OSC (:62-79) controllers live in
`test_isaacgym_tpu.envs.franka_cube.FrankaCubeEnv` — this script is the
headless example wrapper: run a rollout, report the lift rate.

PASS = >=80% of envs hold the cube >=0.1 m above the table at rollout end.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import test_isaacgym_tpu  # noqa: F401, E402  (selects backend before jax init)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from _common import check  # noqa: E402
from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv, TABLE_DIMS  # noqa: E402

p = argparse.ArgumentParser(description="franka cube IK/OSC pick")
p.add_argument("--steps", type=int, default=500)
# reference runs 256 envs (:96); default smaller so the CPU run stays quick —
# pass --num-envs 256 for the full-scale run
p.add_argument("--num-envs", type=int, default=8)
p.add_argument("--controller", choices=("ik", "osc"), default="ik")
args = p.parse_args()

env = FrankaCubeEnv(num_envs=args.num_envs, controller=args.controller, seed=42)
final, (gripped, boxz) = jax.jit(lambda s: env.rollout(args.steps, s))(env.init_state)
jax.block_until_ready(final)

bz = np.asarray(boxz)  # (T, N)
held = int((bz[-1] > TABLE_DIMS[2] + 0.1).sum())
frac = held / args.num_envs
print(
    f"controller={args.controller} envs={args.num_envs} steps={args.steps}: "
    f"{held}/{args.num_envs} envs holding the cube "
    f"(final heights {np.round(bz[-1], 3).tolist()})"
)
check(frac >= 0.8, f"{frac:.0%} of envs lifted and hold the cube (bar: 80%)")
check(float(bz.min()) > -0.05, "no cube tunneled through the ground")
print("franka_cube_ik_osc OK")
