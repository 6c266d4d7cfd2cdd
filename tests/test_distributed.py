"""REAL multi-process distributed exercise (SURVEY.md §2.4 north star).

Round-3 gap: `init_distributed` and the (dcn, ici) mesh had only ever run
single-process on a virtual mesh. Here two localhost processes x 4 virtual
CPU devices each form an 8-device global mesh via `jax.distributed`
(Gloo-backed CPU collectives), run the sharded rollout with the in-program
learner `all_gather`, and the gathered observations must match a
single-process reference bitwise-ish.
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np
pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.device_count() == 8 and jax.process_count() == 2
sys.path.insert(0, "/root/repo")
from test_isaacgym_tpu.parallel.mesh import (
    global_env_tree, make_2d_mesh, rollout_with_obs,
)
from test_isaacgym_tpu.envs.franka import FrankaOscEnv

env = FrankaOscEnv(num_envs=16)
sim = env.sim
mesh = make_2d_mesh(dcn=2, ici=4)
AX = ("dcn", "ici")
state = global_env_tree(sim.state, mesh, 16, axis=AX)
actions = global_env_tree(sim.actions, mesh, 16, axis=AX)
params = global_env_tree(sim.params, mesh, 16, axis=AX)
roll = rollout_with_obs(
    sim.stepper.step, lambda s: s.dof_pos, mesh, state, actions, params,
    num_steps=3, axis=AX,
)
final, obs = roll(state, actions, params)
jax.block_until_ready(obs)
# obs is replicated (out_spec P()): every process holds the global value
local = np.asarray(obs.addressable_shards[0].data)
np.savez(out_path, obs=local)
print("WORKER_OK", pid, local.shape, flush=True)
"""


@pytest.mark.slow
def test_two_process_rollout_matches_single():
    port = _free_port()
    td = tempfile.mkdtemp()
    worker_py = os.path.join(td, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(
            "--xla_force_host_platform_device_count=4"
            " --xla_cpu_use_fusion_emitters=false"
        ),
    )
    env.pop("TIG_TESTS_REEXEC", None)
    outs = [os.path.join(td, f"obs{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", worker_py, str(i), str(port), outs[i]],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(
        log[-2000:] for log in logs
    )

    # single-process reference (this process: 8 virtual devices, no dist)
    import jax
    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    envf = FrankaOscEnv(num_envs=16)
    sim = envf.sim

    def body(carry, _):
        nxt = sim.stepper.step(carry, sim.actions, sim.params)
        return nxt, nxt.dof_pos

    _, ref = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=3)
    )(sim.state)
    ref = np.asarray(ref)

    for i, path in enumerate(outs):
        got = np.load(path)["obs"]
        assert got.shape == ref.shape, (got.shape, ref.shape)
        err = np.abs(got - ref).max()
        assert err < 1e-5, f"proc {i} gathered obs off by {err}"
        assert "WORKER_OK" in logs[i]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
