"""Per-op device-time profile of one env rollout chunk (PERF_NOTES discipline).

Usage: python tools/profile_step.py [config] [num_envs] [steps]
Prints the top ops by total device time from a jax.profiler trace.
"""
import os, sys, time, collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

def top_ops(trace_dir, n=40):
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(_xspace(trace_dir), "rb").read())
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                tot[name] += dur
                cnt[name] += 1
    rows = tot.most_common(n)
    print(f"{'op':<90} {'total_ms':>9} {'calls':>6}")
    for name, ns in rows:
        print(f"{name[:90]:<90} {ns/1e6:9.3f} {cnt[name]:6d}")
    print("TOTAL device ms:", sum(tot.values())/1e6)

def _xspace(d):
    import glob
    fs = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    assert fs, f"no xplane in {d}"
    return fs[0]

def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "nut_bolt"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    if cfg == "nut_bolt":
        from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv
        env = NutBoltEnv(num_envs=n)
        run = jax.jit(env.rollout_fn(steps), donate_argnums=0)
        state = run(env.sim.state)
    elif cfg == "franka_cube":
        from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv
        env = FrankaCubeEnv(num_envs=n, controller="osc")
        run = jax.jit(lambda s: env.rollout(steps, s)[0])
        state = run(env.init_state)
    elif cfg == "franka":
        from test_isaacgym_tpu.envs.franka import FrankaOscEnv
        env = FrankaOscEnv(num_envs=n)
        run = jax.jit(env.rollout_fn(steps), donate_argnums=0)
        state = run(env.sim.state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    print(f"{cfg}@{n}: {steps} steps in {dt*1e3:.1f} ms = {n*steps/dt:,.0f} env-steps/s ({dt/steps*1e3:.2f} ms/step)")
    import tempfile
    d = tempfile.mkdtemp(prefix="prof_")
    with jax.profiler.trace(d):
        state = run(state)
        jax.block_until_ready(state)
    top_ops(d)

if __name__ == "__main__":
    main()
