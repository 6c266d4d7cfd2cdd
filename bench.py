#!/usr/bin/env python
"""Benchmarks. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N,
   "extra": {...}, "errors": {...}}

Flagship metric (BASELINE.json): env-steps/s at 4096 Franka-arm envs with
OSC control; vs_baseline is against the 1M env-steps/s/host north star
(/root/repo/BASELINE.md — the reference repo publishes no numbers).

`extra` carries the contact-rich configs:
  * franka_cube@N  — Franka grasp-lift envs (table + cube + two-way
    articulated contact), env-steps/s
  * balls1080      — 1080 free balls in ONE collision world (dense
    sphere-world Pallas path), ball-steps/s
  * nut_bolt@N     — SDF thread contact (nut descends on a bolt)

Every config runs in its own try/except: one failure can never erase the
others' numbers (it lands in `errors` instead).

Run a single config with --config {franka,franka_cube,balls1080,nut_bolt}.
Run `--verify` for a TPU-executed correctness lane: Pallas-vs-jnp sphere
kernel parity plus one contact-rich step on the live backend (the pytest
suite re-execs onto CPU, so this is where TPU kernels get checked).
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def _enable_compile_cache():
    """Persistent XLA compile cache: the axon remote-compile service has
    slow phases (minutes per program); a warm cache makes repeat bench runs
    immune to them."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def _bench_franka(num_envs, steps):
    import jax

    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    env = FrankaOscEnv(num_envs=num_envs)
    run = jax.jit(env.rollout_fn(steps), donate_argnums=0)
    state = run(env.sim.state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def _bench_franka_cube(num_envs, steps):
    import jax

    from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

    env = FrankaCubeEnv(num_envs=num_envs, controller="osc")
    run = jax.jit(lambda s: env.rollout(steps, s)[0], donate_argnums=0)
    state = run(env.init_state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def _bench_balls(steps, chunk=25):
    """1080 balls, one world. Steps via CHUNKED lax.scan: a jit'd 25-step
    scan amortizes dispatch to ~nothing while keeping the compiled loop
    short enough to dodge the pathological XLA:TPU loop pass a LONG scan
    over the Pallas sphere-world kernel triggers (round-3 note). Round 3's
    per-step Python dispatch measured 1.36 ms/step — 17x off the kernel's
    round-2 throughput; the chunked scan restores it."""
    import jax

    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=1, pyramids=36)
    st = env.sim.stepper
    f = jax.jit(st.rollout, static_argnums=3)
    chunks = max(steps // chunk, 1)
    s = f(env.sim.state, env.sim.actions, env.sim.params, chunk)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(chunks):
        s = f(s, env.sim.actions, env.sim.params, chunk)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    return env.balls_per_world * chunks * chunk / dt


def _bench_nut_bolt(num_envs, steps):
    import jax

    from test_isaacgym_tpu.envs.nut_bolt import NutBoltEnv

    env = NutBoltEnv(num_envs=num_envs)
    run = jax.jit(env.rollout_fn(steps), donate_argnums=0)
    state = run(env.sim.state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * steps / dt


def _bench_render(width=1600, height=900, frames=8):
    """TPU render throughput (VERDICT r4 items 4/5 of 'missing'): test08's
    1600x900 camera (/root/reference/test08.py:281-284) over a franka
    scene rendering TRUE visual triangle meshes (not hull LODs). Returns
    ms/frame on the live backend."""
    import numpy as np

    from test_isaacgym_tpu import gymapi

    gym = gymapi.acquire_gym()
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    gym.add_ground(sim, gymapi.PlaneParams())
    opts = gymapi.AssetOptions()
    opts.fix_base_link = True
    asset = gym.load_asset(
        sim,
        "/root/reference/assets",
        "urdf/franka_description/robots/franka_panda.urdf",
        opts,
    )
    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 1), 1)
    gym.create_actor(env, asset, gymapi.Transform(), "franka", 0, 0)
    cam = gym.create_camera_sensor(
        env, gymapi.CameraProperties(width=width, height=height)
    )
    gym.set_camera_location(
        cam, env, gymapi.Vec3(1.6, 0.9, 0.9), gymapi.Vec3(0, 0, 0.4)
    )
    import jax.numpy as jnp

    def sync(sensor):
        # force completion with a 1-element readback: through the axon
        # tunnel block_until_ready can return before a freshly dispatched
        # program finishes (measured r5: 6 ms "block" then 2.7 s on the
        # first real transfer); a scalar device->host get cannot.
        return int(jnp.sum(sensor.color[0, ::64, ::64, 0]))

    gym.prepare_sim(sim)
    gym.render_all_camera_sensors(sim)  # compile
    sensor = sim.cameras[0]
    sync(sensor)
    t0 = time.perf_counter()
    for _ in range(frames):
        gym.render_all_camera_sensors(sim)
        # device-resident images (the reference's enable_tensors /
        # get_camera_image_gpu_tensor path); full-frame host readback is a
        # separate consumer cost, as in interop_torch.py's GPU path
        sync(sensor)
    dt = (time.perf_counter() - t0) / frames
    img = gym.get_camera_image(sim, env, cam, gymapi.IMAGE_COLOR)
    assert img.shape == (height, width * 4)
    assert np.asarray(img).std() > 0
    return dt * 1e3  # ms/frame


def _bench_sharded(num_envs, steps):
    """Sharded learner loop (SURVEY §2.4 / BASELINE 'scaling efficiency'):
    env-steps/s of the shard_map rollout WITH the per-step obs all_gather
    vs the plain sharded rollout, on whatever mesh the backend offers
    (the driver's real-TPU runs have 1 chip; the 'all' sweep launches this
    config in an 8-device CPU-mesh subprocess, labeled as such)."""
    import jax

    from test_isaacgym_tpu.envs.franka import FrankaOscEnv
    from test_isaacgym_tpu.parallel.mesh import (
        make_env_mesh,
        global_env_tree,
        rollout_with_obs,
        shard_step,
    )

    mesh = make_env_mesh()
    env = FrankaOscEnv(num_envs=num_envs)
    state = global_env_tree(env.sim.state, mesh, num_envs)

    def obs_fn(s):
        return s.dof_pos

    run = rollout_with_obs(
        env.sim.stepper.step, obs_fn, mesh, state, env.sim.actions,
        env.sim.params, steps,
    )
    out, _ = run(state, env.sim.actions, env.sim.params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out, obs = run(out, env.sim.actions, env.sim.params)
    jax.block_until_ready(out)
    dt_g = time.perf_counter() - t0

    f = shard_step(
        lambda s, a, p: env.sim.stepper.rollout(s, a, p, steps),
        mesh, state, env.sim.actions, env.sim.params,
    )
    out2 = f(state, env.sim.actions, env.sim.params)
    jax.block_until_ready(out2)
    t0 = time.perf_counter()
    out2 = f(out2, env.sim.actions, env.sim.params)
    jax.block_until_ready(out2)
    dt_p = time.perf_counter() - t0
    return num_envs * steps / dt_g, num_envs * steps / dt_p, len(mesh.devices.ravel())


def _sol_stats(num_envs=4096):
    """Speed-of-light accounting (SURVEY §5.1): XLA cost analysis of ONE
    flagship step and one franka_cube step — logical FLOPs and bytes, the
    arithmetic intensity, and the achieved rates once timing is known.

    Interpretation: both sims are BANDWIDTH-bound (intensity << the ~100+
    FLOP/byte ridge of a TPU MXU); the ceiling is HBM streaming of the
    state pytree + contact tables, not the systolic array."""
    import jax

    out = {}
    try:
        from test_isaacgym_tpu.envs.franka import FrankaOscEnv

        env = FrankaOscEnv(num_envs=num_envs)
        f = jax.jit(env.rollout_fn(1))
        ca = f.lower(env.sim.state).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out["franka_flops_per_step"] = float(ca.get("flops", 0))
        out["franka_bytes_per_step"] = float(ca.get("bytes accessed", 0))
        if out["franka_bytes_per_step"]:
            out["franka_flop_per_byte"] = round(
                out["franka_flops_per_step"] / out["franka_bytes_per_step"], 3
            )
    except Exception as e:  # noqa: BLE001
        out["franka_error"] = repr(e)[:150]
    try:
        from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

        n = min(num_envs, 1024)
        env = FrankaCubeEnv(num_envs=n, controller="osc")
        f = jax.jit(lambda s: env.rollout(1, s)[0])
        ca = f.lower(env.init_state).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out["franka_cube_envs"] = n
        out["franka_cube_flops_per_step"] = float(ca.get("flops", 0))
        out["franka_cube_bytes_per_step"] = float(ca.get("bytes accessed", 0))
    except Exception as e:  # noqa: BLE001
        out["franka_cube_error"] = repr(e)[:150]
    return out


def _verify_checks():
    """TPU-executed correctness checks -> (dict, ok)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    checks = {}
    ok = True

    # 1) Pallas sphere-world kernel vs the pure-jnp reference solver
    try:
        from tests.test_sphere_world import _ball_args, _spec
        from test_isaacgym_tpu.ops import sphere_world as sw

        rng = np.random.RandomState(3)
        F = 96
        pos = rng.uniform(-1, 1, (F, 3)).astype(np.float32)
        pos[:, 2] = rng.uniform(0.1, 1.0, F)
        vel = rng.uniform(-1, 1, (F, 3)).astype(np.float32)
        omega = rng.uniform(-3, 3, (F, 3)).astype(np.float32)
        spec = _spec(F)
        fargs = _ball_args(pos, vel, omega)
        a = sw._jnp_solve(spec, *fargs, 1 / 120, 8, 0.01, 0.0025, 0.2)
        b = sw._pallas_solve(spec, *fargs, 1 / 120, 8, 0.01, 0.0025, 0.2)
        err = 0.0
        for x, y in zip(a[:2], b[:2]):
            scale = max(float(jnp.abs(x).max()), 1.0)
            err = max(err, float(jnp.abs(x - y).max()) / scale)
        checks["pallas_sphere_parity_relerr"] = round(err, 6)
        if err > 5e-3:
            ok = False
    except Exception as e:  # noqa: BLE001
        checks["pallas_sphere_parity_relerr"] = f"ERROR: {e!r}"[:300]
        ok = False

    # 2) one contact-rich franka_cube rollout chunk executes + stays finite
    try:
        from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

        env = FrankaCubeEnv(num_envs=64, controller="osc")
        run = jax.jit(lambda s: env.rollout(10, s)[0])
        s = run(env.init_state).sim
        finite = bool(jnp.isfinite(s.root_pos).all() & jnp.isfinite(s.dof_pos).all())
        checks["franka_cube_rollout_finite"] = finite
        ok = ok and finite
    except Exception as e:  # noqa: BLE001
        checks["franka_cube_rollout_finite"] = f"ERROR: {e!r}"[:300]
        ok = False

    checks["backend"] = jax.default_backend()
    checks["ok"] = ok
    return checks, ok


def _verify():
    checks, ok = _verify_checks()
    print(json.dumps({"verify": checks, "ok": ok}))
    return 0 if ok else 1


def _main_isolated(args):
    import subprocess

    here = os.path.abspath(__file__)
    extra = {}
    errors = {}
    flagship = None
    verify = None

    def run(cfg_args, timeout=4800):
        cmd = [sys.executable, here] + cfg_args
        try:
            p = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(
                    f"rc={p.returncode} no JSON; stderr tail: "
                    + p.stderr[-300:]
                )
            return json.loads(lines[-1])
        except Exception as e:  # noqa: BLE001 — isolation is the point
            errors[" ".join(cfg_args)] = repr(e)[:300]
            return None

    ne, st = str(args.num_envs), str(args.steps)
    r = run(["--config", "franka", "--num-envs", ne, "--steps", st])
    if r is not None:
        flagship = r.get("value")
        if "extra" in r and "soL" in r["extra"]:
            extra["soL"] = r["extra"]["soL"]
        if "errors" in r:
            errors.update(r["errors"])
    for cfg in ("franka_cube", "balls1080", "nut_bolt", "franka16k", "render"):
        r = run(["--config", cfg, "--num-envs", ne, "--steps", st])
        if r is not None:
            extra.update(r.get("extra", {}))
            if "errors" in r:
                errors.update(r["errors"])
    # sharded learner loop on the virtual 8-device CPU mesh (one real TPU
    # chip can't shard 8-way; the label carries the platform)
    import subprocess as _sp  # noqa: F401  (env-override run below)

    env8 = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
            + " --xla_cpu_use_fusion_emitters=false"
        ).strip(),
    )
    try:
        p = _sp.run(
            [sys.executable, here, "--config", "sharded", "--num-envs",
             "512", "--steps", "20"],
            capture_output=True, text=True, timeout=1800, env=env8,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if lines:
            extra.update(json.loads(lines[-1]).get("extra", {}))
        else:
            errors["sharded"] = f"rc={p.returncode} " + p.stderr[-200:]
    except Exception as e:  # noqa: BLE001
        errors["sharded"] = repr(e)[:300]
    r = run(["--verify"])
    if r is not None:
        verify = r.get("verify")

    if flagship is not None:
        out = {
            "metric": f"env-steps/s @ {args.num_envs} Franka OSC envs (1 chip)",
            "value": round(flagship, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(flagship / 1_000_000.0, 4),
        }
    elif extra:
        key, val = next(iter(extra.items()))
        out = {"metric": key, "value": val, "unit": str(key).split()[-1],
               "vs_baseline": 0.0}
    else:
        out = {"metric": "bench failed (see errors)", "value": 0,
               "unit": "env-steps/s", "vs_baseline": 0.0}
    if extra:
        out["extra"] = extra
    if errors:
        out["errors"] = errors
    if verify is not None:
        out["verify"] = verify
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument(
        "--config",
        choices=[
            "all", "franka", "franka_cube", "balls1080", "nut_bolt",
            "franka16k", "render", "sharded",
        ],
        default="all",
    )
    ap.add_argument("--smoke", action="store_true", help="tiny fast config")
    ap.add_argument(
        "--verify", action="store_true",
        help="run the TPU correctness lane instead of timing",
    )
    args = ap.parse_args()
    _enable_compile_cache()
    if args.verify:
        sys.exit(_verify())
    if args.smoke:
        args.num_envs, args.steps = 64, 10

    if args.config == "all" and not args.smoke:
        # PER-CONFIG SUBPROCESS ISOLATION: configs sharing one process
        # contaminate each other's device state — balls1080 measured 302M
        # ball-steps/s alone but 0.8M when run after the franka configs in
        # the same process (round-4 finding). A fresh process per config
        # also makes one OOM unable to erase the other numbers.
        return _main_isolated(args)

    extra = {}
    errors = {}
    flagship = None

    def attempt(name, fn):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — isolation is the point
            traceback.print_exc(file=sys.stderr)
            errors[name] = repr(e)[:300]
            return None

    if args.config in ("all", "franka"):
        flagship = attempt(
            "franka", lambda: _bench_franka(args.num_envs, args.steps)
        )
        if flagship is not None and not args.smoke:
            sol = attempt("soL", lambda: _sol_stats(args.num_envs))
            if sol is not None:
                # achieved HBM rate at the measured step time (flagship)
                fb = sol.get("franka_bytes_per_step")
                if fb:
                    dt_step = args.num_envs / flagship
                    sol["franka_achieved_GBps"] = round(fb / dt_step / 1e9, 1)
                extra["soL"] = sol
    if args.config in ("all", "franka_cube"):
        n = min(args.num_envs, 4096)
        v = attempt(
            "franka_cube",
            lambda: _bench_franka_cube(n, max(args.steps // 2, 5)),
        )
        if v is not None:
            extra[f"franka_cube@{n} env-steps/s"] = round(v, 1)
    if args.config in ("all", "balls1080"):
        v = attempt(
            "balls1080", lambda: _bench_balls(steps=50 if args.smoke else 400)
        )
        if v is not None:
            extra["balls1080 ball-steps/s"] = round(v, 1)
    if args.config in ("all", "nut_bolt"):
        n = min(args.num_envs, 1024)
        v = attempt(
            "nut_bolt",
            lambda: _bench_nut_bolt(n, max(args.steps // 2, 5)),
        )
        if v is not None:
            extra[f"nut_bolt@{n} env-steps/s"] = round(v, 1)
    if args.config == "franka16k":
        # the north star at its own scale: >1M env-steps/s at 10k+ envs
        # (BASELINE.json) — 16384 envs exercises real HBM headroom
        v = attempt(
            "franka16k", lambda: _bench_franka(16384, max(args.steps, 50))
        )
        if v is not None:
            extra["franka@16384 env-steps/s"] = round(v, 1)
    if args.config == "render":
        v = attempt("render", lambda: _bench_render())
        if v is not None:
            extra["render_1600x900 ms/frame"] = round(v, 2)
    if args.config == "sharded":
        v = attempt("sharded", lambda: _bench_sharded(512, 20))
        if v is not None:
            g, p, ndev = v
            extra[f"sharded_rollout env-steps/s ({ndev}-dev cpu mesh)"] = (
                round(g, 1)
            )
            extra["sharded_rollout_nogather env-steps/s"] = round(p, 1)

    if flagship is not None:
        out = {
            "metric": f"env-steps/s @ {args.num_envs} Franka OSC envs (1 chip)",
            "value": round(flagship, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(flagship / 1_000_000.0, 4),
        }
    elif extra:  # flagship failed/skipped: promote the first extra config
        key, val = next(iter(extra.items()))
        out = {"metric": key, "value": val, "unit": key.split()[-1],
               "vs_baseline": round(val / 1_000_000.0, 4)}
    else:
        out = {"metric": "bench failed (see errors)", "value": 0,
               "unit": "env-steps/s", "vs_baseline": 0.0}
    if extra:
        out["extra"] = extra
    if errors:
        out["errors"] = errors
    # correctness evidence rides in EVERY bench artifact (round-3 review:
    # the TPU --verify lane existed but never landed in BENCH_r*.json)
    if args.config == "all" and not args.smoke:
        try:
            out["verify"] = _verify_checks()[0]
        except Exception as e:  # noqa: BLE001
            out["verify"] = {"ok": False, "error": repr(e)[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
