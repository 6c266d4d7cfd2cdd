"""RL vec-env surface + viewer frame capture.

Counterpart of /root/reference/common/capture_videos.py: `isaacgymenvs.make`
builds a vectorized task env (`Ant`, 20 envs), `reset()` then a loop of
`render(mode="rgb_array")` + `step(random actions)` (:6-31). The reference
records mp4s via gym.wrappers.RecordVideo; here frames are saved as PNGs
(no video encoder in the image) — the capture surface is the same
`render()` array.

Headless PASS checks: obs/reward/done shapes, the render array shape, the
ant actually moves under random torques, and frames land on disk.
"""
import os

import numpy as np

from _common import check, example_args
from test_isaacgym_tpu.envs import rl_env

args = example_args("capture videos (RL vec-env surface)", steps=60, num_envs=20)

envs = rl_env.make(
    seed=0,
    task="Ant",
    num_envs=args.num_envs,
    sim_device="tpu",
    rl_device="tpu",
    graphics_device_id=0,
    headless=True,
    virtual_screen_capture=True,
    force_render=True,
)
envs.is_vector_env = True

obs = envs.reset()
check(obs.shape[0] == args.num_envs, f"reset obs batch ({obs.shape})")
frame = envs.render(mode="rgb_array")
print("the image of the viewer is an array of shape", frame.shape)
check(frame.shape == (240, 320, 3), f"render shape {frame.shape}")

rng = np.random.RandomState(0)
outdir = "/tmp/tig_videos"
os.makedirs(outdir, exist_ok=True)
z0 = obs[:, 0].copy()
saved = 0
for t in range(args.steps):
    obs, reward, done, info = envs.step(
        rng.uniform(-1, 1, (args.num_envs,) + envs.action_space.shape)
    )
    if t % 20 == 0:
        frame = envs.render(mode="rgb_array")
        try:
            from PIL import Image

            Image.fromarray(frame).save(f"{outdir}/rl-video-step-{t}.png")
            saved += 1
        except ImportError:
            np.save(f"{outdir}/rl-video-step-{t}.npy", frame)
            saved += 1

check(obs.shape == (args.num_envs,) + envs.observation_space.shape,
      f"obs shape {obs.shape}")
check(reward.shape == (args.num_envs,), f"reward shape {reward.shape}")
check(done.dtype == bool and done.shape == (args.num_envs,), "done mask")
moved = np.abs(obs[:, 0] - z0).max()
check(bool(np.isfinite(obs).all()), "obs finite")
check(moved > 1e-3, f"ants respond to torques (dz {moved:.4f})")
check(saved >= 2, f"captured {saved} frames to {outdir}")
print("capture_videos OK")
