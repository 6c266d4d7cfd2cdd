"""VHACD convex decomposition at asset-load time.

Counterpart of /root/reference/examples/convex_decomposition.py:81-108:
four YCB objects loaded with vhacd_enabled on/off and different resolutions,
dropped side by side on the ground. Decomposition runs through the native
C++ tool (native/vhacd_tool.cpp) with a disk cache; a decomposed asset's
link carries MULTIPLE convex-piece geoms where the undecomposed one has a
single hull.

Headless PASS checks: vhacd produces >1 piece for concave objects (banana,
mug), the undecomposed control keeps one geom, resolution is accepted, and
the decomposed bodies settle on the plane.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("convex decomposition (VHACD)", steps=90, num_envs=1)

gym = gymapi.acquire_gym()
sim_params = gymapi.SimParams()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, sim_params)
gym.add_ground(sim, gymapi.PlaneParams())

asset_root = "/root/reference/assets"

opts0 = gymapi.AssetOptions()
opts0.vhacd_enabled = True
asset0 = gym.load_asset(sim, asset_root, "urdf/ycb/011_banana/011_banana.urdf", opts0)

opts1 = gymapi.AssetOptions()
opts1.vhacd_enabled = True
opts1.vhacd_params = gymapi.VhacdParams()
opts1.vhacd_params.resolution = 300000
asset1 = gym.load_asset(sim, asset_root, "urdf/ycb/025_mug/025_mug.urdf", opts1)

opts2 = gymapi.AssetOptions()
opts2.vhacd_enabled = False
asset2 = gym.load_asset(
    sim, asset_root, "urdf/ycb/061_foam_brick/061_foam_brick.urdf", opts2
)


def n_geoms(a):
    return sum(len(l.geoms) for l in a.links)


check(n_geoms(asset0) > 1, f"banana decomposes into {n_geoms(asset0)} pieces")
check(n_geoms(asset1) > 1, f"mug decomposes into {n_geoms(asset1)} pieces")
check(n_geoms(asset2) == 1, f"control keeps 1 hull ({n_geoms(asset2)})")

env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 1), 1)
pose = gymapi.Transform()
for k, a in enumerate((asset0, asset1, asset2)):
    pose.p = gymapi.Vec3(0.3 * k - 0.3, 0.0, 0.25)
    gym.create_actor(env, a, pose, f"obj{k}", k, 1)

for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)

st = gym.acquire_actor_root_state_tensor(sim)
gym.refresh_actor_root_state_tensor(sim)
arr = np.asarray(st.buf).reshape(-1, 13)
check(bool(np.isfinite(arr).all()), "state finite")
check(bool((arr[:, 2] > -0.05).all() and (arr[:, 2] < 0.5).all()),
      f"objects rest on the plane (z {np.round(arr[:, 2], 3)})")
print("convex_decomposition OK")
