"""Asset & actor introspection printout over the reference's own assets.

Counterpart of /root/reference/examples/asset_info.py and
test/test01_isaacgym_asset.py:12-101 (print_asset_info / print_actor_info).
"""
from _common import check, example_args
from test_isaacgym_tpu import gymapi

example_args("asset info")
gym = gymapi.acquire_gym()
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())

ASSETS = [
    ("urdf/franka_description/robots/franka_panda.urdf", 9),
    ("urdf/cartpole.urdf", 2),
    ("mjcf/nv_ant.xml", 8),
]


def print_asset_info(asset, name):
    print(f"=== Asset: {name} ===")
    nb = gym.get_asset_rigid_body_count(asset)
    nj = gym.get_asset_joint_count(asset)
    nd = gym.get_asset_dof_count(asset)
    print(f"  bodies {nb}  joints {nj}  dofs {nd}")
    for i in range(nb):
        print("  body", i, gym.get_asset_rigid_body_name(asset, i))
    for i in range(nj):
        t = gym.get_asset_joint_type(asset, i)
        print("  joint", i, gym.get_asset_joint_name(asset, i), gym.get_joint_type_string(t))
    for i in range(nd):
        t = gym.get_asset_dof_type(asset, i)
        print("  dof", i, gym.get_asset_dof_name(asset, i), gym.get_dof_type_string(t))
    return nd


for f, expected_dofs in ASSETS:
    asset = gym.load_asset(sim, "/root/reference/assets", f, gymapi.AssetOptions())
    nd = print_asset_info(asset, f)
    check(nd == expected_dofs, f"{f}: {nd} dofs (expected {expected_dofs})")

    env = gym.create_env(sim, gymapi.Vec3(-1, -1, 0), gymapi.Vec3(1, 1, 2), 1)
    a = gym.create_actor(env, asset, gymapi.Transform(gymapi.Vec3(0, 0, 1)), f, 0, 0)
    print("  actor bodies:", gym.get_actor_rigid_body_dict(env, a))
    print("  actor dofs:", gym.get_actor_dof_dict(env, a))
    props = gym.get_actor_dof_properties(env, a)
    print("  dof props:", {k: props[k][:3] for k in ("hasLimits", "lower", "upper", "stiffness", "damping")})
    break  # one sim can hold one homogeneous layout; re-run per asset below

for f, expected_dofs in ASSETS[1:]:
    sim2 = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    asset = gym.load_asset(sim2, "/root/reference/assets", f, gymapi.AssetOptions())
    nd = print_asset_info(asset, f)
    check(nd == expected_dofs, f"{f}: {nd} dofs (expected {expected_dofs})")
print("asset_info OK")
