"""Relative-transform computation on the sektion cabinet.

Counterpart of /root/reference/examples/transforms.py: load the cabinet
(Y-up pose, armature 0.01, stiff PD drives :140-147), read per-body poses
via get_actor_rigid_body_states, compose the drawer/door GRASP offsets
through Transform.transform_point (:103-123), and draw wireframe axes +
spheres at the grasp frames (gymutil.AxesGeometry / WireframeSphereGeometry
:157-162 — stored by the headless viewer).

Headless PASS checks: grasp points track their handles when the drawer DOF
opens, and the Transform math matches a numpy reference.
"""
import math

import numpy as np

from _common import check, example_args
from test_isaacgym_tpu import gymapi, gymutil

args = example_args("Visualize Transforms", steps=60, num_envs=2)

gym = gymapi.acquire_gym()

sim_params = gymapi.SimParams()
sim_params.gravity = gymapi.Vec3(0.0, -9.8, 0.0)
sim_params.dt = 1.0 / 60.0
sim_params.substeps = 2
sim_params.up_axis = gymapi.UP_AXIS_Y
sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, sim_params)
plane_params = gymapi.PlaneParams()
plane_params.normal = gymapi.Vec3(0, 1, 0)
gym.add_ground(sim, plane_params)
viewer = gym.create_viewer(sim, gymapi.CameraProperties())

asset_root = "/root/reference/assets"
asset_file = "urdf/sektion_cabinet_model/urdf/sektion_cabinet.urdf"
asset_options = gymapi.AssetOptions()
asset_options.armature = 0.01
asset_options.fix_base_link = True
asset_options.use_mesh_materials = True
asset = gym.load_asset(sim, asset_root, asset_file, asset_options)

names = gym.get_asset_rigid_body_names(asset)


class Cabinet:
    DRAWER_GRASP = gymapi.Vec3(0.3, 0.0, 0.01)
    LEFT_DOOR_GRASP = gymapi.Vec3(0.03, 0.35, 0.185)
    RIGHT_DOOR_GRASP = gymapi.Vec3(0.03, -0.35, 0.185)

    def __init__(self, env, actor):
        self.env = env
        self.actor = actor
        # the reference hardcodes runtime body indices (:93-96); OUR loader's
        # link order differs (fixed anchor links collapse), so resolve the
        # SAME bodies by name — the robust form of the same lookup
        self.TOP_DRAWER_INDEX = gym.find_actor_rigid_body_handle(
            env, actor, "drawer_handle_top"
        )
        self.BOTTOM_DRAWER_INDEX = gym.find_actor_rigid_body_handle(
            env, actor, "drawer_handle_bottom"
        )
        self.LEFT_DOOR_INDEX = gym.find_actor_rigid_body_handle(
            env, actor, "door_left_nob_link"
        )
        self.RIGHT_DOOR_INDEX = gym.find_actor_rigid_body_handle(
            env, actor, "door_right_nob_link"
        )

    def get_grasp_points(self):
        poses = gym.get_actor_rigid_body_states(
            self.env, self.actor, gymapi.STATE_POS
        )["pose"]
        out = []
        for idx, off in (
            (self.TOP_DRAWER_INDEX, self.DRAWER_GRASP),
            (self.BOTTOM_DRAWER_INDEX, self.DRAWER_GRASP),
            (self.LEFT_DOOR_INDEX, self.LEFT_DOOR_GRASP),
            (self.RIGHT_DOOR_INDEX, self.RIGHT_DOOR_GRASP),
        ):
            pose = gymapi.Transform.from_buffer(poses[idx])
            point = pose.transform_point(off)
            out.append(gymapi.Transform(point, pose.r))
        return out


num_envs = args.num_envs
cabinets = []
for i in range(num_envs):
    env = gym.create_env(
        sim, gymapi.Vec3(-1, 0, -1), gymapi.Vec3(1, 1, 1), 1
    )
    pose = gymapi.Transform()
    pose.p = gymapi.Vec3(0.0, 0.41, 0.0)
    pose.r = gymapi.Quat.from_euler_zyx(-0.5 * math.pi, 0, 0)
    ahandle = gym.create_actor(env, asset, pose, "cabinet", i, 1)
    cab = Cabinet(env, ahandle)
    dof_props = gym.get_actor_dof_properties(env, ahandle)
    dof_props["stiffness"].fill(1000000.0)
    dof_props["damping"].fill(500.0)
    dof_props["driveMode"] = gymapi.DOF_MODE_POS
    dof_props["effort"].fill(1e6)
    gym.set_actor_dof_properties(env, ahandle, dof_props)
    cabinets.append(cab)

axes_geom = gymutil.AxesGeometry(0.1)
sphere_rot = gymapi.Quat.from_euler_zyx(0.5 * math.pi, 0, 0)
sphere_pose = gymapi.Transform(r=sphere_rot)
sphere_geom = gymutil.WireframeSphereGeometry(
    0.02, 12, 12, sphere_pose, color=(1, 1, 0)
)

# transform_point parity vs numpy on a non-trivial pose
t = gymapi.Transform(
    gymapi.Vec3(1, 2, 3), gymapi.Quat.from_euler_zyx(0.3, -0.2, 0.5)
)
p = t.transform_point(gymapi.Vec3(0.3, 0.0, 0.01))
q = np.array([t.r.x, t.r.y, t.r.z, t.r.w])
v = np.array([0.3, 0.0, 0.01])
tq = 2 * np.cross(q[:3], v)
want = v + q[3] * tq + np.cross(q[:3], tq) + np.array([1, 2, 3])
check(np.allclose([p.x, p.y, p.z], want, atol=1e-6), "transform_point math")

grasp0 = [cab.get_grasp_points() for cab in cabinets]

# open the top drawer via its PD drive; grasp point must FOLLOW the handle
drawer_dof = 2  # door_left, door_right, drawer_top, drawer_bottom
dnames = gym.get_asset_dof_names(asset)
for i, n in enumerate(dnames):
    if "drawer_top" in n:
        drawer_dof = i
for cab in cabinets:
    gym.set_dof_target_position(cab.env, drawer_dof, 0.3)

for _ in range(args.steps):
    gym.simulate(sim)
    gym.fetch_results(sim, True)
    gym.clear_lines(viewer)
    for cab in cabinets:
        for g in cab.get_grasp_points():
            gymutil.draw_lines(axes_geom, gym, viewer, cab.env, g)
            gymutil.draw_lines(sphere_geom, gym, viewer, cab.env, g)
    gym.step_graphics(sim)
    gym.draw_viewer(viewer, sim, True)

grasp1 = [cab.get_grasp_points() for cab in cabinets]
moved = np.linalg.norm([
    grasp1[0][0].p.x - grasp0[0][0].p.x,
    grasp1[0][0].p.y - grasp0[0][0].p.y,
    grasp1[0][0].p.z - grasp0[0][0].p.z,
])
check(moved > 0.05, f"top-drawer grasp point follows the opened drawer ({moved:.3f} m)")
still = np.linalg.norm([
    grasp1[0][2].p.x - grasp0[0][2].p.x,
    grasp1[0][2].p.y - grasp0[0][2].p.y,
    grasp1[0][2].p.z - grasp0[0][2].p.z,
])
check(still < 0.02, f"left-door grasp stays put ({still:.3f} m)")
print("transforms OK")
