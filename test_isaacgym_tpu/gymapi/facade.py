"""Reference-compatible handle-based API facade (SURVEY.md N1, §2.3).

This module re-provides the IsaacGym `gymapi` call surface the reference
scripts exercise — handle-based scene construction, classic structured-array
state I/O, the tensor API, properties, attractors, cameras, and a headless
viewer — on top of the native `core.Simulator`. Handles are integer indices
into batched arrays (SURVEY.md §7.1); the build phase is eager host Python;
the first call that needs physics finalizes the scene into pytrees.

Positions in state I/O are env-LOCAL (the convention the reference scripts
assume — see franka_osc.py:144-147 mixing env-local `get_rigid_transform`
init poses with tensor states).

Not a copy of any reference file: the reference only *calls* this API
(its implementation is NVIDIA's closed-source binary).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..assets import load_mjcf, load_urdf
from ..assets.primitives import create_box as _mk_box
from ..assets.primitives import create_capsule as _mk_capsule
from ..assets.primitives import create_sphere as _mk_sphere
from ..assets.types import (
    DOF_PROPS_DTYPE,
    DOF_ROTATION,
    DOF_STATE_DTYPE,
    DOF_TRANSLATION,
    JOINT_FIXED,
    JOINT_FLOATING,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    JOINT_SPHERICAL,
    RIGID_BODY_STATE_DTYPE,
    AssetSpec,
)
from ..core.config import (
    AssetOptions,
    AttractorProperties,
    CameraProperties,
    PlaneParams,
    SimParams,
)
from ..core.scene import SceneBuilder
from ..core.sim import Simulator
from ..render.camera import (
    FOLLOW_POSITION,
    FOLLOW_TRANSFORM,
    CameraSensor,
    proj_matrix as _proj_matrix,
    quat_to_mat_np,
    view_matrix as _view_matrix,
)
from .mathtypes import Quat, Transform, Vec3, Velocity

# ---------------------------------------------------------------------------
# enums (names/values follow gymapi where observable)
STATE_NONE = 0
STATE_POS = 1
STATE_VEL = 2
STATE_ALL = 3

DOF_MODE_NONE = 0
DOF_MODE_POS = 1
DOF_MODE_VEL = 2
DOF_MODE_EFFORT = 3

DOMAIN_ACTOR = 0
DOMAIN_ENV = 1
DOMAIN_SIM = 2

ENV_SPACE = 0
LOCAL_SPACE = 1
GLOBAL_SPACE = 2

IMAGE_COLOR = 0
IMAGE_DEPTH = 1
IMAGE_SEGMENTATION = 2
IMAGE_OPTICAL_FLOW = 3

MESH_VISUAL = 0
MESH_COLLISION = 1
MESH_VISUAL_AND_COLLISION = 2

COMPUTE_PER_VERTEX = 0
COMPUTE_PER_FACE = 1
FROM_ASSET = 2

RIGID_BODY_NONE = 0
RIGID_BODY_DISABLE_GRAVITY = 1
RIGID_BODY_DISABLE_SIMULATION = 2

JOINT_MODE_NONE = 0

INVALID_HANDLE = -1
DEFAULT_VIEWER_WIDTH = 1600
DEFAULT_VIEWER_HEIGHT = 900

KEY_R = "KEY_R"
KEY_SPACE = "KEY_SPACE"
KEY_ESCAPE = "KEY_ESCAPE"
MOUSE_LEFT_BUTTON = "MOUSE_LEFT_BUTTON"

_JOINT_TYPE_CODE = {
    JOINT_FIXED: 0,
    JOINT_REVOLUTE: 1,
    JOINT_PRISMATIC: 2,
    JOINT_SPHERICAL: 3,
    JOINT_FLOATING: 4,
}
_JOINT_TYPE_STRING = {
    0: "JOINT_FIXED",
    1: "JOINT_REVOLUTE",
    2: "JOINT_PRISMATIC",
    3: "JOINT_SPHERICAL",
    4: "JOINT_FLOATING",
}
_DOF_TYPE_STRING = {DOF_ROTATION: "DOF_ROTATION", DOF_TRANSLATION: "DOF_TRANSLATION"}


class Env:
    __slots__ = ("sim", "idx")

    def __init__(self, sim: "Sim", idx: int):
        self.sim = sim
        self.idx = idx


class Viewer:
    """Headless viewer (SURVEY.md N14): programmatic event injection replaces
    windowing; draw state is recorded, optionally rendered offscreen."""

    def __init__(self, sim: "Sim", props: Optional[CameraProperties]):
        self.sim = sim
        self.props = props or CameraProperties(
            width=DEFAULT_VIEWER_WIDTH, height=DEFAULT_VIEWER_HEIGHT
        )
        self.closed = False
        self.cam_pos = np.array([5.0, 5.0, 3.0])
        self.cam_quat = np.array([0.0, 0, 0, 1.0])
        self.subscriptions: Dict[str, str] = {}
        self._injected: List[Tuple[str, float]] = []
        self.mouse_pos = (0.0, 0.0)
        # debug-draw segments: (env_idx, segs (K, 2, 3) world, colors (K, 3))
        self.lines: List[Tuple[int, np.ndarray, np.ndarray]] = []
        self.frames = 0

    # programmatic injection (replaces real keyboard/mouse)
    def inject_event(self, name: str, value: float = 1.0):
        self._injected.append((name, value))

    def close(self):
        self.closed = True


@dataclasses.dataclass
class _ActionEvent:
    action: str
    value: float


class _TensorHandle:
    """Opaque device-state view descriptor returned by acquire_* — the
    reference's CUDA pointer replaced by a host-synced numpy buffer
    (gymtorch.wrap_tensor gives a shared-memory torch view)."""

    __slots__ = ("sim", "name", "buf")

    def __init__(self, sim: "Sim", name: str, buf: np.ndarray):
        self.sim = sim
        self.name = name
        self.buf = buf

    @property
    def data_address(self) -> int:
        return self.buf.ctypes.data


class _DofFrame:
    __slots__ = ("origin", "axis")

    def __init__(self, origin: Vec3, axis: Vec3):
        self.origin = origin
        self.axis = axis


@dataclasses.dataclass
class RigidShapeProperties:
    """Per-shape material record (get/set_actor_rigid_shape_properties —
    examples/body_physics_props.py:119-172)."""

    friction: float = 1.0
    rolling_friction: float = 0.0
    torsion_friction: float = 0.0
    restitution: float = 0.0
    compliance: float = 0.0
    thickness: float = 0.0
    filter: int = 0


@dataclasses.dataclass
class SoftMaterial:
    """FEM soft-body material record (get/set_actor_soft_materials —
    /root/reference/examples/soft_body.py:86-133)."""

    youngs: float = 1e5
    poissons: float = 0.45
    damping: float = 0.0
    activation: float = 0.0
    activationMax: float = 0.0
    model: int = 0


@dataclasses.dataclass
class TetTriRange:
    """(start, count) range into the sim-wide tet/tri arrays
    (get_actor_tetrahedra_range — soft_body.py:166-168)."""

    start: int = 0
    count: int = 0


@dataclasses.dataclass
class RigidBodyProperties:
    """Per-body inertial record (get/set_actor_rigid_body_properties —
    examples/body_physics_props.py:191-194)."""

    mass: float = 0.0
    com: object = None
    inertia: object = None
    flags: int = 0
    invMass: float = 0.0

    def __post_init__(self):
        if self.com is None:
            self.com = Vec3()


class Sim:
    """Sim handle: builder-phase registries + the finalized Simulator."""

    def __init__(self, params: SimParams):
        self.params = params
        self.builder = SceneBuilder(params)
        self.sim: Optional[Simulator] = None
        self.envs: List[Env] = []
        self.assets: List[AssetSpec] = []
        self._t0 = time.time()
        # per-(env, slot) pending overrides applied at finalize
        self._dof_props: Dict[Tuple[int, int], np.ndarray] = {}
        self._dof_states: Dict[Tuple[int, int], np.ndarray] = {}
        self._shape_props: Dict[Tuple[int, int], list] = {}
        self._body_props: Dict[Tuple[int, int], list] = {}
        self._scales: Dict[Tuple[int, int], float] = {}
        self._pos_targets: Dict[Tuple[int, int], np.ndarray] = {}
        self._vel_targets: Dict[Tuple[int, int], np.ndarray] = {}
        self._pending_dof_targets: list = []  # (env, dof_handle, target)
        # tensor-API buffers
        self._tensors: Dict[str, _TensorHandle] = {}
        self._jacobians: Dict[str, tuple] = {}
        self._mass_matrices: Dict[str, tuple] = {}
        # cameras / graphics
        self.cameras: List[CameraSensor] = []
        self._cam_counter: Dict[int, int] = {}
        self.lights = {
            0: (
                np.array([0.8, 0.8, 0.8]),
                np.array([0.25, 0.25, 0.25]),
                np.array([-0.3, -0.3, -1.0]) / np.linalg.norm([0.3, 0.3, 1.0]),
            )
        }
        self.textures: List[np.ndarray] = []
        self._shape_color: Optional[np.ndarray] = None  # (N, S, 3)
        self._shape_tex: Optional[np.ndarray] = None  # (N, S) texture id, -1 none
        self._pending_colors: list = []  # (env_idx, slot, body, rgb) pre-build
        self._render_tables = None
        self._oneshot_force = False
        self._oneshot_effort = False
        self.attractor_handles: List[Tuple[int, int]] = []  # (env, idx)

    # -- build/finalize ------------------------------------------------------
    @property
    def built(self) -> bool:
        return self.sim is not None

    def _ensure_built(self):
        if self.sim is not None:
            return
        import jax.numpy as jnp

        self.sim = Simulator(*self.builder.finalize())
        scene = self.sim.scene
        # apply pending property overrides
        for (e, slot), props in self._dof_props.items():
            self._write_dof_props(e, slot, props)
        for (e, slot), st in self._dof_states.items():
            self._write_dof_state(e, slot, st)
        for (e, slot), lst in self._shape_props.items():
            self._write_shape_props(e, slot, lst)
        for (e, slot), lst in self._body_props.items():
            self._write_body_props(e, slot, lst)
        for (e, slot), s in self._scales.items():
            self._write_scale(e, slot, s)
        for (e, slot), t in self._pos_targets.items():
            self._write_targets(e, slot, t, "dof_pos_target")
        for (e, slot), t in self._vel_targets.items():
            self._write_targets(e, slot, t, "dof_vel_target")
        for (e, dof, tgt) in self._pending_dof_targets:
            a = self.sim.actions
            self.sim.actions = a._replace(
                dof_pos_target=a.dof_pos_target.at[e, dof].set(tgt)
            )
        self.sim.state = self.sim.stepper.refresh_body_state(
            self.sim.state, self.sim.params
        )
        self.sim.initial_state = self.sim.state
        from ..render.raster import tables_from_scene

        self._render_tables = tables_from_scene(scene)
        self._shape_color = np.tile(
            self._render_tables.color[None], (scene.num_envs, 1, 1)
        ).astype(np.float32)
        self._shape_tex = np.full(
            (scene.num_envs, scene.shapes.count), -1, np.int32
        )
        for e, slot, body, color in self._pending_colors:
            m = scene.actors[slot]
            mask = scene.shapes.body_slot == (m.body_start + body)
            self._shape_color[e, mask] = color
        self._pending_colors = []

    # -- override writers (device param updates) ------------------------------
    def _meta(self, slot: int):
        if self.built:
            return self.sim.scene.actors[slot]
        # pre-build: reconstruct offsets from proto layout
        protos = self.builder.envs[0]
        body, dof, shape = 0, 0, 0
        for s, p in enumerate(protos):
            if s == slot:
                return dataclasses.make_dataclass(
                    "M",
                    [
                        "asset",
                        "body_start",
                        "body_count",
                        "dof_start",
                        "dof_count",
                        "shape_start",
                        "shape_count",
                        "name",
                    ],
                )(
                    p.asset,
                    body,
                    p.asset.num_bodies,
                    dof,
                    p.asset.num_dofs,
                    shape,
                    sum(len(l.geoms) for l in p.asset.links),
                    p.name,
                )
            body += p.asset.num_bodies
            dof += p.asset.num_dofs
            shape += sum(len(l.geoms) for l in p.asset.links)
        raise IndexError(slot)

    def _write_dof_props(self, e: int, slot: int, props: np.ndarray):
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        sl = slice(m.dof_start, m.dof_start + m.dof_count)
        p = self.sim.params

        def upd(arr, field, dtype=np.float32):
            return arr.at[e, sl].set(jnp.asarray(props[field].astype(dtype)))

        self.sim.params = p._replace(
            dof_stiffness=upd(p.dof_stiffness, "stiffness"),
            dof_damping=upd(p.dof_damping, "damping"),
            dof_armature=upd(p.dof_armature, "armature"),
            dof_friction=upd(p.dof_friction, "friction"),
            dof_lower=upd(p.dof_lower, "lower"),
            dof_upper=upd(p.dof_upper, "upper"),
            dof_has_limits=p.dof_has_limits.at[e, sl].set(
                jnp.asarray(props["hasLimits"])
            ),
            dof_max_effort=upd(p.dof_max_effort, "effort"),
            dof_max_velocity=upd(p.dof_max_velocity, "velocity"),
            dof_drive_mode=p.dof_drive_mode.at[e, sl].set(
                jnp.asarray(props["driveMode"].astype(np.int32))
            ),
        )

    def _write_dof_state(self, e: int, slot: int, st: np.ndarray):
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        sl = slice(m.dof_start, m.dof_start + m.dof_count)
        s = self.sim.state
        self.sim.state = s._replace(
            dof_pos=s.dof_pos.at[e, sl].set(jnp.asarray(st["pos"])),
            dof_vel=s.dof_vel.at[e, sl].set(jnp.asarray(st["vel"])),
        )

    def _write_shape_props(self, e: int, slot: int, lst: list):
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        p = self.sim.params
        fr = np.array(p.shape_friction[e])
        re = np.array(p.shape_restitution[e])
        for i, sp in enumerate(lst):
            fr[m.shape_start + i] = sp.friction
            re[m.shape_start + i] = sp.restitution
        self.sim.params = p._replace(
            shape_friction=p.shape_friction.at[e].set(jnp.asarray(fr)),
            shape_restitution=p.shape_restitution.at[e].set(jnp.asarray(re)),
        )

    def _write_body_props(self, e: int, slot: int, lst: list):
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        p = self.sim.params
        mass = np.array(p.body_mass[e])
        com = np.array(p.body_com[e])
        inertia = np.array(p.body_inertia[e])
        nograv = np.array(p.body_disable_gravity[e])
        for i, bp in enumerate(lst):
            b = m.body_start + i
            mass[b] = bp.mass
            com[b] = [bp.com.x, bp.com.y, bp.com.z]
            if getattr(bp, "inertia", None) is not None:
                inertia[b] = bp.inertia
            nograv[b] = bool(bp.flags & RIGID_BODY_DISABLE_GRAVITY)
        self.sim.params = p._replace(
            body_mass=p.body_mass.at[e].set(jnp.asarray(mass)),
            body_com=p.body_com.at[e].set(jnp.asarray(com)),
            body_inertia=p.body_inertia.at[e].set(jnp.asarray(inertia)),
            body_disable_gravity=p.body_disable_gravity.at[e].set(
                jnp.asarray(nograv)
            ),
        )

    def _write_scale(self, e: int, slot: int, scale: float):
        """Scales collision geometry + inertial params (set_actor_scale —
        examples/actor_scaling.py:126). Articulated joint frames stay at the
        asset's scale in v1 (documented limitation)."""
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        p = self.sim.params
        ssl = slice(m.shape_start, m.shape_start + m.shape_count)
        bsl = slice(m.body_start, m.body_start + m.body_count)
        s = float(scale)
        self.sim.params = p._replace(
            shape_size=p.shape_size.at[e, ssl].multiply(s),
            shape_pos=p.shape_pos.at[e, ssl].multiply(s),
            body_mass=p.body_mass.at[e, bsl].multiply(s**3),
            body_com=p.body_com.at[e, bsl].multiply(s),
            body_inertia=p.body_inertia.at[e, bsl].multiply(s**5),
        )

    def _write_targets(self, e: int, slot: int, t: np.ndarray, field: str):
        import jax.numpy as jnp

        m = self.sim.scene.actors[slot]
        sl = slice(m.dof_start, m.dof_start + m.dof_count)
        a = self.sim.actions
        self.sim.actions = a._replace(
            **{field: getattr(a, field).at[e, sl].set(jnp.asarray(t))}
        )

    def _slot_of_body_prebuild(self, env_idx: int, body_handle: int) -> int:
        b = 0
        for slot, p in enumerate(self.builder.envs[env_idx]):
            if body_handle < b + p.asset.num_bodies:
                return slot
            b += p.asset.num_bodies
        raise IndexError(body_handle)

    # -- host FK for pre-build queries ---------------------------------------
    def _host_fk(self, env_idx: int, slot: int):
        """Eager per-actor FK from initial pose + pending dof states.
        Spherical joints evaluated at zero; revolute/prismatic/fixed exact."""
        proto = self.builder.envs[env_idx][slot]
        asset = proto.asset
        q = np.zeros(asset.num_dofs)
        if (env_idx, slot) in self._dof_states:
            q = self._dof_states[(env_idx, slot)]["pos"].astype(np.float64)
        pos = np.zeros((asset.num_bodies, 3))
        quat = np.zeros((asset.num_bodies, 4))
        pos[0] = proto.pos
        quat[0] = proto.quat
        di = 0
        from ..assets.types import _quat_mul_np, _quat_to_mat_np

        for i, l in enumerate(asset.links):
            j = l.joint
            if j is None:
                continue
            pp, pq = pos[l.parent], quat[l.parent]
            jp = pp + _quat_to_mat_np(pq) @ np.asarray(j.parent_pos)
            jq = _quat_mul_np(pq, j.parent_quat)
            if j.jtype == JOINT_REVOLUTE:
                ax = np.asarray(j.axis) / max(np.linalg.norm(j.axis), 1e-9)
                h = q[di] / 2
                rq = np.array([*(np.sin(h) * ax), np.cos(h)])
                jq = _quat_mul_np(jq, rq)
                di += 1
            elif j.jtype == JOINT_PRISMATIC:
                ax = np.asarray(j.axis) / max(np.linalg.norm(j.axis), 1e-9)
                jp = jp + _quat_to_mat_np(jq) @ (ax * q[di])
                di += 1
            else:
                di += j.num_dofs
            pos[i] = jp + _quat_to_mat_np(jq) @ np.asarray(j.child_pos)
            quat[i] = _quat_mul_np(jq, j.child_quat)
        return pos, quat


# ---------------------------------------------------------------------------
class Gym:
    """The API singleton returned by acquire_gym() — every method mirrors a
    reference call site (SURVEY.md §2.3 inventory)."""

    # -- lifecycle ----------------------------------------------------------
    def create_sim(
        self,
        compute_device: int = 0,
        graphics_device: int = 0,
        engine: int = 0,
        params: Optional[SimParams] = None,
    ) -> Sim:
        return Sim(params or SimParams())

    def prepare_sim(self, sim: Sim) -> bool:
        sim._ensure_built()
        return True

    def simulate(self, sim: Sim):
        sim._ensure_built()
        sim.sim.step()
        if sim._oneshot_force:
            import jax.numpy as jnp

            a = sim.sim.actions
            sim.sim.actions = a._replace(
                body_force=jnp.zeros_like(a.body_force),
                body_torque=jnp.zeros_like(a.body_torque),
                dof_effort=jnp.zeros_like(a.dof_effort)
                if sim._oneshot_effort
                else a.dof_effort,
                use_force_pos=jnp.zeros((), bool),
            )
            sim._oneshot_force = False
            sim._oneshot_effort = False

    def fetch_results(self, sim: Sim, wait: bool = True):
        if sim.built:
            import jax

            jax.block_until_ready(sim.sim.state.root_pos)

    def step_graphics(self, sim: Sim):
        pass  # body transforms are always fresh (functional state)

    def sync_frame_time(self, sim: Sim):
        pass  # headless: no realtime throttle

    def get_sim_time(self, sim: Sim) -> float:
        return float(sim.sim.state.time) if sim.built else 0.0

    def get_elapsed_time(self, sim: Sim) -> float:
        return time.time() - sim._t0

    def get_frame_count(self, sim: Sim) -> int:
        return int(sim.sim.state.steps) if sim.built else 0

    def destroy_sim(self, sim: Sim):
        sim.sim = None

    # -- world building -----------------------------------------------------
    def add_ground(self, sim: Sim, params: PlaneParams):
        sim.builder.add_ground(params)

    def add_triangle_mesh(self, sim: Sim, vertices, triangles, params):
        """Static triangle-mesh collider (terrain —
        examples/terrain_creation.py:119). Contact is heightfield-native
        (SURVEY.md N10): the mesh is rasterized back to a heightfield (exact
        for terrain_utils grids); the trimesh itself is kept for rendering."""
        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        t = np.asarray(triangles, np.uint32).reshape(-1, 3)
        ox = oy = 0.0
        if params is not None and getattr(params, "transform", None) is not None:
            ox, oy = params.transform.p.x, params.transform.p.y
        sim.builder.trimesh = (v, t, params)
        sim.builder.add_trimesh_as_heightfield(v, t, offset_x=ox, offset_y=oy)

    def add_heightfield(self, sim: Sim, heightfield_raw, params):
        """Native heightfield terrain (gymapi.HeightFieldParams semantics:
        row/column spacing + vertical scale + transform offset)."""
        hs = getattr(params, "column_scale", getattr(params, "horizontal_scale", 1.0))
        vs = getattr(params, "vertical_scale", 1.0)
        ox = oy = 0.0
        if getattr(params, "transform", None) is not None:
            ox, oy = params.transform.p.x, params.transform.p.y
        sim.builder.add_heightfield(
            np.asarray(heightfield_raw), hs, vs, offset_x=ox, offset_y=oy
        )

    def create_env(self, sim: Sim, lower: Vec3, upper: Vec3, per_row: int) -> Env:
        i = sim.builder.create_env(
            (lower.x, lower.y, lower.z), (upper.x, upper.y, upper.z), per_row
        )
        env = Env(sim, i)
        sim.envs.append(env)
        return env

    def create_actor(
        self,
        env: Env,
        asset: AssetSpec,
        pose: Transform,
        name: str = "actor",
        group: int = 0,
        filter: int = 0,
        seg_id: int = 0,
    ) -> int:
        if env.sim.built:
            raise RuntimeError(
                "create_actor after the scene was finalized (first simulate/"
                "state access); build the whole scene first"
            )
        return env.sim.builder.create_actor(
            env.idx,
            asset,
            pos=(pose.p.x, pose.p.y, pose.p.z),
            quat=(pose.r.x, pose.r.y, pose.r.z, pose.r.w),
            name=name,
            group=group,
            filter=filter,
            seg_id=seg_id,
        )

    # -- assets ---------------------------------------------------------------
    def load_asset(
        self, sim: Sim, rootpath: str, filename: str, options: Optional[AssetOptions] = None
    ) -> AssetSpec:
        options = options or AssetOptions()
        kw = dict(
            fix_base_link=options.fix_base_link,
            armature=options.armature,
            density=options.density,
            default_dof_drive_mode=options.default_dof_drive_mode,
        )
        if filename.lower().endswith((".xml", ".mjcf")):
            asset = load_mjcf(rootpath, filename, **kw)
        else:
            asset = load_urdf(
                rootpath,
                filename,
                collapse_fixed=options.collapse_fixed_joints,
                use_mesh_materials=options.use_mesh_materials,
                **kw,
            )
        asset.disable_gravity = options.disable_gravity
        # COMPUTE_PER_VERTEX (0, default) = smooth interpolated normals in
        # the visual-mesh render pass; anything else = flat face normals
        # (graphics_materials.py:30 mesh_normal_mode semantics)
        asset.mesh_normal_mode = options.mesh_normal_mode
        asset.thickness = options.thickness
        asset.linear_damping = options.linear_damping
        asset.angular_damping = options.angular_damping
        asset.max_linear_velocity = options.max_linear_velocity
        asset.max_angular_velocity = options.max_angular_velocity
        if options.vhacd_enabled:
            # convex decomposition runs at asset-load time via the offline
            # C++ tool when built; meshes otherwise collide as convex hulls
            # of their vertices (assets/mesh.py)
            from ..assets.vhacd import decompose_asset

            decompose_asset(asset, options.vhacd_params)
        sim.assets.append(asset)
        return asset

    def create_box(self, sim: Sim, sx, sy, sz, options: Optional[AssetOptions] = None):
        o = options or AssetOptions()
        return _mk_box(sx, sy, sz, density=o.density, **_prim_opts(o))

    def create_sphere(self, sim: Sim, radius, options: Optional[AssetOptions] = None):
        o = options or AssetOptions()
        return _mk_sphere(radius, density=o.density, **_prim_opts(o))

    def create_capsule(self, sim: Sim, radius, half_len, options=None):
        o = options or AssetOptions()
        return _mk_capsule(radius, half_len, density=o.density, **_prim_opts(o))

    # asset introspection (test/test01_isaacgym_asset.py:12-40)
    def get_asset_rigid_body_count(self, asset: AssetSpec) -> int:
        return asset.num_bodies

    def get_asset_rigid_body_names(self, asset) -> List[str]:
        return asset.rigid_body_names()

    def get_asset_rigid_body_name(self, asset, i: int) -> str:
        return asset.rigid_body_names()[i]

    def get_asset_rigid_body_dict(self, asset) -> dict:
        return asset.rigid_body_dict()

    def get_asset_joint_count(self, asset) -> int:
        return asset.num_joints

    def get_asset_joint_names(self, asset) -> List[str]:
        return asset.joint_names()

    def get_asset_joint_name(self, asset, i: int) -> str:
        return asset.joint_names()[i]

    def get_asset_joint_dict(self, asset) -> dict:
        return asset.joint_dict()

    def get_asset_joint_type(self, asset, i: int) -> int:
        return _JOINT_TYPE_CODE[asset.joints[i].jtype]

    def get_joint_type_string(self, jtype: int) -> str:
        return _JOINT_TYPE_STRING[int(jtype)]

    def get_asset_dof_count(self, asset) -> int:
        return asset.num_dofs

    def get_asset_dof_names(self, asset) -> List[str]:
        return asset.dof_names()

    def get_asset_dof_name(self, asset, i: int) -> str:
        return asset.dof_names()[i]

    def get_asset_dof_dict(self, asset) -> dict:
        return asset.dof_dict()

    def get_asset_dof_type(self, asset, i: int) -> int:
        return asset.dof_types()[i]

    def get_dof_type_string(self, dtype: int) -> str:
        return _DOF_TYPE_STRING[int(dtype)]

    def get_asset_dof_properties(self, asset) -> np.ndarray:
        return asset.dof_properties()

    def get_asset_actuator_count(self, asset) -> int:
        return 0

    def get_asset_tendon_count(self, asset) -> int:
        return 0

    def get_asset_soft_body_count(self, asset) -> int:
        """Count of `<fem>` links (soft_body.py:84) — XPBD backend
        (physics/soft.py, SURVEY.md N11)."""
        return sum(1 for l in asset.links if getattr(l, "fem", None) is not None)

    def get_asset_soft_materials(self, asset) -> list:
        return [
            SoftMaterial(
                youngs=l.fem.youngs,
                poissons=l.fem.poissons,
                damping=l.fem.damping,
            )
            for l in asset.links
            if getattr(l, "fem", None) is not None
        ]

    # -- actor introspection --------------------------------------------------
    def get_actor_count(self, env: Env) -> int:
        return len(env.sim.builder.envs[env.idx])

    def get_actor_handle(self, env: Env, i: int) -> int:
        return i

    def get_actor_name(self, env: Env, actor: int) -> str:
        return env.sim.builder.envs[env.idx][actor].name

    def find_actor_handle(self, env: Env, name: str) -> int:
        for i, p in enumerate(env.sim.builder.envs[env.idx]):
            if p.name == name:
                return i
        return INVALID_HANDLE

    def get_env_count(self, sim: Sim) -> int:
        return len(sim.envs)

    def get_env(self, sim: Sim, i: int) -> Env:
        return sim.envs[i]

    def _asset_of(self, env: Env, actor: int) -> AssetSpec:
        return env.sim.builder.envs[env.idx][actor].asset

    def get_actor_rigid_body_count(self, env: Env, actor: int) -> int:
        return self._asset_of(env, actor).num_bodies

    def get_actor_rigid_body_names(self, env, actor) -> List[str]:
        return self._asset_of(env, actor).rigid_body_names()

    def get_actor_rigid_body_dict(self, env, actor) -> dict:
        return self._asset_of(env, actor).rigid_body_dict()

    def get_actor_joint_count(self, env, actor) -> int:
        return self._asset_of(env, actor).num_joints

    def get_actor_joint_names(self, env, actor) -> List[str]:
        return self._asset_of(env, actor).joint_names()

    def get_actor_joint_dict(self, env, actor) -> dict:
        return self._asset_of(env, actor).joint_dict()

    def get_actor_dof_count(self, env, actor) -> int:
        return self._asset_of(env, actor).num_dofs

    def get_actor_dof_names(self, env, actor) -> List[str]:
        return self._asset_of(env, actor).dof_names()

    def get_actor_dof_dict(self, env, actor) -> dict:
        return self._asset_of(env, actor).dof_dict()

    def get_actor_rigid_body_handle(self, env: Env, actor: int, i: int) -> int:
        return env.sim._meta(actor).body_start + i

    def find_actor_rigid_body_handle(self, env: Env, actor: int, name: str) -> int:
        d = self._asset_of(env, actor).rigid_body_dict()
        if name not in d:
            return INVALID_HANDLE
        return env.sim._meta(actor).body_start + d[name]

    def find_actor_rigid_body_index(
        self, env: Env, actor: int, name: str, domain: int = DOMAIN_SIM
    ) -> int:
        d = self._asset_of(env, actor).rigid_body_dict()
        i = d[name]
        m = env.sim._meta(actor)
        if domain == DOMAIN_ACTOR:
            return i
        if domain == DOMAIN_ENV:
            return m.body_start + i
        B = self._bodies_per_env(env.sim)
        return env.idx * B + m.body_start + i

    def get_actor_rigid_body_index(self, env, actor, i: int, domain: int = DOMAIN_SIM):
        m = env.sim._meta(actor)
        if domain == DOMAIN_ACTOR:
            return i
        if domain == DOMAIN_ENV:
            return m.body_start + i
        return env.idx * self._bodies_per_env(env.sim) + m.body_start + i

    def find_actor_index(self, env: Env, name: str, domain: int = DOMAIN_SIM) -> int:
        slot = self.find_actor_handle(env, name)
        if slot == INVALID_HANDLE:
            return INVALID_HANDLE
        if domain == DOMAIN_ACTOR or domain == DOMAIN_ENV:
            return slot
        return env.idx * len(env.sim.builder.envs[env.idx]) + slot

    def get_rigid_handle(self, env: Env, actor_name: str, body_name: str) -> int:
        return self.find_actor_rigid_body_handle(
            env, self.find_actor_handle(env, actor_name), body_name
        )

    def get_actor_dof_handle(self, env: Env, actor: int, i: int) -> int:
        return env.sim._meta(actor).dof_start + i

    def find_actor_dof_handle(self, env: Env, actor: int, name: str) -> int:
        d = self._asset_of(env, actor).dof_dict()
        if name not in d:
            return INVALID_HANDLE
        return env.sim._meta(actor).dof_start + d[name]

    def find_actor_dof_index(self, env, actor, name, domain=DOMAIN_SIM) -> int:
        d = self._asset_of(env, actor).dof_dict()
        i = d[name]
        m = env.sim._meta(actor)
        if domain == DOMAIN_ACTOR:
            return i
        if domain == DOMAIN_ENV:
            return m.dof_start + i
        return env.idx * self._dofs_per_env(env.sim) + m.dof_start + i

    def get_joint_handle(self, env: Env, actor_name: str, joint_name: str) -> int:
        slot = self.find_actor_handle(env, actor_name)
        d = self._asset_of(env, slot).joint_dict()
        return env.sim._meta(slot).dof_start + d.get(joint_name, INVALID_HANDLE)

    @staticmethod
    def _bodies_per_env(sim: Sim) -> int:
        if sim.built:
            return sim.sim.scene.num_bodies_per_env
        return sum(p.asset.num_bodies for p in sim.builder.envs[0])

    @staticmethod
    def _dofs_per_env(sim: Sim) -> int:
        if sim.built:
            return sim.sim.scene.num_dofs_per_env
        return sum(p.asset.num_dofs for p in sim.builder.envs[0])

    # -- classic state I/O ----------------------------------------------------
    def _body_states_struct(self, sim: Sim, env_idx, body_slice) -> np.ndarray:
        sim._ensure_built()
        st = sim.sim.state
        org = np.asarray(sim.sim.env_origins[env_idx])
        out = np.zeros(body_slice.stop - body_slice.start, RIGID_BODY_STATE_DTYPE)
        pos = np.asarray(st.body_pos[env_idx, body_slice]) - org
        quat = np.asarray(st.body_quat[env_idx, body_slice])
        lin = np.asarray(st.body_linvel[env_idx, body_slice])
        ang = np.asarray(st.body_angvel[env_idx, body_slice])
        for k, f in enumerate("xyz"):
            out["pose"]["p"][f] = pos[:, k]
            out["vel"]["linear"][f] = lin[:, k]
            out["vel"]["angular"][f] = ang[:, k]
        for k, f in enumerate("xyzw"):
            out["pose"]["r"][f] = quat[:, k]
        return out

    def get_actor_rigid_body_states(self, env: Env, actor: int, flags=STATE_ALL):
        m = env.sim._meta(actor)
        if not env.sim.built:
            pos, quat = env.sim._host_fk(env.idx, actor)
            out = np.zeros(m.body_count, RIGID_BODY_STATE_DTYPE)
            for k, f in enumerate("xyz"):
                out["pose"]["p"][f] = pos[:, k]
            for k, f in enumerate("xyzw"):
                out["pose"]["r"][f] = quat[:, k]
            return out
        return self._body_states_struct(
            env.sim, env.idx, slice(m.body_start, m.body_start + m.body_count)
        )

    def set_actor_rigid_body_states(self, env: Env, actor: int, states, flags=STATE_ALL):
        """Root-pose/velocity write. For articulated actors only the root body
        row is applied (reduced coordinates own the rest — SURVEY.md §7.1);
        single-body actors (the reference's kinematic UAV/car scenes,
        test04:359-387) are exact."""
        env.sim._ensure_built()
        s = env.sim.sim
        st = np.asarray(states)
        m = env.sim._meta(actor)
        org = np.asarray(s.env_origins[env.idx])
        p = st["pose"]["p"]
        r = st["pose"]["r"]
        lv = st["vel"]["linear"]
        av = st["vel"]["angular"]
        row = 0  # root body row
        import jax.numpy as jnp

        state = s.state
        kw = {}
        if flags in (STATE_ALL, STATE_POS):
            kw["root_pos"] = state.root_pos.at[env.idx, actor].set(
                jnp.asarray([p["x"][row], p["y"][row], p["z"][row]]) + org
            )
            kw["root_quat"] = state.root_quat.at[env.idx, actor].set(
                jnp.asarray([r["x"][row], r["y"][row], r["z"][row], r["w"][row]])
            )
        if flags in (STATE_ALL, STATE_VEL):
            kw["root_linvel"] = state.root_linvel.at[env.idx, actor].set(
                jnp.asarray([lv["x"][row], lv["y"][row], lv["z"][row]])
            )
            kw["root_angvel"] = state.root_angvel.at[env.idx, actor].set(
                jnp.asarray([av["x"][row], av["y"][row], av["z"][row]])
            )
        s.state = s.stepper.refresh_body_state(state._replace(**kw), s.params)
        return True

    def get_sim_rigid_body_states(self, sim: Sim, flags=STATE_ALL) -> np.ndarray:
        """(num_envs*B,) struct snapshot (1080_balls_of_solitude.py:150)."""
        sim._ensure_built()
        rows = [
            self._body_states_struct(
                sim, e, slice(0, sim.sim.scene.num_bodies_per_env)
            )
            for e in range(len(sim.envs))
        ]
        return np.concatenate(rows)

    def set_sim_rigid_body_states(self, sim: Sim, states, flags=STATE_ALL):
        """Snapshot restore: root states of every actor are restored; dofs are
        left untouched (the reference scenes using this are single-body)."""
        sim._ensure_built()
        st = np.asarray(states).reshape(len(sim.envs), -1)
        for e, env in enumerate(sim.envs):
            for slot in range(len(sim.builder.envs[e])):
                m = sim.sim.scene.actors[slot]
                self.set_actor_rigid_body_states(
                    env, slot, st[e, m.body_start : m.body_start + m.body_count], flags
                )
        return True

    def get_actor_dof_states(self, env: Env, actor: int, flags=STATE_ALL) -> np.ndarray:
        m = env.sim._meta(actor)
        out = np.zeros(m.dof_count, DOF_STATE_DTYPE)
        if not env.sim.built:
            pend = env.sim._dof_states.get((env.idx, actor))
            if pend is not None:
                out[:] = pend
            return out
        st = env.sim.sim.state
        out["pos"] = np.asarray(st.dof_pos[env.idx, m.dof_start : m.dof_start + m.dof_count])
        out["vel"] = np.asarray(st.dof_vel[env.idx, m.dof_start : m.dof_start + m.dof_count])
        return out

    def set_actor_dof_states(self, env: Env, actor: int, states, flags=STATE_ALL) -> bool:
        st = np.asarray(states).astype(DOF_STATE_DTYPE) if np.asarray(states).dtype != DOF_STATE_DTYPE else np.asarray(states)
        if env.sim.built:
            env.sim._write_dof_state(env.idx, actor, st)
            env.sim.sim.state = env.sim.sim.stepper.refresh_body_state(
                env.sim.sim.state, env.sim.sim.params
            )
        else:
            env.sim._dof_states[(env.idx, actor)] = st.copy()
        return True

    def get_actor_dof_position_targets(self, env: Env, actor: int) -> np.ndarray:
        m = env.sim._meta(actor)
        if env.sim.built:
            return np.asarray(
                env.sim.sim.actions.dof_pos_target[
                    env.idx, m.dof_start : m.dof_start + m.dof_count
                ]
            )
        t = env.sim._pos_targets.get((env.idx, actor))
        return t.copy() if t is not None else np.zeros(m.dof_count, np.float32)

    def set_actor_dof_position_targets(self, env: Env, actor: int, targets) -> bool:
        t = np.asarray(targets, np.float32)
        if env.sim.built:
            env.sim._write_targets(env.idx, actor, t, "dof_pos_target")
        else:
            env.sim._pos_targets[(env.idx, actor)] = t.copy()
        return True

    def set_actor_dof_velocity_targets(self, env: Env, actor: int, targets) -> bool:
        t = np.asarray(targets, np.float32)
        if env.sim.built:
            env.sim._write_targets(env.idx, actor, t, "dof_vel_target")
        else:
            env.sim._vel_targets[(env.idx, actor)] = t.copy()
        return True

    # per-DOF classic control (examples/dof_controls.py:96-181)
    def set_dof_target_position(self, env: Env, dof_handle: int, target: float):
        if not env.sim.built:
            # called inside the env-creation loop (soft_body.py:137): defer
            # — finalizing here would break subsequent create_actor calls
            env.sim._pending_dof_targets.append((env.idx, dof_handle, target))
            return
        a = env.sim.sim.actions
        env.sim.sim.actions = a._replace(
            dof_pos_target=a.dof_pos_target.at[env.idx, dof_handle].set(target)
        )

    def set_dof_target_velocity(self, env: Env, dof_handle: int, target: float):
        a = env.sim.sim.actions if env.sim.built else None
        env.sim._ensure_built()
        a = env.sim.sim.actions
        env.sim.sim.actions = a._replace(
            dof_vel_target=a.dof_vel_target.at[env.idx, dof_handle].set(target)
        )

    def apply_dof_effort(self, env: Env, dof_handle: int, effort: float):
        """One-shot effort for the next simulate (dof_controls.py:142-150)."""
        env.sim._ensure_built()
        a = env.sim.sim.actions
        env.sim.sim.actions = a._replace(
            dof_effort=a.dof_effort.at[env.idx, dof_handle].set(effort)
        )
        env.sim._oneshot_force = True
        env.sim._oneshot_effort = True

    def get_dof_position(self, env: Env, dof_handle: int) -> float:
        env.sim._ensure_built()
        return float(env.sim.sim.state.dof_pos[env.idx, dof_handle])

    def get_dof_velocity(self, env: Env, dof_handle: int) -> float:
        env.sim._ensure_built()
        return float(env.sim.sim.state.dof_vel[env.idx, dof_handle])

    def set_joint_target_position(self, env: Env, joint_handle: int, target: float):
        self.set_dof_target_position(env, joint_handle, target)

    def get_dof_frame(self, env: Env, dof_handle: int) -> _DofFrame:
        """World frame of a DOF's joint (joint_monkey.py:255-262)."""
        env.sim._ensure_built()
        from ..physics.kinematics import fk, joint_world_frames
        import jax.numpy as jnp

        s = env.sim.sim
        for gi in s.stepper.groups:
            hits = np.argwhere(gi.dof_idx == dof_handle)
            if not len(hits):
                continue
            copy, dg = hits[0]
            st = s.state
            slots = jnp.asarray(gi.slots)
            pos, quat, _, _ = fk(
                gi.topo,
                st.root_pos[:, slots],
                st.root_quat[:, slots],
                st.root_linvel[:, slots],
                st.root_angvel[:, slots],
                st.dof_pos[:, jnp.asarray(gi.dof_idx)],
                st.dof_vel[:, jnp.asarray(gi.dof_idx)],
            )
            anchors, axes = joint_world_frames(
                gi.topo, pos[env.idx, copy], quat[env.idx, copy]
            )
            link = [
                l for l in range(gi.topo.num_links) if gi.topo.dof_of_link[l] == dg
            ][0]
            org = np.asarray(s.env_origins[env.idx])
            a = np.asarray(anchors[link]) - org
            x = np.asarray(axes[link])
            return _DofFrame(Vec3(*a), Vec3(*x))
        raise KeyError(f"dof handle {dof_handle} not in any articulation")

    def get_rigid_transform(self, env: Env, body_handle: int) -> Transform:
        """Env-local body pose (franka_osc.py:145)."""
        if not env.sim.built:
            # host FK over the owning actor
            protos = env.sim.builder.envs[env.idx]
            b = 0
            for slot, p in enumerate(protos):
                if body_handle < b + p.asset.num_bodies:
                    pos, quat = env.sim._host_fk(env.idx, slot)
                    i = body_handle - b
                    return Transform(Vec3(*pos[i]), Quat(*quat[i]))
                b += p.asset.num_bodies
            raise IndexError(body_handle)
        st = env.sim.sim.state
        org = np.asarray(env.sim.sim.env_origins[env.idx])
        p = np.asarray(st.body_pos[env.idx, body_handle]) - org
        q = np.asarray(st.body_quat[env.idx, body_handle])
        return Transform(Vec3(*p), Quat(*q))

    def get_rigid_linear_velocity(self, env: Env, body_handle: int) -> Vec3:
        env.sim._ensure_built()
        return Vec3(*np.asarray(env.sim.sim.state.body_linvel[env.idx, body_handle]))

    def get_rigid_angular_velocity(self, env: Env, body_handle: int) -> Vec3:
        env.sim._ensure_built()
        return Vec3(*np.asarray(env.sim.sim.state.body_angvel[env.idx, body_handle]))

    def set_rigid_linear_velocity(self, env: Env, body_handle: int, vel: Vec3):
        """Kinematic velocity write on a body (test03:266-270). Applies to the
        owning actor's root (exact for single-body actors)."""
        self._set_rigid_velocity(env, body_handle, vel, "root_linvel")

    def set_rigid_angular_velocity(self, env: Env, body_handle: int, vel: Vec3):
        self._set_rigid_velocity(env, body_handle, vel, "root_angvel")

    def _set_rigid_velocity(self, env: Env, body_handle: int, vel, field: str):
        import jax.numpy as jnp

        env.sim._ensure_built()
        s = env.sim.sim
        slot = self._slot_of_body(env.sim, body_handle)
        v = jnp.asarray([vel.x, vel.y, vel.z])
        st = s.state._replace(
            **{field: getattr(s.state, field).at[env.idx, slot].set(v)}
        )
        s.state = s.stepper.refresh_body_state(st, s.params)

    @staticmethod
    def _slot_of_body(sim: Sim, body_handle: int) -> int:
        for slot, m in enumerate(sim.sim.scene.actors):
            if m.body_start <= body_handle < m.body_start + m.body_count:
                return slot
        raise IndexError(body_handle)

    # -- properties -----------------------------------------------------------
    def get_actor_dof_properties(self, env: Env, actor: int) -> np.ndarray:
        key = (env.idx, actor)
        if not env.sim.built and key in env.sim._dof_props:
            return env.sim._dof_props[key].copy()
        if env.sim.built:
            m = env.sim._meta(actor)
            sl = slice(m.dof_start, m.dof_start + m.dof_count)
            p = env.sim.sim.params
            out = np.zeros(m.dof_count, DOF_PROPS_DTYPE)
            out["stiffness"] = np.asarray(p.dof_stiffness[env.idx, sl])
            out["damping"] = np.asarray(p.dof_damping[env.idx, sl])
            out["armature"] = np.asarray(p.dof_armature[env.idx, sl])
            out["friction"] = np.asarray(p.dof_friction[env.idx, sl])
            out["lower"] = np.asarray(p.dof_lower[env.idx, sl])
            out["upper"] = np.asarray(p.dof_upper[env.idx, sl])
            out["hasLimits"] = np.asarray(p.dof_has_limits[env.idx, sl])
            out["effort"] = np.asarray(p.dof_max_effort[env.idx, sl])
            out["velocity"] = np.asarray(p.dof_max_velocity[env.idx, sl])
            out["driveMode"] = np.asarray(p.dof_drive_mode[env.idx, sl])
            return out
        return self._asset_of(env, actor).dof_properties()

    def set_actor_dof_properties(self, env: Env, actor: int, props) -> bool:
        arr = np.asarray(props)
        if env.sim.built:
            env.sim._write_dof_props(env.idx, actor, arr)
        else:
            env.sim._dof_props[(env.idx, actor)] = arr.copy()
        return True

    def get_actor_rigid_shape_properties(self, env: Env, actor: int) -> list:
        key = (env.idx, actor)
        if key in env.sim._shape_props and not env.sim.built:
            return [dataclasses.replace(sp) for sp in env.sim._shape_props[key]]
        m = env.sim._meta(actor)
        out = []
        geoms = [g for l in self._asset_of(env, actor).links for g in l.geoms]
        for i, g in enumerate(geoms):
            sp = RigidShapeProperties()
            if env.sim.built:
                p = env.sim.sim.params
                sp.friction = float(p.shape_friction[env.idx, m.shape_start + i])
                sp.restitution = float(
                    p.shape_restitution[env.idx, m.shape_start + i]
                )
            else:
                sp.friction = g.friction
                sp.restitution = g.restitution
            out.append(sp)
        return out

    def set_actor_rigid_shape_properties(self, env: Env, actor: int, props: list):
        if env.sim.built:
            env.sim._write_shape_props(env.idx, actor, props)
        else:
            env.sim._shape_props[(env.idx, actor)] = [
                dataclasses.replace(sp) for sp in props
            ]
        return True

    def get_actor_rigid_body_properties(self, env: Env, actor: int) -> list:
        m = env.sim._meta(actor)
        out = []
        for i, l in enumerate(self._asset_of(env, actor).links):
            bp = RigidBodyProperties()
            if env.sim.built:
                p = env.sim.sim.params
                b = m.body_start + i
                bp.mass = float(p.body_mass[env.idx, b])
                bp.com = Vec3(*np.asarray(p.body_com[env.idx, b]))
                bp.inertia = np.asarray(p.body_inertia[env.idx, b])
                bp.flags = (
                    RIGID_BODY_DISABLE_GRAVITY
                    if bool(p.body_disable_gravity[env.idx, b])
                    else RIGID_BODY_NONE
                )
            else:
                sc = env.sim._scales.get((env.idx, actor), 1.0)
                bp.mass = l.mass * sc**3
                bp.com = Vec3(*(np.asarray(l.com) * sc))
                bp.inertia = np.asarray(l.inertia) * sc**5
            out.append(bp)
        return out

    def set_actor_rigid_body_properties(
        self, env: Env, actor: int, props: list, recomputeInertia: bool = False
    ):
        if recomputeInertia:
            for bp, l in zip(props, self._asset_of(env, actor).links):
                if l.mass > 0:
                    bp.inertia = np.asarray(l.inertia) * (bp.mass / l.mass)
        if env.sim.built:
            env.sim._write_body_props(env.idx, actor, props)
        else:
            env.sim._body_props[(env.idx, actor)] = list(props)
        return True

    def set_actor_scale(self, env: Env, actor: int, scale: float) -> bool:
        if env.sim.built:
            env.sim._write_scale(env.idx, actor, scale)
        else:
            env.sim._scales[(env.idx, actor)] = float(scale) * env.sim._scales.get(
                (env.idx, actor), 1.0
            )
        return True

    def get_actor_scale(self, env: Env, actor: int) -> float:
        return env.sim._scales.get((env.idx, actor), 1.0)

    def _soft_instances_of(self, env: Env, actor: int):
        """Soft-instance indices of one actor slot (requires built sim)."""
        env.sim._ensure_built()
        soft = env.sim.sim.scene.soft
        if soft is None:
            return []
        return [
            i for i, inst in enumerate(soft.instances)
            if inst.actor_slot == actor
        ]

    def get_actor_soft_materials(self, env, actor) -> list:
        import jax.numpy as jnp  # noqa: F401

        idx = self._soft_instances_of(env, actor)
        p = env.sim.sim.params
        return [
            SoftMaterial(
                youngs=float(p.soft_youngs[env.idx, i]),
                poissons=float(p.soft_poissons[env.idx, i]),
                damping=float(p.soft_damping[env.idx, i]),
            )
            for i in idx
        ]

    def set_actor_soft_materials(self, env, actor, mats) -> bool:
        """Per-env material update — a pure array write on PhysParams
        (soft_body.py:120-133 randomizes Young's/Poisson per env)."""
        idx = self._soft_instances_of(env, actor)
        if not idx or len(mats) < len(idx):
            return False
        sim = env.sim.sim
        p = sim.params
        ii = np.asarray(idx)
        p = p._replace(
            soft_youngs=p.soft_youngs.at[env.idx, ii].set(
                np.asarray([m.youngs for m in mats[: len(idx)]], np.float32)
            ),
            soft_poissons=p.soft_poissons.at[env.idx, ii].set(
                np.asarray([m.poissons for m in mats[: len(idx)]], np.float32)
            ),
            soft_damping=p.soft_damping.at[env.idx, ii].set(
                np.asarray([m.damping for m in mats[: len(idx)]], np.float32)
            ),
        )
        sim.params = p
        return True

    # -- soft-body introspection (get_sim_tetrahedra/triangles ---------------
    # soft_body.py:160-186 reads these for stress/pressure viz)
    def get_sim_tetrahedra(self, sim: Sim):
        """(tet_indices flat [4*T_sim], tet_stress [(3,3) ndarray per tet])
        across ALL envs (env-major, like the reference's sim-wide arrays)."""
        sim._ensure_built()
        soft = sim.sim.scene.soft
        if soft is None:
            return [], []
        st = sim.sim.stepper.soft
        import jax

        # cache the jitted callable on the stepper — re-wrapping the bound
        # method in jax.jit on every call retraces every invocation
        if not hasattr(st, "_jit_tet_stress"):
            st._jit_tet_stress = jax.jit(st.tet_stress)
        stress = np.asarray(
            st._jit_tet_stress(sim.sim.state.soft_pos, sim.sim.params)
        )  # (N, T, 3, 3)
        N = stress.shape[0]
        V = soft.num_verts
        idx = (
            soft.tets[None, :, :] + (np.arange(N) * V)[:, None, None]
        ).reshape(-1)
        return idx.tolist(), list(stress.reshape(-1, 3, 3))

    def get_sim_triangles(self, sim: Sim):
        """(tri_indices flat [3*S_sim], tri_parents [S_sim], tri_normals)."""
        sim._ensure_built()
        soft = sim.sim.scene.soft
        if soft is None:
            return [], [], []
        st = sim.sim.stepper.soft
        import jax

        if not hasattr(st, "_jit_tri_normals"):
            st._jit_tri_normals = jax.jit(st.tri_normals)
        normals = np.asarray(st._jit_tri_normals(sim.sim.state.soft_pos))
        N = normals.shape[0]
        V, T, S = soft.num_verts, soft.num_tets, len(soft.tris)
        idx = (
            soft.tris[None, :, :] + (np.arange(N) * V)[:, None, None]
        ).reshape(-1)
        par = (
            soft.tri_parent[None, :] + (np.arange(N) * T)[:, None]
        ).reshape(-1)
        return idx.tolist(), par.tolist(), list(normals.reshape(-1, 3))

    def _soft_instance_at(self, env: Env, actor: int, soft_index: int):
        """Validated lookup: empty range for actors with no soft bodies or
        an out-of-range soft_index (instead of a bare IndexError)."""
        idx = self._soft_instances_of(env, actor)
        soft = env.sim.sim.scene.soft
        if soft is None or not (0 <= soft_index < len(idx)):
            return None, None
        return soft, soft.instances[idx[soft_index]]

    def get_actor_tetrahedra_range(self, env: Env, actor: int, soft_index: int):
        soft, inst = self._soft_instance_at(env, actor, soft_index)
        if inst is None:
            return TetTriRange(start=0, count=0)
        return TetTriRange(
            start=env.idx * soft.num_tets + inst.tet_start,
            count=inst.tet_count,
        )

    def get_actor_triangle_range(self, env: Env, actor: int, soft_index: int):
        soft, inst = self._soft_instance_at(env, actor, soft_index)
        if inst is None:
            return TetTriRange(start=0, count=0)
        return TetTriRange(
            start=env.idx * len(soft.tris) + inst.tri_start,
            count=inst.tri_count,
        )

    # -- tensor API -----------------------------------------------------------
    def _acquire(self, sim: Sim, name: str, shape) -> _TensorHandle:
        sim._ensure_built()
        if name not in sim._tensors:
            sim._tensors[name] = _TensorHandle(
                sim, name, np.zeros(shape, np.float32)
            )
            self._refresh(sim, name)
        return sim._tensors[name]

    def _refresh(self, sim: Sim, name: str):
        h = sim._tensors.get(name)
        if h is None:
            return
        s = sim.sim
        if name == "root":
            h.buf[:] = np.asarray(s.root_state)
        elif name == "body":
            h.buf[:] = np.asarray(s.body_state)
        elif name == "dof":
            h.buf[:] = np.asarray(s.dof_state)
        elif name == "contact":
            h.buf[:] = np.asarray(s.net_contact_force)

    def acquire_actor_root_state_tensor(self, sim: Sim) -> _TensorHandle:
        sim._ensure_built()
        n = sim.sim.scene.num_envs * sim.sim.scene.num_actors_per_env
        return self._acquire(sim, "root", (n, 13))

    def acquire_rigid_body_state_tensor(self, sim: Sim) -> _TensorHandle:
        sim._ensure_built()
        n = sim.sim.scene.num_envs * sim.sim.scene.num_bodies_per_env
        return self._acquire(sim, "body", (n, 13))

    def acquire_dof_state_tensor(self, sim: Sim) -> _TensorHandle:
        sim._ensure_built()
        n = sim.sim.scene.num_envs * sim.sim.scene.num_dofs_per_env
        return self._acquire(sim, "dof", (n, 2))

    def acquire_net_contact_force_tensor(self, sim: Sim) -> _TensorHandle:
        sim._ensure_built()
        n = sim.sim.scene.num_envs * sim.sim.scene.num_bodies_per_env
        return self._acquire(sim, "contact", (n, 3))

    def acquire_jacobian_tensor(self, sim: Sim, actor_name: str) -> _TensorHandle:
        sim._ensure_built()
        import jax

        fn = jax.jit(sim.sim.jacobian_fn(actor_name))
        j = np.asarray(fn(sim.sim.state))
        h = _TensorHandle(sim, f"jac:{actor_name}", j.copy())
        sim._jacobians[actor_name] = (fn, h)
        return h

    def acquire_mass_matrix_tensor(self, sim: Sim, actor_name: str) -> _TensorHandle:
        sim._ensure_built()
        import jax

        fn = jax.jit(sim.sim.mass_matrix_fn(actor_name))
        m = np.asarray(fn(sim.sim.state))
        h = _TensorHandle(sim, f"mm:{actor_name}", m.copy())
        sim._mass_matrices[actor_name] = (fn, h)
        return h

    def refresh_actor_root_state_tensor(self, sim: Sim) -> bool:
        self._refresh(sim, "root")
        return True

    def refresh_rigid_body_state_tensor(self, sim: Sim) -> bool:
        self._refresh(sim, "body")
        return True

    def refresh_dof_state_tensor(self, sim: Sim) -> bool:
        self._refresh(sim, "dof")
        return True

    def refresh_net_contact_force_tensor(self, sim: Sim) -> bool:
        self._refresh(sim, "contact")
        return True

    def refresh_jacobian_tensors(self, sim: Sim) -> bool:
        for fn, h in sim._jacobians.values():
            h.buf[:] = np.asarray(fn(sim.sim.state))
        return True

    def refresh_mass_matrix_tensors(self, sim: Sim) -> bool:
        for fn, h in sim._mass_matrices.values():
            h.buf[:] = np.asarray(fn(sim.sim.state))
        return True

    @staticmethod
    def _tensor_data(t) -> np.ndarray:
        if isinstance(t, _TensorHandle):
            return t.buf
        if hasattr(t, "numpy"):  # torch tensor
            return t.detach().cpu().numpy()
        return np.asarray(t)

    def set_actor_root_state_tensor(self, sim: Sim, tensor) -> bool:
        sim._ensure_built()
        sim.sim.root_state = self._tensor_data(tensor)
        return True

    def set_rigid_body_state_tensor(self, sim: Sim, tensor) -> bool:
        """Applies root rows of every actor (reduced coordinates own link
        poses; exact for the reference's single-body vecenv scenes —
        test05:367-385)."""
        sim._ensure_built()
        s = sim.sim
        data = self._tensor_data(tensor).reshape(
            s.scene.num_envs, s.scene.num_bodies_per_env, 13
        )
        roots = np.stack(
            [data[:, m.body_start] for m in s.scene.actors], axis=1
        )  # (N, A, 13)
        s.root_state = roots.reshape(-1, 13)
        return True

    def set_dof_state_tensor(self, sim: Sim, tensor) -> bool:
        sim._ensure_built()
        sim.sim.dof_state = self._tensor_data(tensor)
        return True

    def set_dof_position_target_tensor(self, sim: Sim, tensor) -> bool:
        import jax.numpy as jnp

        sim._ensure_built()
        s = sim.sim
        sh = (s.scene.num_envs, s.scene.num_dofs_per_env)
        s.actions = s.actions._replace(
            dof_pos_target=jnp.asarray(self._tensor_data(tensor)).reshape(sh)
        )
        return True

    def set_dof_velocity_target_tensor(self, sim: Sim, tensor) -> bool:
        import jax.numpy as jnp

        sim._ensure_built()
        s = sim.sim
        sh = (s.scene.num_envs, s.scene.num_dofs_per_env)
        s.actions = s.actions._replace(
            dof_vel_target=jnp.asarray(self._tensor_data(tensor)).reshape(sh)
        )
        return True

    def set_dof_actuation_force_tensor(self, sim: Sim, tensor) -> bool:
        import jax.numpy as jnp

        sim._ensure_built()
        s = sim.sim
        sh = (s.scene.num_envs, s.scene.num_dofs_per_env)
        s.actions = s.actions._replace(
            dof_effort=jnp.asarray(self._tensor_data(tensor)).reshape(sh)
        )
        return True

    def apply_rigid_body_force_tensors(
        self, sim: Sim, forces=None, torques=None, space: int = ENV_SPACE
    ) -> bool:
        """(apply_forces.py:117) — forces act on the NEXT simulate only."""
        sim._ensure_built()
        s = sim.sim
        sh = (s.scene.num_envs, s.scene.num_bodies_per_env, 3)
        f = None if forces is None else self._tensor_data(forces).reshape(sh)
        t = None if torques is None else self._tensor_data(torques).reshape(sh)
        s.apply_body_forces(forces=f, torques=t)
        sim._oneshot_force = True
        return True

    def apply_rigid_body_force_at_pos_tensors(
        self, sim: Sim, forces=None, positions=None, space: int = ENV_SPACE
    ) -> bool:
        sim._ensure_built()
        s = sim.sim
        sh = (s.scene.num_envs, s.scene.num_bodies_per_env, 3)
        f = None if forces is None else self._tensor_data(forces).reshape(sh)
        p = None if positions is None else self._tensor_data(positions).reshape(sh)
        if p is not None and space == ENV_SPACE:
            p = p + np.asarray(s.env_origins)[:, None, :]
        s.apply_body_forces(forces=f, positions=p)
        sim._oneshot_force = True
        return True

    def apply_body_forces(
        self, env: Env, body_handle: int, force=None, torque=None, space=ENV_SPACE
    ):
        import jax.numpy as jnp

        env.sim._ensure_built()
        a = env.sim.sim.actions
        if force is not None:
            a = a._replace(
                body_force=a.body_force.at[env.idx, body_handle].set(
                    jnp.asarray([force.x, force.y, force.z])
                )
            )
        if torque is not None:
            a = a._replace(
                body_torque=a.body_torque.at[env.idx, body_handle].set(
                    jnp.asarray([torque.x, torque.y, torque.z])
                )
            )
        env.sim.sim.actions = a
        env.sim._oneshot_force = True

    # -- attractors (franka_attractor.py:89-173) -------------------------------
    def create_rigid_body_attractor(self, env: Env, props: AttractorProperties) -> int:
        if env.sim.built:
            raise RuntimeError("attractors must be created before the scene builds")
        target = props.target or Transform()
        offset = props.offset or Transform()
        slot = env.sim._slot_of_body_prebuild(env.idx, props.rigid_handle)
        m = env.sim._meta(slot)
        idx = env.sim.builder.add_attractor(
            env.idx,
            slot=slot,
            body=props.rigid_handle - m.body_start,
            offset_pos=(offset.p.x, offset.p.y, offset.p.z),
            offset_quat=(offset.r.x, offset.r.y, offset.r.z, offset.r.w),
            axes=props.axes,
            stiffness=props.stiffness,
            damping=props.damping,
            force_limit=props.forceLimit,
            target_pos=(target.p.x, target.p.y, target.p.z),
            target_quat=(target.r.x, target.r.y, target.r.z, target.r.w),
        )
        return idx

    def get_attractor_properties(self, env: Env, handle: int) -> AttractorProperties:
        a = env.sim.builder.attractors[env.idx][handle]
        p = AttractorProperties()
        p.stiffness = a.stiffness
        p.damping = a.damping
        p.forceLimit = a.force_limit
        p.axes = a.axes
        p.rigid_handle = a.body
        p.target = Transform(Vec3(*a.target_pos), Quat(*a.target_quat))
        p.offset = Transform(Vec3(*a.offset_pos), Quat(*a.offset_quat))
        return p

    def set_attractor_target(self, env: Env, handle: int, target: Transform) -> bool:
        import jax.numpy as jnp

        a = env.sim.builder.attractors[env.idx][handle]
        a.target_pos = np.array([target.p.x, target.p.y, target.p.z])
        a.target_quat = np.array([target.r.x, target.r.y, target.r.z, target.r.w])
        if env.sim.built:
            s = env.sim.sim
            org = np.asarray(s.env_origins[env.idx])
            act = s.actions
            s.actions = act._replace(
                attractor_target_pos=act.attractor_target_pos.at[env.idx, handle].set(
                    jnp.asarray(a.target_pos + org, jnp.float32)
                ),
                attractor_target_quat=act.attractor_target_quat.at[
                    env.idx, handle
                ].set(jnp.asarray(a.target_quat, jnp.float32)),
            )
        return True

    def set_attractor_properties(self, env: Env, handle: int, props) -> bool:
        import jax.numpy as jnp

        a = env.sim.builder.attractors[env.idx][handle]
        a.stiffness, a.damping, a.force_limit = (
            props.stiffness,
            props.damping,
            props.forceLimit,
        )
        a.axes = props.axes
        if env.sim.built:
            p = env.sim.sim.params
            env.sim.sim.params = p._replace(
                attractor_stiffness=p.attractor_stiffness.at[env.idx, handle].set(
                    props.stiffness
                ),
                attractor_damping=p.attractor_damping.at[env.idx, handle].set(
                    props.damping
                ),
                attractor_force_limit=p.attractor_force_limit.at[
                    env.idx, handle
                ].set(props.forceLimit),
            )
        return True

    # -- cameras (test02:226-344, graphics.py:156-238) --------------------------
    def create_camera_sensor(self, env: Env, props: CameraProperties) -> int:
        """Cameras created per env in the standard loop collapse into one
        batched sensor; the handle is the sensor index (stable across envs)."""
        sim = env.sim
        c = sim._cam_counter.get(env.idx, 0)
        sim._cam_counter[env.idx] = c + 1
        if env.idx == 0 or c >= len(sim.cameras):
            n = max(len(sim.builder.envs), 1)
            sim.cameras.append(
                CameraSensor(props=dataclasses.replace(props), num_envs=n)
            )
            return len(sim.cameras) - 1
        return c

    def destroy_camera_sensor(self, sim: Sim, env: Env, cam: int) -> bool:
        sim.cameras[cam].destroyed = True
        return True

    def attach_camera_to_body(
        self, cam: int, env: Env, body_handle: int, local: Transform, mode: int
    ):
        env.sim.cameras[cam].attach(
            body_handle,
            (local.p.x, local.p.y, local.p.z),
            (local.r.x, local.r.y, local.r.z, local.r.w),
            follow_mode=mode,
        )

    def set_camera_location(self, cam: int, env: Env, eye: Vec3, target: Vec3):
        from ..core.config import UP_AXIS_Y

        up = (0, 1, 0) if env.sim.params.up_axis == UP_AXIS_Y else (0, 0, 1)
        env.sim.cameras[cam].set_location(
            env.idx, (eye.x, eye.y, eye.z), (target.x, target.y, target.z), up
        )

    def set_camera_transform(self, cam: int, env: Env, t: Transform):
        env.sim.cameras[cam].set_transform(
            env.idx, (t.p.x, t.p.y, t.p.z), (t.r.x, t.r.y, t.r.z, t.r.w)
        )

    def set_camera_horizontal_fov(self, cam: int, env: Env, fov_deg: float):
        """Per-env runtime camera zoom (framework extension: replaces
        test11's 90-cameras-per-env fov sweep with one camera whose fov is
        a traced per-env array — test11_servo_vecenv_camerazoom.py:327-335,
        409-410)."""
        env.sim.cameras[cam].set_horizontal_fov(env.idx, fov_deg)

    def get_camera_transform(self, sim: Sim, env: Env, cam: int) -> Transform:
        sim._ensure_built()
        p, q = sim.cameras[cam].env_pose(sim.sim.state, sim.sim.env_origins)
        return Transform(
            Vec3(*np.asarray(p[env.idx])), Quat(*np.asarray(q[env.idx]))
        )

    def get_camera_proj_matrix(self, sim: Sim, env: Env, cam: int) -> np.ndarray:
        return sim.cameras[cam].proj_matrix()

    def get_camera_view_matrix(self, sim: Sim, env: Env, cam: int) -> np.ndarray:
        sim._ensure_built()
        return sim.cameras[cam].view_matrix(
            sim.sim.state, sim.sim.env_origins, env.idx
        )

    def render_all_camera_sensors(self, sim: Sim):
        sim._ensure_built()
        from ..render.raster import render_camera_batch, shape_world_poses

        s = sim.sim
        sp, sq = shape_world_poses(s.state, s.params, sim._render_tables, s.scene)
        g = s.scene.ground
        if g is not None:
            n = np.asarray(g.normal, np.float32)
            n = n / max(np.linalg.norm(n), 1e-9)
            ground = np.array([*n, g.distance], np.float32)
        else:
            ground = np.zeros(4, np.float32)
        color, ambient, ldir = sim.lights[0]
        # stacked texture atlas (rebuilt when the texture list changes)
        tex = tex_id = None
        if any(t is not None for t in sim.textures) and (sim._shape_tex >= 0).any():
            from ..render.raster import TEX_RES, resample_texture

            key = len(sim.textures)
            if getattr(sim, "_tex_atlas_key", None) != key:
                sim._tex_atlas = np.stack([
                    resample_texture(t) if t is not None
                    else np.zeros((TEX_RES, TEX_RES, 3), np.float32)
                    for t in sim.textures
                ])
                sim._tex_atlas_key = key
            tex = sim._tex_atlas
            tex_id = sim._shape_tex
        N = s.scene.num_envs
        # visual triangle meshes (VERDICT r4 item 4): static local tables
        tbl0 = sim._render_tables
        tri_kw = {}
        if len(tbl0.tri_shape):
            tri_kw = dict(
                tri_shape=tuple(int(r) for r in tbl0.tri_shape),
                tri_v=tbl0.tri_v,
                tri_n=tbl0.tri_n,
                tri_base=tuple(
                    tuple(float(x) for x in row)
                    for row in np.asarray(s.scene.shapes.size, np.float32)
                ),
            )
        # soft surface triangles render as a world-frame soup
        if s.scene.soft is not None and s.state.soft_pos is not None:
            stris = s.state.soft_pos[:, np.asarray(s.scene.soft.tris)]
            tri_kw.update(
                soft_tris=stris,
                soft_colors=np.asarray([0.82, 0.45, 0.35], np.float32),
            )
        # viewer debug-draw lines, padded per env
        viewer = getattr(sim, "viewer", None)
        if viewer is not None and viewer.lines:
            Lmax = max(
                sum(len(sg) for e2, sg, _ in viewer.lines if e2 == e)
                for e in range(N)
            )
            if Lmax > 0:
                lseg = np.zeros((N, Lmax, 2, 3), np.float32)
                lcol = np.zeros((N, Lmax, 3), np.float32)
                fill = np.zeros(N, np.int64)
                for e2, sg, cl in viewer.lines:
                    k = fill[e2]
                    lseg[e2, k : k + len(sg)] = sg
                    lcol[e2, k : k + len(sg)] = cl
                    fill[e2] += len(sg)
                tri_kw.update(lines=lseg, line_colors=lcol)
        for sensor in sim.cameras:
            if sensor.destroyed:
                continue
            cp, cq = sensor.world_pose(s.state, s.env_origins)
            if sensor.fov_per_env is not None:
                hfov = np.full(N, sensor.props.horizontal_fov, np.float32)
                m = min(N, len(sensor.fov_per_env))
                hfov[:m] = sensor.fov_per_env[:m]
            else:
                hfov = float(sensor.props.horizontal_fov)
            ss = max(
                1,
                int(getattr(sensor.props, "supersampling_horizontal", 1)),
                int(getattr(sensor.props, "supersampling_vertical", 1)),
            )
            tbl = sim._render_tables
            flow_kw = {}
            if sensor.want_flow:
                body = np.asarray(tbl.body)
                flow_kw = dict(
                    body_lin=s.state.body_linvel[:, body],
                    body_ang=s.state.body_angvel[:, body],
                    body_ctr=s.state.body_pos[:, body],
                    flow_dt=float(s.scene.sim_params.dt),
                )
            rgba, depth, seg, flow = render_camera_batch(
                cp,
                cq,
                sp,
                sq,
                s.params.shape_size,
                tbl.kind,
                sim._shape_color,
                tbl.seg,
                ground,
                np.asarray(ldir / max(np.linalg.norm(ldir), 1e-9), np.float32),
                np.asarray(color, np.float32),
                np.asarray(ambient, np.float32),
                np.array([0.32, 0.45, 0.6], np.float32),  # sky
                hfov,
                tex,
                tex_id,
                mesh_rows=tuple(int(r) for r in tbl.mesh_rows),
                mesh_planes=tbl.mesh_planes,
                mesh_base=tbl.mesh_base,
                **tri_kw,
                width=sensor.props.width,
                height=sensor.props.height,
                far=float(sensor.props.far_plane),
                ss=ss,
                **flow_kw,
            )
            # keep images ON DEVICE (the reference's enable_tensors /
            # get_camera_image_gpu_tensor semantics — interop_torch.py:
            # 115-120); the classic get_camera_image converts lazily.
            # Eager np.asarray here cost ~0.5 s/frame of tunnel readback
            # at 1600x900 (r5 render profile).
            sensor.color = rgba
            sensor.depth = depth
            sensor.segmentation = seg
            sensor.flow = flow

    def get_camera_image(self, sim: Sim, env: Env, cam: int, kind: int):
        sensor = sim.cameras[cam]
        if sensor.color is None:
            self.render_all_camera_sensors(sim)
        h, w = sensor.props.height, sensor.props.width
        if kind == IMAGE_COLOR:
            return np.asarray(sensor.color[env.idx]).reshape(h, w * 4)
        if kind == IMAGE_DEPTH:
            return np.asarray(sensor.depth[env.idx])
        if kind == IMAGE_SEGMENTATION:
            return np.asarray(sensor.segmentation[env.idx])
        if kind == IMAGE_OPTICAL_FLOW:
            # (H, W, 2) pixel displacement since the previous frame
            # (graphics.py:225-238's fourth image type): rendered lazily —
            # the first request flips want_flow and re-renders
            if not sensor.want_flow or sensor.flow is None:
                sensor.want_flow = True
                self.render_all_camera_sensors(sim)
            return np.asarray(sensor.flow[env.idx])
        raise ValueError(f"unsupported image type {kind}")

    def get_camera_image_gpu_tensor(self, sim: Sim, env: Env, cam: int, kind: int):
        """Zero-copy image view (interop_torch.py:115-120): returns a tensor
        handle whose buffer aliases the sensor's last render."""
        sensor = sim.cameras[cam]
        if sensor.color is None:
            self.render_all_camera_sensors(sim)
        buf = {
            IMAGE_COLOR: sensor.color,
            IMAGE_DEPTH: sensor.depth,
            IMAGE_SEGMENTATION: sensor.segmentation,
        }[kind][env.idx]
        return _TensorHandle(
            sim, f"image:{cam}:{env.idx}:{kind}", np.asarray(buf)
        )

    def start_access_image_tensors(self, sim: Sim):
        self.render_all_camera_sensors(sim)

    def end_access_image_tensors(self, sim: Sim):
        pass

    def write_camera_image_to_file(
        self, sim: Sim, env: Env, cam: int, kind: int, path: str
    ):
        img = self.get_camera_image(sim, env, cam, kind)
        sensor = sim.cameras[cam]
        if kind == IMAGE_COLOR:
            img = img.reshape(sensor.props.height, sensor.props.width, 4)
        _write_image(path, img)

    # -- textures / colors / lights --------------------------------------------
    def create_texture_from_file(self, sim: Sim, path: str) -> int:
        sim.textures.append(_load_texture(path))
        return len(sim.textures) - 1

    def create_texture_from_buffer(self, sim: Sim, w: int, h: int, data) -> int:
        arr = np.asarray(data, np.uint8).reshape(h, w, 4)
        sim.textures.append(arr)
        return len(sim.textures) - 1

    def free_texture(self, sim: Sim, tex: int):
        if 0 <= tex < len(sim.textures):
            sim.textures[tex] = None
            sim._tex_atlas_key = None  # force atlas rebuild

    def set_rigid_body_color(self, env: Env, actor: int, body: int, mesh: int, color: Vec3):
        # callable during scene creation (the reference sets colors inline,
        # 1080_balls_of_solitude.py:138): defer until the scene is built
        if env.sim.sim is None:
            env.sim._pending_colors.append(
                (env.idx, actor, body, [color.x, color.y, color.z])
            )
            return
        m = env.sim._meta(actor)
        sh = env.sim.sim.scene.shapes
        mask = sh.body_slot == (m.body_start + body)
        env.sim._shape_color[env.idx, mask] = [color.x, color.y, color.z]

    def get_rigid_body_color(self, env: Env, actor: int, body: int, mesh: int) -> Vec3:
        env.sim._ensure_built()
        m = env.sim._meta(actor)
        sh = env.sim.sim.scene.shapes
        idx = np.nonzero(sh.body_slot == (m.body_start + body))[0]
        if len(idx) == 0:
            return Vec3(0.7, 0.7, 0.7)
        return Vec3(*env.sim._shape_color[env.idx, idx[0]])

    def set_rigid_body_texture(self, env: Env, actor: int, body: int, mesh: int, tex: int):
        """Assign a loaded texture to a body's shapes; the renderer samples
        it with analytic UVs (graphics.py:185-196)."""
        env.sim._ensure_built()
        m = env.sim._meta(actor)
        sh = env.sim.sim.scene.shapes
        mask = sh.body_slot == (m.body_start + body)
        env.sim._shape_tex[env.idx, mask] = tex

    def set_rigid_body_segmentation_id(self, env: Env, actor: int, body: int, seg: int):
        env.sim._ensure_built()
        m = env.sim._meta(actor)
        sh = env.sim.sim.scene.shapes
        mask = sh.body_slot == (m.body_start + body)
        tab = env.sim._render_tables
        seg_arr = np.asarray(tab.seg).copy()
        seg_arr[mask] = seg
        env.sim._render_tables = tab._replace(seg=seg_arr)

    def set_light_parameters(self, sim: Sim, idx: int, color: Vec3, ambient: Vec3, direction: Vec3):
        sim.lights[idx] = (
            np.array([color.x, color.y, color.z]),
            np.array([ambient.x, ambient.y, ambient.z]),
            np.array([direction.x, direction.y, direction.z]),
        )

    # -- viewer / input / debug draw (headless — SURVEY.md N14) -----------------
    def create_viewer(self, sim: Sim, props: Optional[CameraProperties] = None) -> Viewer:
        sim.viewer = Viewer(sim, props)
        return sim.viewer

    def destroy_viewer(self, viewer: Viewer):
        viewer.closed = True

    def query_viewer_has_closed(self, viewer: Viewer) -> bool:
        return viewer.closed

    def viewer_camera_look_at(self, viewer: Viewer, env: Optional[Env], eye: Vec3, target: Vec3):
        from ..render.camera import look_at_quat

        viewer.cam_pos = np.array([eye.x, eye.y, eye.z])
        viewer.cam_quat = look_at_quat(viewer.cam_pos, [target.x, target.y, target.z])

    def get_viewer_camera_transform(self, viewer: Viewer, env: Optional[Env]) -> Transform:
        return Transform(Vec3(*viewer.cam_pos), Quat(*viewer.cam_quat))

    def get_viewer_size(self, viewer: Viewer):
        return type("Size", (), {"x": viewer.props.width, "y": viewer.props.height})()

    def get_viewer_mouse_position(self, viewer: Viewer):
        return type("Pos", (), {"x": viewer.mouse_pos[0], "y": viewer.mouse_pos[1]})()

    def subscribe_viewer_keyboard_event(self, viewer: Viewer, key, action: str):
        viewer.subscriptions[key] = action

    def subscribe_viewer_mouse_event(self, viewer: Viewer, button, action: str):
        viewer.subscriptions[button] = action

    def query_viewer_action_events(self, viewer: Viewer) -> list:
        evs = []
        for name, value in viewer._injected:
            action = viewer.subscriptions.get(name, name)
            evs.append(_ActionEvent(action=action, value=value))
        viewer._injected = []
        return evs

    def draw_viewer(self, viewer: Viewer, sim: Sim, render_collision: bool = True):
        viewer.frames += 1  # offscreen render happens via camera sensors

    def add_lines(self, viewer: Viewer, env: Env, num: int, verts, colors):
        """Store (env, world-frame segments, per-line colors); camera
        renders rasterize them (render/raster.py _ray_lines — reference
        gymutil.draw_lines consumers, test/test01_isaacgym_asset.py:218)."""
        def _un_structured(a):
            a = np.asarray(a)
            if a.dtype.names:  # Vec3/color structured dtype
                a = np.stack([a[n] for n in a.dtype.names[:3]], -1)
            return a.astype(np.float32)

        segs = _un_structured(verts).reshape(-1, 2, 3)
        sim = env.sim
        sim._ensure_built()
        segs = segs + np.asarray(
            sim.sim.env_origins[env.idx], np.float32
        )  # env -> world
        col = _un_structured(colors).reshape(-1, 3)
        if len(col) < len(segs):
            col = np.broadcast_to(
                col[:1] if len(col) else np.ones((1, 3), np.float32),
                (len(segs), 3),
            )
        viewer.lines.append((env.idx, segs, col[: len(segs)]))

    def clear_lines(self, viewer: Viewer):
        viewer.lines = []

    def draw_env_rigid_contacts(self, viewer: Viewer, env: Env, color, scale, b: bool):
        sim = env.sim
        sim._ensure_built()
        cf = np.asarray(sim.sim.state.contact_force[env.idx])
        pts = np.asarray(sim.sim.state.body_pos[env.idx])
        segs = np.stack([pts, pts + cf * scale], axis=1).astype(np.float32)
        col = np.broadcast_to(
            np.asarray([1.0, 0, 0], np.float32), (len(segs), 3)
        )
        viewer.lines.append((env.idx, segs, col))

    def draw_env_soft_contacts(self, viewer, env, color, scale, a: bool, b: bool):
        """Line segments along surface-triangle normals scaled by contact
        proximity to the ground plane (the soft analog of
        draw_env_rigid_contacts; reference: soft_body.py stress viz)."""
        sim = env.sim
        sim._ensure_built()
        soft = sim.sim.scene.soft
        if soft is None:
            return
        st = sim.sim.stepper.soft
        import jax

        if not hasattr(st, "_jit_tri_normals"):
            st._jit_tri_normals = jax.jit(st.tri_normals)
        pos = np.asarray(sim.sim.state.soft_pos[env.idx])  # (Vt, 3)
        nrm = np.asarray(
            st._jit_tri_normals(sim.sim.state.soft_pos[env.idx : env.idx + 1])
        )[0]  # (S, 3)
        centers = pos[soft.tris].mean(axis=1)  # (S, 3)
        # contact = triangle center within `thickness + 1 cm` of the plane
        d = centers @ st.plane_n - st.plane_d - soft.thickness
        mask = d < 0.01
        if not mask.any():
            return
        segs = np.stack(
            [centers[mask], centers[mask] + nrm[mask] * scale], axis=1
        )
        col = (
            np.asarray([color.x, color.y, color.z], np.float32)
            if hasattr(color, "x")
            else np.asarray(color, np.float32)
        )
        col = np.broadcast_to(col.reshape(-1, 3)[:1], (len(segs), 3))
        viewer.lines.append((env.idx, segs.astype(np.float32), col))


def _prim_opts(o: AssetOptions) -> dict:
    return dict(
        fix_base_link=o.fix_base_link,
        disable_gravity=o.disable_gravity,
        linear_damping=o.linear_damping,
        angular_damping=o.angular_damping,
        max_linear_velocity=o.max_linear_velocity,
        max_angular_velocity=o.max_angular_velocity,
    )


def _load_texture(path: str) -> np.ndarray:
    try:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGBA"))
        return img
    except Exception:
        try:
            import imageio.v2 as imageio

            img = np.asarray(imageio.imread(path))
            if img.ndim == 2:
                img = np.stack([img] * 3 + [np.full_like(img, 255)], -1)
            if img.shape[-1] == 3:
                img = np.concatenate(
                    [img, np.full(img.shape[:2] + (1,), 255, img.dtype)], -1
                )
            return img.astype(np.uint8)
        except Exception:
            return np.full((8, 8, 4), 128, np.uint8)


def _write_image(path: str, img: np.ndarray):
    try:
        from PIL import Image

        if img.dtype != np.uint8:
            lo, hi = np.nanmin(img[np.isfinite(img)]), np.nanmax(img[np.isfinite(img)])
            img = np.where(np.isfinite(img), img, lo)
            img = ((img - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        Image.fromarray(img).save(path)
    except Exception:
        np.save(path + ".npy", img)


_GYM_SINGLETON: Optional[Gym] = None


def acquire_gym() -> Gym:
    """The reference's gymapi.acquire_gym() singleton
    (/root/reference/test/test01_isaacgym_asset.py:104)."""
    global _GYM_SINGLETON
    if _GYM_SINGLETON is None:
        _GYM_SINGLETON = Gym()
    return _GYM_SINGLETON
