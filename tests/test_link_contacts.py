"""Free bodies vs articulated-link colliders (the grasp mechanism of
franka_cube_ik_osc: gripper links push/carry free objects)."""
import numpy as np

import test_isaacgym_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from test_isaacgym_tpu.assets.primitives import create_box, create_sphere
from test_isaacgym_tpu.assets.types import (
    DOF_MODE_POS,
    GEOM_BOX,
    AssetSpec,
    GeomSpec,
    JointSpec,
    LinkSpec,
    compute_default_inertia,
)
from test_isaacgym_tpu.core.config import SimParams
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.sim import Simulator


def _platform_asset(axis):
    """Fixed-base articulation: one prismatic DOF moving a flat box link."""
    base = LinkSpec(name="base")
    compute_default_inertia(base, 1000.0)
    plat = LinkSpec(
        name="platform",
        parent=0,
        joint=JointSpec(
            name="lift",
            jtype="prismatic",
            axis=axis,
            has_limits=True,
            lower=-2.0,
            upper=2.0,
            effort=1e5,
            velocity=10.0,
            stiffness=2e4,
            damping=2e3,
            drive_mode=DOF_MODE_POS,
        ),
        geoms=[GeomSpec(kind=GEOM_BOX, size=(0.5, 0.5, 0.05), friction=1.0)],
    )
    compute_default_inertia(plat, 1000.0)
    return AssetSpec(name="platform", links=[base, plat], fix_base_link=True)


def _scene(axis, shape="sphere"):
    b = SceneBuilder(SimParams(dt=1 / 60, substeps=2))
    plat = _platform_asset(axis)
    if shape == "sphere":
        obj = create_sphere(0.1, density=300.0)
    else:
        obj = create_box(0.2, 0.2, 0.2, density=300.0)
    for i in range(2):
        b.create_env((-2, -2, 0), (2, 2, 4), 2)
        b.create_actor(i, plat, pos=(0, 0, 0.5), name="plat", group=i, filter=0)
        b.create_actor(i, obj, pos=(0, 0, 0.66), name="ball", group=i, filter=0)
    return Simulator(*b.finalize())


def test_ball_rides_lifting_platform():
    sim = _scene(axis=(0, 0, 1))
    ball_slot = sim.scene.find_actor("ball").slot
    # command the platform up by 0.5 m
    sim.set_dof_position_targets(np.full((2, 1), 0.5, np.float32))
    step = jax.jit(sim.stepper.step)
    st = sim.state
    for _ in range(180):
        st = step(st, sim.actions, sim.params)
    z = np.asarray(st.root_pos[:, ball_slot, 2])
    # platform top moved from 0.55 to ~1.05; ball (r=0.1) rides to ~1.15
    assert (z > 1.0).all(), z
    assert (z < 1.35).all(), z


def test_box_dragged_by_friction():
    # a BOX (a sphere would roll in place — correct physics) carried by the
    # moving platform through friction: the grasp-lift mechanism
    sim = _scene(axis=(1, 0, 0), shape="box")
    ball_slot = sim.scene.find_actor("ball").slot
    # soften the drive so the platform glides instead of snapping (a snap
    # correctly shoots the platform out from under the box)
    import jax.numpy as jnp

    sim.params = sim.params._replace(
        dof_stiffness=jnp.full_like(sim.params.dof_stiffness, 400.0),
        dof_damping=jnp.full_like(sim.params.dof_damping, 400.0),
    )
    sim.set_dof_position_targets(np.full((2, 1), 0.4, np.float32))
    step = jax.jit(sim.stepper.step)
    st = sim.state
    for _ in range(240):
        st = step(st, sim.actions, sim.params)
    x = np.asarray(st.root_pos[:, ball_slot, 0])
    # friction carries the box with the platform (near its 0.4 m travel)
    assert (x > 0.25).all(), x
    # and it stays ON the platform
    z = np.asarray(st.root_pos[:, ball_slot, 2])
    assert (z > 0.6).all(), z


def test_contact_force_reported_on_link():
    sim = _scene(axis=(0, 0, 1))
    plat_meta = sim.scene.find_actor("plat")
    ball_meta = sim.scene.find_actor("ball")
    step = jax.jit(sim.stepper.step)
    st = sim.state
    for _ in range(60):
        st = step(st, sim.actions, sim.params)
    cf = np.asarray(st.contact_force)
    # ball pressed down on the platform link (negative z reaction on link)
    link_body = plat_meta.body_start + 1
    assert cf[0, link_body, 2] < 0.0
    # ball itself reports the upward normal force ~ m g
    ball_body = ball_meta.body_start
    m = float(sim.params.body_mass[0, ball_body])
    assert abs(cf[0, ball_body, 2] - m * 9.8) / (m * 9.8) < 0.35
