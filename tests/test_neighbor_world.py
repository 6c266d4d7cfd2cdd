"""Neighbor-list contact path for large mixed free-body worlds
(VERDICT r2 item 6: "a 1080-box single-group world builds and settles" —
the projectiles.py group -1 / 1080_balls scale with non-sphere shapes)."""
import numpy as np
import pytest

import test_isaacgym_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from test_isaacgym_tpu.assets import create_box, create_sphere
from test_isaacgym_tpu.core.config import PlaneParams, SimParams
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.sim import Simulator


def _box_world(n_boxes, group=-1, spacing=0.25, h=0.1, layers=1, seed=3):
    sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
    sp.physx.num_position_iterations = 4
    box = create_box(2 * h, 2 * h, 2 * h, density=500.0)  # full dims -> half h
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    b.create_env((-50, -50, 0), (50, 50, 10), 1)
    rng = np.random.RandomState(seed)
    side = int(np.ceil(np.sqrt(n_boxes / layers)))
    i = 0
    for lz in range(layers):
        for gy in range(side):
            for gx in range(side):
                if i >= n_boxes:
                    break
                jitter = rng.uniform(-0.01, 0.01, 2)
                b.create_actor(
                    0, box,
                    pos=(gx * spacing + jitter[0], gy * spacing + jitter[1],
                         h + 0.002 + lz * (2 * h + 0.05)),
                    name=f"box{i}", group=group, filter=0,
                )
                i += 1
    return Simulator(*b.finalize())


def test_neighbor_world_selected_and_static_table_empty():
    sim = _box_world(80)
    cs = sim.stepper.contact
    assert cs.neighbor_world is not None
    assert len(cs.neighbor_world.shape_idx) == 80
    assert cs.num_contacts == 0  # nothing left for the static table


@pytest.mark.slow
def test_1080_box_world_builds_and_settles():
    """1080 boxes in ONE collision group (static table would need ~582k
    pairs) must build and settle to rest on the ground."""
    sim = _box_world(1080)
    z0 = np.asarray(sim.state.root_pos[0, :, 2])
    run = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 30))
    s = sim.state
    for _ in range(4):  # 120 steps
        s = run(s)
    z = np.asarray(s.root_pos[0, :, 2])
    v = np.asarray(s.root_linvel[0])
    # all boxes rest ON the ground (half extent 0.1), none tunneled or blew up
    assert z.min() > 0.05, z.min()
    assert z.max() < 0.3, z.max()
    assert np.abs(v).max() < 0.1, np.abs(v).max()


def test_box_stack_via_neighbor_path():
    """Two layers: top boxes come to rest ON the bottom layer (box-box SAT
    manifold transmits support through the neighbor path)."""
    sim = _box_world(128, layers=2, spacing=0.5)
    run = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 30))
    s = sim.state
    for _ in range(5):
        s = run(s)
    z = np.asarray(s.root_pos[0, :, 2])
    v = np.asarray(s.root_linvel[0])
    n_top = (z > 0.25).sum()
    assert n_top >= 40, n_top  # most of the 64 top boxes still stacked
    assert np.abs(v).max() < 0.15


def test_mixed_spheres_and_boxes():
    """A mixed 100-sphere + 100-box world takes the neighbor path (the
    pure-sphere Pallas path can't) and settles without tunneling."""
    sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
    box = create_box(0.2, 0.2, 0.2, density=500.0)  # half extents 0.1
    ball = create_sphere(0.1, density=500.0)
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    b.create_env((-50, -50, 0), (50, 50, 10), 1)
    rng = np.random.RandomState(0)
    for i in range(200):
        a = box if i % 2 else ball
        gx, gy = divmod(i, 15)
        b.create_actor(
            0, a, pos=(gx * 0.35, gy * 0.35, 0.12 + rng.uniform(0, 0.3)),
            name=f"o{i}", group=-1, filter=0,
        )
    sim = Simulator(*b.finalize())
    cs = sim.stepper.contact
    # spheres ride the dense Pallas path, box-involving pairs the neighbor
    # path; nothing is left for the static table
    assert cs.neighbor_world is not None and cs.sphere_world is not None
    assert not cs.neighbor_world.ground_spheres
    assert cs.num_contacts == 0
    run = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 40))
    s = run(sim.state)
    s = run(s)
    z = np.asarray(s.root_pos[0, :, 2])
    assert z.min() > 0.05 and z.max() < 0.6


def test_offset_rotated_shapes_take_fast_path():
    """Shape-offset and rotated single-shape free bodies now qualify
    (round-4 eligibility broadening — projectiles.py:120-style actors carry
    geom origins): the pose folds into the solver's shape centers and the
    world still settles without tunneling."""
    from test_isaacgym_tpu.assets.types import GeomSpec, GEOM_BOX, GEOM_SPHERE

    sp = SimParams(dt=1 / 60, substeps=2, gravity=(0.0, 0.0, -9.8))
    box = create_box(0.2, 0.2, 0.2, density=500.0)
    ball = create_sphere(0.1, density=500.0)
    # move the geoms OFF the body origin and rotate the box's geom
    for a, off in ((box, (0.05, 0.02, 0.03)), (ball, (0.0, 0.04, -0.02))):
        g = a.links[0].geoms[0]
        g.pos = off
        if g.kind == GEOM_BOX:
            s2 = float(np.sin(0.3 / 2))
            g.quat = (0.0, 0.0, s2, float(np.cos(0.3 / 2)))
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    b.create_env((-50, -50, 0), (50, 50, 10), 1)
    rng = np.random.RandomState(3)
    for i in range(140):
        a = box if i % 2 else ball
        gx, gy = divmod(i, 12)
        b.create_actor(
            0, a, pos=(gx * 0.4, gy * 0.4, 0.2 + rng.uniform(0, 0.3)),
            name=f"o{i}", group=-1, filter=0,
        )
    sim = Simulator(*b.finalize())
    cs = sim.stepper.contact
    assert cs.neighbor_world is not None
    assert len(cs.neighbor_world.shape_idx) >= 70  # boxes + offset spheres
    run = jax.jit(lambda s: sim.stepper.rollout(s, sim.actions, sim.params, 40))
    s = run(sim.state)
    s = run(s)
    s = run(s)
    pos = np.asarray(s.root_pos[0])
    z = pos[:, 2]
    assert np.isfinite(pos).all()
    # nothing tunnels (origin can sit below ground by its geom offset, so
    # bound with margin) and nothing launches
    assert z.min() > -0.06 and z.max() < 0.8, (z.min(), z.max())
