"""VHACD consumption: decomposed hulls become real collision shapes.

Mirrors /root/reference/examples/convex_decomposition.py:81-98 — a YCB mesh
loaded with vhacd_enabled produces multiple convex hull shapes, the hulls are
cached, and the resulting body collides as hulls (not a bounding box).
"""
import numpy as np
import pytest

from test_isaacgym_tpu import gymapi
from test_isaacgym_tpu.core.scene import SHAPE_MESH, SceneBuilder
from test_isaacgym_tpu.core.config import SimParams, PlaneParams
from test_isaacgym_tpu.core.sim import Simulator

ROOT = "/root/reference/assets"
BANANA = "urdf/ycb/011_banana/011_banana.urdf"


def _load(vhacd: bool):
    gym = gymapi.acquire_gym()
    sim = gym.create_sim(0, 0, gymapi.SIM_PHYSX, gymapi.SimParams())
    opts = gymapi.AssetOptions()
    opts.vhacd_enabled = vhacd
    opts.vhacd_params.max_convex_hulls = 8
    opts.vhacd_params.max_num_vertices_per_ch = 32
    return gym.load_asset(sim, ROOT, BANANA, opts)


def test_vhacd_roundtrip_cache():
    single = _load(False)
    n_single = sum(len(l.geoms) for l in single.links)
    decomposed = _load(True)
    n_dec = sum(len(l.geoms) for l in decomposed.links)
    assert n_dec >= n_single, (n_single, n_dec)
    for l in decomposed.links:
        for g in l.geoms:
            assert g.vertices is not None and len(g.vertices) >= 4
    # second load hits the hash cache and agrees exactly
    again = _load(True)
    a = [g.vertices for l in decomposed.links for g in l.geoms]
    b = [g.vertices for l in again.links for g in l.geoms]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_decomposed_hulls_are_contact_shapes():
    """The scene registers one hull per decomposed piece and the contact
    solver consumes them (hull kinds, not AABB boxes)."""
    asset = _load(True)
    sp = SimParams(dt=1 / 60, substeps=2)
    b = SceneBuilder(sp)
    b.add_ground(PlaneParams())
    for i in range(2):
        b.create_env((-1, -1, 0), (1, 1, 1), 2)
        b.create_actor(i, asset, pos=(0, 0, 0.2), name="banana", group=i, filter=0)
    sim = Simulator(*b.finalize())
    scene = sim.scene
    n_mesh_shapes = int((scene.shapes.kind == SHAPE_MESH).sum())
    assert n_mesh_shapes >= 1
    assert len(scene.hulls) >= 1
    assert (scene.shapes.hull_id >= 0).sum() == n_mesh_shapes
    # hull-vs-plane contacts exist in the job table
    from test_isaacgym_tpu.physics import contacts as cm

    solver = sim.stepper.contact
    assert solver.enabled
    assert (solver.job.kind == cm.K_HULL_PLANE).any()
    # and the body settles on the ground instead of exploding
    import jax

    st = sim.state
    step = jax.jit(sim.stepper.step)
    for _ in range(120):
        st = step(st, sim.actions, sim.params)
    z = np.asarray(st.root_pos[:, 0, 2])
    assert (z > -0.01).all() and (z < 0.2).all(), z
