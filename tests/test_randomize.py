"""Domain randomization tests (examples/domain_randomization.py behaviors)."""
import numpy as np

import test_isaacgym_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from test_isaacgym_tpu import randomize as dr
from test_isaacgym_tpu.core.config import SimParams
from test_isaacgym_tpu.core.scene import SceneBuilder
from test_isaacgym_tpu.core.sim import Simulator
from test_isaacgym_tpu.assets.primitives import create_sphere


def _params(num_envs=4):
    b = SceneBuilder(SimParams())
    ball = create_sphere(0.1, density=100.0)
    for i in range(num_envs):
        b.create_env((-1, -1, 0), (1, 1, 1), 2)
        b.create_actor(i, ball, pos=(0, 0, 1), name="ball")
    sim = Simulator(*b.finalize())
    return sim.params


def test_randomizers_change_only_their_fields():
    p = _params()
    key = jax.random.PRNGKey(0)
    p2 = dr.randomize_shape_friction(key, p, 0.5, 1.5)
    assert not np.allclose(np.asarray(p2.shape_friction), np.asarray(p.shape_friction))
    assert np.allclose(np.asarray(p2.body_mass), np.asarray(p.body_mass))
    f = np.asarray(p2.shape_friction)
    assert (f >= 0.5).all() and (f <= 1.5).all()
    # per-env values differ (leading env axis randomized)
    assert len(np.unique(f.round(6))) > 1

    p3 = dr.randomize_body_mass(key, p, 0.8, 1.2)
    ratio = np.asarray(p3.body_inertia / p.body_inertia).reshape(4, -1)
    mass_ratio = np.asarray(p3.body_mass / p.body_mass)
    # inertia scales with mass
    assert np.allclose(ratio[:, 0], mass_ratio[:, 0], atol=1e-6)


def test_domain_randomizer_interval():
    p = _params()
    sched = dr.DomainRandomizer(interval=100, friction=(0.5, 1.5), mass_scale=None)
    key = jax.random.PRNGKey(1)
    at0 = sched.maybe(key, p, jnp.asarray(0))
    at50 = sched.maybe(key, p, jnp.asarray(50))
    assert not np.allclose(np.asarray(at0.shape_friction), np.asarray(p.shape_friction))
    assert np.allclose(np.asarray(at50.shape_friction), np.asarray(p.shape_friction))


def test_randomize_is_jittable_and_deterministic():
    p = _params()
    f = jax.jit(lambda k, pp: dr.DomainRandomizer().apply(k, pp))
    a = f(jax.random.PRNGKey(7), p)
    b = f(jax.random.PRNGKey(7), p)
    assert np.allclose(np.asarray(a.shape_friction), np.asarray(b.shape_friction))
    c = f(jax.random.PRNGKey(8), p)
    assert not np.allclose(np.asarray(a.shape_friction), np.asarray(c.shape_friction))


def test_camera_and_light_randomizers():
    key = jax.random.PRNGKey(2)
    pos, tgt = dr.randomize_camera_pose(key, 8, (0, 0, 0.5))
    assert pos.shape == (8, 3) and tgt.shape == (8, 3)
    assert (np.asarray(pos[:, 2]) > np.asarray(tgt[:, 2])).all()
    color, ambient, d = dr.randomize_light(key)
    assert abs(float(jnp.linalg.norm(d)) - 1) < 1e-5
    assert float(d[2]) < 0  # light from above
