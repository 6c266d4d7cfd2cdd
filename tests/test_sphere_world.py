"""Dense sphere-world contact path (ops/sphere_world.py).

Covers: analytic two-sphere collision physics, the end-to-end 1080-ball
single-world scene (/root/reference/examples/1080_balls_of_solitude.py under
--all_collisions), spec construction/routing, and (on TPU only) Pallas-vs-jnp
parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_isaacgym_tpu.ops import sphere_world as sw


def _spec(F, allow=None, ground=True, plane_friction=1.0):
    if allow is None:
        allow = np.triu(np.ones((F, F), bool), 1)
    return sw.SphereWorldSpec(
        shape_idx=np.arange(F, dtype=np.int32),
        free_idx=np.arange(F, dtype=np.int32),
        body_slot=np.arange(F, dtype=np.int32),
        allow=allow,
        has_ground=ground,
        plane_n=np.array([0, 0, 1], np.float32),
        plane_d=0.0,
        plane_friction=plane_friction,
        plane_restitution=0.0,
    )


def _ball_args(pos, vel, omega=None, r=0.2, density=500.0, mu=0.8, rest=0.0):
    pos = np.asarray(pos, np.float32)[None]
    vel = np.asarray(vel, np.float32)[None]
    F = pos.shape[1]
    omega = np.zeros_like(pos) if omega is None else np.asarray(omega, np.float32)[None]
    m = 4 / 3 * np.pi * r**3 * density
    return (
        jnp.asarray(pos),
        jnp.asarray(vel),
        jnp.asarray(omega),
        jnp.full((1, F), r, jnp.float32),
        jnp.full((1, F), 1.0 / m, jnp.float32),
        jnp.full((1, F), 1.0 / (0.4 * m * r * r), jnp.float32),
        jnp.full((1, F), mu, jnp.float32),
        jnp.full((1, F), rest, jnp.float32),
    )


def test_head_on_collision_conserves_momentum():
    """Two equal spheres colliding head-on in free space: momentum exactly
    conserved; with rest=0 the pair ends (near) co-moving."""
    spec = _spec(2, ground=False)
    args = _ball_args(
        pos=[[-0.19, 0, 1.0], [0.19, 0, 1.0]],  # overlap 0.02
        vel=[[1.0, 0, 0], [-1.0, 0, 0]],
    )
    v1, w1, cf = sw._jnp_solve(spec, *args, 1 / 120, 12, 0.01, 0.0025, 0.2)
    v1 = np.asarray(v1[0])
    assert abs(v1[0, 0] + v1[1, 0]) < 1e-4  # momentum
    # approach killed; only the Baumgarte depenetration bias remains
    # (beta/h * (depth - slop) = 0.2 * 120 * 0.0175 = 0.42 separation)
    sep = v1[1, 0] - v1[0, 0]
    assert -0.05 < sep < 0.6, sep
    cf = np.asarray(cf[0])
    assert cf[0, 0] < 0 and cf[1, 0] > 0  # pushed apart


def test_restitution_bounce():
    """rest=0.8 head-on pair separates at ~0.8x the approach speed."""
    spec = _spec(2, ground=False)
    args = _ball_args(
        pos=[[-0.195, 0, 1.0], [0.195, 0, 1.0]],
        vel=[[1.0, 0, 0], [-1.0, 0, 0]],
        rest=0.8,
    )
    v1, _, _ = sw._jnp_solve(spec, *args, 1 / 120, 20, 0.01, 0.0025, 0.2)
    v1 = np.asarray(v1[0])
    # approach 2.0 -> separation ~1.6 (0.8 per unit of normal closing speed)
    sep = v1[1, 0] - v1[0, 0]
    assert 1.2 < sep < 1.8, sep


def test_ground_support():
    """A sphere resting exactly at r on the plane feels gravity-cancelling
    support (velocity after solve ~ 0 given pre-integrated gravity kick)."""
    spec = _spec(1)
    h = 1 / 120
    # resting pose sits `slop` into the plane (the designed compliance)
    args = _ball_args(pos=[[0, 0, 0.2 - 0.003]], vel=[[0, 0, -9.8 * h]])
    v1, _, cf = sw._jnp_solve(spec, *args, h, 12, 0.01, 0.0025, 0.2)
    assert abs(float(v1[0, 0, 2])) < 2e-2
    assert float(cf[0, 0, 2]) > 0


def test_allow_mask_respected():
    """Filtered pair passes through untouched."""
    allow = np.zeros((2, 2), bool)  # nothing collides
    spec = _spec(2, allow=allow, ground=False)
    args = _ball_args(
        pos=[[-0.1, 0, 1.0], [0.1, 0, 1.0]],  # heavy overlap
        vel=[[1.0, 0, 0], [-1.0, 0, 0]],
    )
    v1, _, cf = sw._jnp_solve(spec, *args, 1 / 120, 8, 0.01, 0.0025, 0.2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(args[1]), atol=1e-6)
    assert float(jnp.abs(cf).max()) == 0.0


def test_spec_builds_and_routes_large_scenes():
    """>=64 free spheres leave the static table for the dense path."""
    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=1, pyramids=4)  # 120 balls
    c = env.sim.stepper.contact
    assert c.sphere_world is not None
    assert len(c.sphere_world.shape_idx) == 120
    assert c.num_contacts == 0  # no static-table rows at all
    assert c.enabled


def test_balls_world_settles():
    """120-ball world: balls fall, pile up, never sink or explode, and the
    pile's kinetic energy decays (reference behavior: pyramids collapse
    into resting piles, 1080_balls_of_solitude.py:117-158)."""
    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=1, pyramids=4)
    run = jax.jit(env.rollout_fn(60))
    s = run(env.sim.state)
    v_mid = float(jnp.abs(s.root_linvel).max())
    for _ in range(3):
        s = run(s)
    z = np.asarray(s.root_pos[0, :, 2])
    v = np.asarray(s.root_linvel[0])
    assert z.min() > 0.15, f"sank: zmin={z.min()}"
    assert z.max() < 3.0, f"exploded: zmax={z.max()}"
    assert np.abs(v).max() < max(0.7 * v_mid, 0.6), "energy not decaying"
    # ground support force present on bottom balls
    cf = np.asarray(s.contact_force[0])
    assert cf[:, 2].max() > 0


def test_batched_worlds():
    """num_worlds > 1 batches identical worlds along the env axis."""
    from test_isaacgym_tpu.envs.balls import BallsEnv

    env = BallsEnv(num_worlds=2, pyramids=3)  # 90 balls x 2 worlds
    run = jax.jit(env.rollout_fn(30))
    s = run(env.sim.state)
    z = np.asarray(s.root_pos[..., 2])
    assert z.shape[0] == 2
    assert z.min() > 0.15
    # identical worlds + identical init -> identical trajectories
    np.testing.assert_allclose(z[0], z[1], atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernel needs a TPU"
)
def test_pallas_matches_jnp():
    rng = np.random.RandomState(3)
    F = 96
    pos = rng.uniform(-1, 1, (1, F, 3)).astype(np.float32)
    pos[..., 2] = rng.uniform(0.1, 1.0, (1, F))
    vel = rng.uniform(-1, 1, (1, F, 3)).astype(np.float32)
    omega = rng.uniform(-3, 3, (1, F, 3)).astype(np.float32)
    spec = _spec(F)
    args = _ball_args(pos[0], vel[0], omega[0])
    a = sw._jnp_solve(spec, *args, 1 / 120, 8, 0.01, 0.0025, 0.2)
    b = sw._pallas_solve(spec, *args, 1 / 120, 8, 0.01, 0.0025, 0.2)
    for x, y in zip(a[:2], b[:2]):
        scale = max(float(jnp.abs(x).max()), 1.0)
        assert float(jnp.abs(x - y).max()) / scale < 5e-3
