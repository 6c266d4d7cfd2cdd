"""TIG_DEBUG sanitizer mode (SURVEY.md §5.2; VERDICT r4 item 7).

The reference has no race/aliasing sanitizers (SURVEY §5.2 — tensor-view
staleness is handled by call-ordering convention only). The functional TPU
engine's debug mode instead checks the hazards that exist HERE: non-finite
state escaping a substep, donation/aliasing mutation of inputs, and
contact-table shape invariants. One test drives the flagship (Franka OSC)
and the contact-rich franka_cube step under the flag.
"""
import importlib

import jax
import numpy as np
import pytest


@pytest.fixture()
def tig_debug(monkeypatch):
    monkeypatch.setenv("TIG_DEBUG", "1")
    from test_isaacgym_tpu.utils import debug

    assert debug.enabled()
    yield debug


@pytest.mark.slow
def test_flagship_step_under_debug(tig_debug):
    from test_isaacgym_tpu.envs.franka import FrankaOscEnv

    env = FrankaOscEnv(num_envs=8)
    st = tig_debug.verify_step_purity(
        env.sim.stepper, env.sim.state, env.sim.actions, env.sim.params
    )
    assert np.isfinite(np.asarray(st.dof_pos)).all()


@pytest.mark.slow
def test_franka_cube_step_under_debug(tig_debug):
    from test_isaacgym_tpu.envs.franka_cube import FrankaCubeEnv

    env = FrankaCubeEnv(num_envs=4)
    st = tig_debug.verify_step_purity(
        env.sim.stepper, env.sim.state, env.sim.actions, env.sim.params
    )
    assert np.isfinite(np.asarray(st.root_pos)).all()


def test_finite_check_catches_nan(tig_debug):
    """The in-jit finite check must actually fire on a poisoned pytree."""
    bad = {"x": jnp_array_with_nan()}
    with pytest.raises(Exception, match="non-finite"):
        f = jax.jit(lambda t: tig_debug.check_finite(t, "poison"))
        jax.block_until_ready(f(bad))


def jnp_array_with_nan():
    import jax.numpy as jnp

    return jnp.array([1.0, jnp.nan, 3.0])
