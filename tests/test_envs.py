"""Environment-level tests: specs, determinism, auto-reset, batching."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball


@pytest.fixture(scope="module")
def env():
    return walk_on_ball(time_limit=0.02, dtype=jnp.float32)  # 10 steps


def test_specs(env):
    lo, hi = env.action_spec()
    assert lo.shape == (59,) and hi.shape == (59,)
    assert np.all(lo < hi)
    # adhesion actuators have ctrlrange [0, 1]
    assert np.any(lo == 0.0)


def test_reset_deterministic(env):
    s1 = env.reset(jax.random.split(jax.random.PRNGKey(7), 2))
    s2 = env.reset(jax.random.split(jax.random.PRNGKey(7), 2))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(a, b)


def test_step_and_autoreset(env):
    step = jax.jit(env.autoreset_step)
    state = env.reset(jax.random.PRNGKey(0)[None].repeat(1, 0)
                      if False else jax.random.split(jax.random.PRNGKey(0), 1))
    a = jnp.zeros((1, env.action_size))
    for t in range(12):
        state = step(state, a)
        assert bool(jnp.all(jnp.isfinite(state.data.qpos)))
    # time limit is 10 control steps: an auto-reset must have happened
    assert int(state.step_idx[0]) < 12
    assert float(state.discount[0]) in (0.0, 1.0)


def test_batched_step(env):
    n = 4
    states = env.reset(jax.random.split(jax.random.PRNGKey(0), n))
    step = jax.jit(env.autoreset_step)
    actions = jnp.zeros((n, env.action_size))
    states = step(states, actions)
    assert states.reward.shape == (n,)
    # 85 = 102 scalar joints minus the disabled wings/mouth/antennae
    # (kept in the model, excluded from observation — reference
    # fruitfly.py:209-247)
    assert states.obs["joints_pos"].shape == (n, 85)
    assert bool(jnp.all(jnp.isfinite(states.obs["ball_qvel"])))


def test_obs_reasonable_at_rest(env):
    state = env.reset(jax.random.split(jax.random.PRNGKey(0), 1))
    # world_zaxis of an upright fly ~ +z
    assert float(state.obs["world_zaxis"][0, 2]) > 0.9


def test_remove_vision_wrapper():
    """Reference RemoveVisionWrapper analog (vnl_ray/wrapper.py:92-108):
    eye observations disappear; stepping still works."""
    from flybody_tpu.envs.wrappers import remove_vision
    from flybody_tpu.fly_envs import vision_guided_flight

    env = remove_vision(vision_guided_flight(bumps_or_trench="bumps"))
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
    assert "left_eye" not in state.obs and "right_eye" not in state.obs
    lo, hi = env.action_spec()
    act = jnp.broadcast_to(jnp.asarray((lo + hi) / 2, jnp.float32),
                           (2, env.action_size))
    state = jax.jit(env.autoreset_step)(state, act)
    assert "left_eye" not in state.obs
    assert bool(jnp.all(jnp.isfinite(state.reward)))
