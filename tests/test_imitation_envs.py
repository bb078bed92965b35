"""Env-level tests for the fly imitation tasks (reference
vnl_ray/fly_envs.walk_imitation / flight_imitation semantics): reset from
the reference snippet, stepping, reward-factor ranges, termination, and
the fused-vs-reference-solver consistency of the production fast path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import flight_imitation, walk_imitation


@pytest.fixture(scope="module")
def walk_env():
    return walk_imitation(time_limit=0.1)


@pytest.fixture(scope="module")
def flight_env():
    return flight_imitation(time_limit=0.05)


def _mid_actions(env, n):
    lo, hi = env.action_spec()
    return jnp.broadcast_to(jnp.asarray((lo + hi) / 2, jnp.float32),
                            (n, env.action_size))


def test_walk_imitation_reset_on_reference(walk_env):
    """Episode init sets root + joints from reference frame 0 (reference
    walk_imitation.py:114-136)."""
    s = walk_env.reset(jax.random.split(jax.random.PRNGKey(0), 2))
    # the synthetic dataset starts at the spawn height, identity quat
    root_z = np.asarray(s.data.qpos[2])
    assert np.all(np.abs(root_z - 0.1278) < 0.05)
    # ref observables present with future previews (future_steps=64)
    assert s.obs["ref_displacement"].shape == (2, 65 * 3)
    assert s.obs["ref_root_quat"].shape == (2, 65 * 4)


def test_walk_imitation_step_reward_termination(walk_env):
    step = jax.jit(walk_env.autoreset_step)
    s = walk_env.reset(jax.random.split(jax.random.PRNGKey(1), 2))
    for _ in range(6):
        s = step(s, _mid_actions(walk_env, 2))
        r = np.asarray(s.reward)
        assert np.all(np.isfinite(r)) and np.all(r >= 0.0) \
            and np.all(r <= 1.0)  # product of DeepMimic Gaussian factors
        assert np.all(np.isfinite(np.asarray(s.data.qpos)))
    # discount stays in {0, 1} (good vs fatal termination)
    assert set(np.unique(np.asarray(s.discount))) <= {0.0, 1.0}


def test_flight_imitation_step(flight_env):
    """WBPG-driven flight: wings beat, reward finite in [0, 1], user
    action controls beat frequency (reference flight_imitation.py)."""
    step = jax.jit(flight_env.autoreset_step)
    s = flight_env.reset(jax.random.split(jax.random.PRNGKey(2), 2))
    wing_qpos_before = np.asarray(s.data.qpos)[...]
    for _ in range(4):
        s = step(s, _mid_actions(flight_env, 2))
        assert np.all(np.isfinite(np.asarray(s.data.qpos)))
        r = np.asarray(s.reward)
        assert np.all(r >= 0.0) and np.all(r <= 1.0)
    assert np.any(np.asarray(s.data.qpos) != wing_qpos_before)


def test_nan_action_scrub(walk_env):
    """NaN actions are zeroed before physics (reference
    walk_imitation.py:146-147): stepping with all-NaN actions must not
    poison qpos."""
    step = jax.jit(walk_env.autoreset_step)
    s = walk_env.reset(jax.random.split(jax.random.PRNGKey(3), 1))
    bad = jnp.full((1, walk_env.action_size), jnp.nan)
    s = step(s, bad)
    assert bool(jnp.all(jnp.isfinite(s.data.qpos)))


def test_walk_imitation_fused_matches_reference_solver():
    """The production fused solver tracks the oracle-grade APGD path on a
    walk_imitation rollout (free fly over floor): joint-space divergence
    stays small over 10 control steps (100 substeps)."""
    from flybody_tpu.envs.core import FlyEnv
    from flybody_tpu.physics import io_mj

    env_fast = walk_imitation(time_limit=0.1)

    # same compiled model + task, reference solver with full budgets
    # (model statics like jnt_qposadr are identical in both builds)
    env0 = walk_imitation(time_limit=0.1)
    m_ref = io_mj.put_model(env0.mj_model, dtype=jnp.float32)
    env_ref = FlyEnv(m_ref, env0.task, mj_model=env0.mj_model)

    sf = env_fast.reset(jax.random.split(jax.random.PRNGKey(4), 1))
    sr = env_ref.reset(jax.random.split(jax.random.PRNGKey(4), 1))
    act = _mid_actions(env_fast, 1)
    stepf = jax.jit(env_fast.step)
    stepr = jax.jit(env_ref.step)
    for _ in range(10):
        sf = stepf(sf, act)
        sr = stepr(sr, act)
    qf = np.asarray(sf.data.qpos)
    qr = np.asarray(sr.data.qpos)
    assert np.all(np.isfinite(qf))
    # same contact regime: divergence bounded (chaotic contact dynamics
    # forbid exactness; catching a mis-budgeted solver is the point)
    assert np.max(np.abs(qf - qr)) < 5e-2, np.max(np.abs(qf - qr))
    rf, rr = float(sf.reward[0]), float(sr.reward[0])
    assert abs(rf - rr) < 0.2, (rf, rr)
