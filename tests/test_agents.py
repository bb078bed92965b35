"""Unit tests for the DMPO agent stack (distributions, MPO loss,
categorical projection, replay, learner update)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flybody_tpu.agents import losses_mpo
from flybody_tpu.agents.distributions import NormalDiag, kl_normal_diag_per_dim
from flybody_tpu.agents.dmpo import (DMPOConfig, DMPOLearner, Transition,
                                     categorical_l2_project)
from flybody_tpu.agents.networks import make_policy_critic
from flybody_tpu.agents.replay import replay_init, replay_insert, replay_sample


def test_normal_diag_log_prob_matches_scipy():
    from scipy import stats
    mean = np.array([0.3, -0.5])
    std = np.array([0.7, 1.3])
    d = NormalDiag(jnp.asarray(mean), jnp.asarray(std))
    x = np.array([0.1, 0.2])
    expected = stats.norm.logpdf(x, mean, std).sum()
    np.testing.assert_allclose(d.log_prob(jnp.asarray(x)), expected,
                               rtol=1e-6)


def test_kl_per_dim():
    p = NormalDiag(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 2.0]))
    q = NormalDiag(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(kl_normal_diag_per_dim(p, q), 0.0, atol=1e-7)
    q2 = NormalDiag(jnp.asarray([1.0, 1.0]), jnp.asarray([1.0, 2.0]))
    kl = kl_normal_diag_per_dim(p, q2)
    np.testing.assert_allclose(kl[0], 0.5, rtol=1e-6)  # (dm/s)^2/2
    np.testing.assert_allclose(kl[1], 0.0, atol=1e-7)


def test_categorical_projection_preserves_mass_and_mean():
    z_q = jnp.linspace(-10.0, 10.0, 21)
    z_p = jnp.asarray([[-3.3, 0.1, 7.7, 2.2]])
    probs = jnp.asarray([[0.1, 0.4, 0.3, 0.2]])
    out = categorical_l2_project(z_p, probs, z_q)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose((out * z_q).sum(), (probs * z_p).sum(),
                               rtol=1e-5)


def test_mpo_loss_weights_and_duals():
    key = jax.random.PRNGKey(0)
    N, B, D = 10, 4, 3
    duals = losses_mpo.init_dual_params(D)
    online = NormalDiag(jnp.zeros((B, D)), jnp.ones((B, D)))
    target = NormalDiag(0.1 * jnp.ones((B, D)), 0.9 * jnp.ones((B, D)))
    actions = jax.random.normal(key, (N, B, D))
    q = jax.random.normal(key, (N, B))
    cfg = losses_mpo.MPOConfig()
    loss, stats = losses_mpo.mpo_loss(cfg, duals, online, target, actions, q)
    assert jnp.isfinite(loss)
    for k, v in stats.items():
        assert jnp.all(jnp.isfinite(v)), k
    # grads flow to both policy (through online dist) and duals
    def f(mean, duals):
        o = NormalDiag(mean, jnp.ones((B, D)))
        l, _ = losses_mpo.mpo_loss(cfg, duals, o, target, actions, q)
        return l
    g_mean, g_duals = jax.grad(f, argnums=(0, 1))(jnp.zeros((B, D)), duals)
    assert float(jnp.abs(g_mean).sum()) > 0
    assert float(jnp.abs(g_duals.log_temperature).sum()) > 0


def test_replay_ring_and_sampling():
    ex = Transition(obs=jnp.zeros((1, 4)), action=jnp.zeros((1, 2)),
                    reward=jnp.zeros((1,)), discount=jnp.zeros((1,)),
                    next_obs=jnp.zeros((1, 4)))
    state = replay_init(8, ex)
    batch = Transition(obs=jnp.arange(20.0).reshape(5, 4),
                       action=jnp.ones((5, 2)),
                       reward=jnp.arange(5.0),
                       discount=jnp.ones((5,)),
                       next_obs=jnp.zeros((5, 4)))
    state = replay_insert(state, batch)
    assert int(state.size) == 5 and int(state.insert_pos) == 5
    state = replay_insert(state, batch)  # wraps
    assert int(state.size) == 8 and int(state.insert_pos) == 2
    got = replay_sample(state, jax.random.PRNGKey(1), 16)
    assert got.obs.shape == (16, 4)


def test_learner_update_improves_critic_smoke():
    obs_size, action_size = 6, 3
    policy, critic, _ = make_policy_critic(
        action_size, obs_size, policy_layers=(32, 32),
        critic_layers=(32, 32))
    cfg = DMPOConfig(batch_size=16, num_samples=5)
    learner = DMPOLearner(policy, critic, action_size, obs_size, cfg)
    state = learner.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    batch = Transition(
        obs=jax.random.normal(key, (16, obs_size)),
        action=jnp.clip(jax.random.normal(key, (16, action_size)), -1, 1),
        reward=jax.random.uniform(key, (16,)),
        discount=0.99 * jnp.ones((16,)),
        next_obs=jax.random.normal(key, (16, obs_size)))
    update = jax.jit(learner.update)
    losses = []
    for _ in range(10):
        state, stats = update(state, batch)
        losses.append(float(stats["critic_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # critic fits the fixed batch
    assert int(state.steps) == 10
