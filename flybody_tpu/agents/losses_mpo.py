"""Decoupled-KL MPO loss with MO-MPO action penalization (pure JAX).

Functional port of the reference MPO loss semantics (reference
vnl_ray/agents/losses_mpo.py:60-466; Abdolmaleki et al. 2018, 2020):

* E-step: softmax importance weights from tempered Q-values, temperature
  adapted by its dual loss.
* MO-MPO penalty branch: out-of-bound action cost with its own temperature.
* M-step: decomposed fixed-mean / fixed-stddev cross-entropy losses.
* Per-dimension KL constraints with alpha dual variables.

Dual variables live in an explicit ``DualParams`` pytree updated by the
dual optimizer (the TF reference stores them as lazily-created tf.Variables;
here they are ordinary parameters — same math, functional form).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from flybody_tpu.agents.distributions import NormalDiag, kl_normal_diag_per_dim
from flybody_tpu.physics.types import pytree

_MPO_FLOAT_EPSILON = 1e-8
_MIN_LOG_DUAL = -18.0


@pytree(meta=())
class DualParams:
    log_temperature: jax.Array        # (1,)
    log_alpha_mean: jax.Array         # (D,)
    log_alpha_stddev: jax.Array       # (D,)
    log_penalty_temperature: jax.Array  # (1,)


def init_dual_params(action_dim: int, init_log_temperature=10.0,
                     init_log_alpha_mean=10.0, init_log_alpha_stddev=1000.0,
                     dtype=jnp.float32) -> DualParams:
    return DualParams(
        log_temperature=jnp.full((1,), init_log_temperature, dtype),
        log_alpha_mean=jnp.full((action_dim,), init_log_alpha_mean, dtype),
        log_alpha_stddev=jnp.full((action_dim,), init_log_alpha_stddev,
                                  dtype),
        log_penalty_temperature=jnp.full((1,), init_log_temperature, dtype))


def clip_dual_params(d: DualParams) -> DualParams:
    """Projection keeping duals positive (assign-max in the reference)."""
    c = lambda x: jnp.maximum(_MIN_LOG_DUAL, x)
    return DualParams(c(d.log_temperature), c(d.log_alpha_mean),
                      c(d.log_alpha_stddev), c(d.log_penalty_temperature))


def _weights_and_temperature_loss(q_values, epsilon, temperature):
    """Normalized importance weights + temperature dual loss."""
    tempered = jax.lax.stop_gradient(q_values) / temperature
    weights = jax.lax.stop_gradient(jax.nn.softmax(tempered, axis=0))
    q_logsumexp = jax.nn.logsumexp(tempered, axis=0)
    log_n = jnp.log(jnp.asarray(q_values.shape[0], q_values.dtype))
    loss_temp = temperature * (epsilon + jnp.mean(q_logsumexp) - log_n)
    return weights, jnp.squeeze(loss_temp)


def _nonparametric_kl(weights):
    n = jnp.asarray(weights.shape[0], weights.dtype)
    return jnp.sum(weights * jnp.log(n * weights + 1e-8), axis=0)


def _cross_entropy_loss(actions, weights, dist: NormalDiag):
    log_prob = dist.log_prob(actions)                 # (N, B)
    return jnp.mean(-jnp.sum(log_prob * weights, axis=0))


def _kl_penalty_and_dual_loss(kl, alpha, epsilon):
    mean_kl = jnp.mean(kl, axis=0)                    # (D,)
    loss_kl = jnp.sum(jax.lax.stop_gradient(alpha) * mean_kl)
    loss_alpha = jnp.sum(alpha * (epsilon
                                  - jax.lax.stop_gradient(mean_kl)))
    return loss_kl, loss_alpha


def penalization_cost_real_actions(action_spec_min, action_spec_max):
    """Map canonical [-1,1] actions to real units before the norm penalty
    (reference PenalizationCostRealActions)."""
    scale = jnp.asarray(action_spec_max) - jnp.asarray(action_spec_min)
    offset = jnp.asarray(action_spec_min)

    def cost(actions):
        real = (0.5 * (actions + 1.0)) * scale + offset
        return -jnp.linalg.norm(real, axis=-1)
    return cost


@dataclasses.dataclass(frozen=True)
class MPOConfig:
    epsilon: float = 0.1
    epsilon_mean: float = 0.0025
    epsilon_stddev: float = 1e-7
    epsilon_penalty: float = 0.1
    per_dim_constraining: bool = True
    action_penalization: bool = True
    penalization_cost: Callable | None = None


def mpo_loss(cfg: MPOConfig, duals: DualParams,
             online_dist: NormalDiag, target_dist: NormalDiag,
             actions: jax.Array,   # (N, B, D)
             q_values: jax.Array,  # (N, B)
             ):
    """Returns (loss, stats). Gradients flow to both the online policy
    params (through online_dist) and the dual params."""
    dtype = q_values.dtype
    duals = clip_dual_params(duals)
    temperature = jax.nn.softplus(duals.log_temperature.astype(dtype)) \
        + _MPO_FLOAT_EPSILON
    alpha_mean = jax.nn.softplus(duals.log_alpha_mean.astype(dtype)) \
        + _MPO_FLOAT_EPSILON
    alpha_stddev = jax.nn.softplus(duals.log_alpha_stddev.astype(dtype)) \
        + _MPO_FLOAT_EPSILON

    weights, loss_temperature = _weights_and_temperature_loss(
        q_values, cfg.epsilon, temperature)
    kl_nonparametric = _nonparametric_kl(weights)

    stats = {}
    if cfg.action_penalization:
        penalty_temperature = jax.nn.softplus(
            duals.log_penalty_temperature.astype(dtype)) + _MPO_FLOAT_EPSILON
        if cfg.penalization_cost is None:
            cost = -jnp.linalg.norm(actions, axis=-1)
        else:
            cost = cfg.penalization_cost(actions)
        p_weights, p_loss_temp = _weights_and_temperature_loss(
            cost, cfg.epsilon_penalty, penalty_temperature)
        stats["penalty_kl_q_rel"] = (jnp.mean(_nonparametric_kl(p_weights))
                                     / cfg.epsilon_penalty)
        weights = weights + p_weights
        loss_temperature = loss_temperature + p_loss_temp

    online_mean, online_scale = online_dist.mean, online_dist.stddev
    target_mean, target_scale = target_dist.mean, target_dist.stddev

    fixed_stddev = NormalDiag(mean=online_mean, stddev=target_scale)
    fixed_mean = NormalDiag(mean=target_mean, stddev=online_scale)

    loss_policy_mean = _cross_entropy_loss(actions, weights, fixed_stddev)
    loss_policy_stddev = _cross_entropy_loss(actions, weights, fixed_mean)

    kl_mean = kl_normal_diag_per_dim(target_dist, fixed_stddev)   # (B, D)
    kl_stddev = kl_normal_diag_per_dim(target_dist, fixed_mean)   # (B, D)
    if not cfg.per_dim_constraining:
        kl_mean = jnp.sum(kl_mean, axis=-1, keepdims=True)
        kl_stddev = jnp.sum(kl_stddev, axis=-1, keepdims=True)

    loss_kl_mean, loss_alpha_mean = _kl_penalty_and_dual_loss(
        kl_mean, alpha_mean, cfg.epsilon_mean)
    loss_kl_stddev, loss_alpha_stddev = _kl_penalty_and_dual_loss(
        kl_stddev, alpha_stddev, cfg.epsilon_stddev)

    loss_policy = loss_policy_mean + loss_policy_stddev
    loss_kl_penalty = loss_kl_mean + loss_kl_stddev
    loss_dual = loss_alpha_mean + loss_alpha_stddev + loss_temperature
    loss = loss_policy + loss_kl_penalty + loss_dual

    stats.update({
        "dual_alpha_mean": jnp.mean(alpha_mean),
        "dual_alpha_stddev": jnp.mean(alpha_stddev),
        "dual_temperature": jnp.mean(temperature),
        "loss_policy": loss_policy,
        "loss_mpo_total": loss,
        "loss_alpha": loss_alpha_mean + loss_alpha_stddev,
        "loss_temperature": loss_temperature,
        "kl_q_rel": jnp.mean(kl_nonparametric) / cfg.epsilon,
        "kl_mean_rel": jnp.mean(kl_mean) / cfg.epsilon_mean,
        "kl_stddev_rel": jnp.mean(kl_stddev) / max(cfg.epsilon_stddev,
                                                   1e-12),
        "q_min": jnp.mean(jnp.min(q_values, axis=0)),
        "q_max": jnp.mean(jnp.max(q_values, axis=0)),
        "pi_stddev_min": jnp.mean(jnp.min(online_scale, axis=-1)),
        "pi_stddev_max": jnp.mean(jnp.max(online_scale, axis=-1)),
        "pi_stddev_cond": jnp.mean(jnp.max(online_scale, axis=-1)
                                   / jnp.min(online_scale, axis=-1)),
    })
    return loss, stats
