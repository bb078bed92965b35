"""Distributional MPO learner (pure JAX, single jittable update).

Functional re-design of the reference DMPO learner (reference
vnl_ray/agents/learning_dmpo.py:250-423):

* distributional critic: categorical projection of r + gamma^n * z onto the
  fixed atom grid, cross-entropy against online critic logits; target
  values from N target-policy action samples with log-sum-exp-averaged
  logits.
* policy: decoupled-KL MPO (losses_mpo.mpo_loss) on target-policy samples.
* three optimizers (policy / critic / dual), global-norm clip 40,
  periodic target-network copies (policy %101, critic %107).

The whole update is one pure function over a TrainState pytree — pjit it
over a device mesh with replicated params and sharded batch and the learner
is data-parallel with XLA-inserted allreduce (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from flybody_tpu.agents import losses_mpo
from flybody_tpu.agents.distributions import NormalDiag
from flybody_tpu.agents.losses_mpo import DualParams, MPOConfig
from flybody_tpu.physics.types import pytree


@pytree(meta=())
class TrainState:
    policy_params: Any
    critic_params: Any
    target_policy_params: Any
    target_critic_params: Any
    dual_params: DualParams
    policy_opt_state: Any
    critic_opt_state: Any
    dual_opt_state: Any
    steps: jax.Array
    rng: jax.Array


@pytree(meta=())
class Transition:
    """n-step transition batch (acme.types.Transition analog)."""
    obs: jax.Array        # (B, obs_size) flat
    action: jax.Array     # (B, A)
    reward: jax.Array     # (B,) n-step discounted sum
    discount: jax.Array   # (B,) gamma^n * prod(discounts)
    next_obs: jax.Array   # (B, obs_size)


@dataclasses.dataclass(frozen=True)
class DMPOConfig:
    """Learner hyperparameters (reference ray_distributed_dmpo.py:44-82)."""
    batch_size: int = 256
    n_step: int = 5
    discount: float = 0.99
    num_samples: int = 20
    policy_lr: float = 1e-4
    critic_lr: float = 1e-4
    dual_lr: float = 1e-3
    clip_global_norm: float = 40.0
    target_policy_update_period: int = 101
    target_critic_update_period: int = 107
    mpo: MPOConfig = MPOConfig()
    # optional kickstarting distillation from a teacher policy
    # (reference learning_dmpo.py:361-373): loss += eps * KL(teacher||pi)
    kickstart_epsilon: float = 0.0
    teacher_apply: Callable | None = None  # (obs)->NormalDiag, frozen
    # optional KL-to-N(0,1) regularizers (reference learning_dmpo.py:
    # 376-385: KL_weights = [intention, action])
    kl_to_prior_weight: float = 0.0        # action dist KL (KL_weights[1])
    intention_kl_weight: float = 0.0       # intention latent KL ([0])


def categorical_l2_project(z_p, probs, z_q):
    """Project (z_p, probs) onto uniform support z_q (C51 projection).

    z_p: (..., n) target atom positions; probs: (..., n); z_q: (m,).
    Returns (..., m) projected probabilities. One-hot matmul formulation
    (MXU-friendly for m=51).
    """
    vmin, vmax = z_q[0], z_q[-1]
    m = z_q.shape[0]
    dz = (vmax - vmin) / (m - 1)
    b = jnp.clip((jnp.clip(z_p, vmin, vmax) - vmin) / dz, 0.0, m - 1.0)
    lo = jnp.floor(b)
    frac = b - lo
    lo_idx = lo.astype(jnp.int32)
    hi_idx = jnp.minimum(lo_idx + 1, m - 1)
    onehot_lo = jax.nn.one_hot(lo_idx, m, dtype=probs.dtype)
    onehot_hi = jax.nn.one_hot(hi_idx, m, dtype=probs.dtype)
    w = (probs * (1.0 - frac))[..., None] * onehot_lo \
        + (probs * frac)[..., None] * onehot_hi
    return jnp.sum(w, axis=-2)


class DMPOLearner:
    """Holds network defs + config; all state flows through TrainState."""

    def __init__(self, policy, critic, action_size: int, obs_size: int,
                 cfg: DMPOConfig = DMPOConfig(),
                 intention_apply: Callable | None = None,
                 policy_tx_wrapper: Callable | None = None):
        """intention_apply: (params, obs) -> (action_dist, intention_dist)
        for the intention-latent KL regularizer. policy_tx_wrapper wraps
        the policy optimizer (e.g. freeze_decoder_tx for transfer mode,
        reference learning_dmpo.py:236-243)."""
        self.policy = policy
        self.critic = critic
        self.cfg = cfg
        self.action_size = action_size
        self.obs_size = obs_size
        self.intention_apply = intention_apply
        self.policy_tx_wrapper = policy_tx_wrapper
        self.policy_opt = optax.chain(
            optax.clip_by_global_norm(cfg.clip_global_norm),
            optax.adam(cfg.policy_lr))
        self.critic_opt = optax.chain(
            optax.clip_by_global_norm(cfg.clip_global_norm),
            optax.adam(cfg.critic_lr))
        self.dual_opt = optax.adam(cfg.dual_lr)

    def init(self, key) -> TrainState:
        kp, kc, kr = jax.random.split(key, 3)
        obs = jnp.zeros((1, self.obs_size))
        act = jnp.zeros((1, self.action_size))
        policy_params = self.policy.init(kp, obs)
        critic_params = self.critic.init(kc, obs, act)
        dual_params = losses_mpo.init_dual_params(self.action_size)
        if self.policy_tx_wrapper is not None:
            self.policy_opt = optax.chain(
                self.policy_tx_wrapper(policy_params), self.policy_opt)
        return TrainState(
            policy_params=policy_params, critic_params=critic_params,
            target_policy_params=jax.tree.map(jnp.copy, policy_params),
            target_critic_params=jax.tree.map(jnp.copy, critic_params),
            dual_params=dual_params,
            policy_opt_state=self.policy_opt.init(policy_params),
            critic_opt_state=self.critic_opt.init(critic_params),
            dual_opt_state=self.dual_opt.init(dual_params),
            steps=jnp.zeros((), jnp.int32), rng=kr)

    # ------------------------------------------------------------------
    def _critic_loss(self, critic_params, state: TrainState,
                     batch: Transition, key):
        cfg = self.cfg
        # target: N actions from target policy at next obs
        target_dist = self.policy.apply(state.target_policy_params,
                                        batch.next_obs)
        a_t = target_dist.sample(key, (cfg.num_samples,))  # (N, B, A)
        tiled_obs = jnp.broadcast_to(
            batch.next_obs, (cfg.num_samples,) + batch.next_obs.shape)
        zt = self.critic.apply(state.target_critic_params,
                               tiled_obs.reshape(-1, self.obs_size),
                               a_t.reshape(-1, self.action_size))
        logits = zt.logits.reshape(cfg.num_samples, -1, zt.logits.shape[-1])
        # average the N distributions (log-sum-exp, reference :312-334)
        target_logits = jax.nn.logsumexp(logits, axis=0) \
            - jnp.log(cfg.num_samples)
        values = zt.values  # (m,)
        z_p = (batch.reward[:, None]
               + batch.discount[:, None] * values[None, :])
        target_probs = jax.lax.stop_gradient(categorical_l2_project(
            z_p, jax.nn.softmax(target_logits, axis=-1), values))
        online = self.critic.apply(critic_params, batch.obs, batch.action)
        logq = jax.nn.log_softmax(online.logits, axis=-1)
        loss = -jnp.mean(jnp.sum(target_probs * logq, axis=-1))
        return loss, (online, target_dist, a_t)

    def _policy_loss(self, policy_params, dual_params, state: TrainState,
                     batch: Transition, a_t, q_values):
        cfg = self.cfg
        intention_dist = None
        if self.intention_apply is not None:
            online_dist, intention_dist = self.intention_apply(
                policy_params, batch.next_obs)
        else:
            online_dist = self.policy.apply(policy_params, batch.next_obs)
        target_dist = self.policy.apply(state.target_policy_params,
                                        batch.next_obs)
        loss, stats = losses_mpo.mpo_loss(
            cfg.mpo, dual_params, online_dist, target_dist, a_t, q_values)
        if cfg.kickstart_epsilon > 0 and cfg.teacher_apply is not None:
            teacher = cfg.teacher_apply(batch.next_obs)
            kl_ks = jnp.mean(jnp.sum(losses_mpo.kl_normal_diag_per_dim(
                teacher, online_dist), axis=-1))
            loss = loss + cfg.kickstart_epsilon * kl_ks
            stats["kickstart_kl"] = kl_ks
        if cfg.kl_to_prior_weight > 0:
            prior = NormalDiag(jnp.zeros_like(online_dist.mean),
                               jnp.ones_like(online_dist.stddev))
            kl_prior = jnp.mean(jnp.sum(losses_mpo.kl_normal_diag_per_dim(
                online_dist, prior), axis=-1))
            loss = loss + cfg.kl_to_prior_weight * kl_prior
            stats["kl_to_prior"] = kl_prior
        if cfg.intention_kl_weight > 0 and intention_dist is not None:
            # KL(intention || N(0,1)) on the latent (reference
            # learning_dmpo.py:377-385 KL_intention term)
            zprior = NormalDiag(jnp.zeros_like(intention_dist.mean),
                                jnp.ones_like(intention_dist.stddev))
            kl_int = jnp.mean(jnp.sum(losses_mpo.kl_normal_diag_per_dim(
                intention_dist, zprior), axis=-1))
            loss = loss + cfg.intention_kl_weight * kl_int
            stats["intention_kl"] = kl_int
        return loss, stats

    # ------------------------------------------------------------------
    def update(self, state: TrainState, batch: Transition):
        """One SGD step over the three parameter groups."""
        cfg = self.cfg
        rng, key = jax.random.split(state.rng)

        (critic_loss, (online_z, target_dist, a_t)), critic_grads = \
            jax.value_and_grad(self._critic_loss, has_aux=True)(
                state.critic_params, state, batch, key)

        # q values for MPO: mean of target-critic distribution on (o', a')
        tiled_obs = jnp.broadcast_to(
            batch.next_obs, (cfg.num_samples,) + batch.next_obs.shape)
        zt = self.critic.apply(state.target_critic_params,
                               tiled_obs.reshape(-1, self.obs_size),
                               a_t.reshape(-1, self.action_size))
        q_values = zt.mean().reshape(cfg.num_samples, -1)

        def ploss(policy_params, dual_params):
            return self._policy_loss(policy_params, dual_params, state,
                                     batch, a_t, q_values)

        (policy_loss, stats), (policy_grads, dual_grads) = \
            jax.value_and_grad(ploss, argnums=(0, 1), has_aux=True)(
                state.policy_params, state.dual_params)

        p_up, p_opt = self.policy_opt.update(policy_grads,
                                             state.policy_opt_state)
        policy_params = optax.apply_updates(state.policy_params, p_up)
        c_up, c_opt = self.critic_opt.update(critic_grads,
                                             state.critic_opt_state)
        critic_params = optax.apply_updates(state.critic_params, c_up)
        d_up, d_opt = self.dual_opt.update(dual_grads,
                                           state.dual_opt_state)
        dual_params = losses_mpo.clip_dual_params(
            optax.apply_updates(state.dual_params, d_up))

        steps = state.steps + 1
        copy_policy = (steps % cfg.target_policy_update_period) == 0
        copy_critic = (steps % cfg.target_critic_update_period) == 0
        target_policy = jax.tree.map(
            lambda t, o: jnp.where(copy_policy, o, t),
            state.target_policy_params, policy_params)
        target_critic = jax.tree.map(
            lambda t, o: jnp.where(copy_critic, o, t),
            state.target_critic_params, critic_params)

        stats = dict(stats)
        stats["critic_loss"] = critic_loss
        stats["policy_loss_total"] = policy_loss
        return TrainState(
            policy_params=policy_params, critic_params=critic_params,
            target_policy_params=target_policy,
            target_critic_params=target_critic,
            dual_params=dual_params,
            policy_opt_state=p_opt, critic_opt_state=c_opt,
            dual_opt_state=d_opt, steps=steps, rng=rng), stats
