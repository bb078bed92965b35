"""Fused actor-learner training: the whole DMPO loop as one jit program.

Replaces the reference's Ray topology (N CPU actor processes + Reverb
servers + 1 GPU learner, reference train_dmpo_ray.py / SURVEY.md §3.3)
with a single SPMD program: batched rollout -> device replay insert ->
K learner updates, repeated. Rate limiting (samples_per_insert) becomes a
deterministic updates-per-rollout count.

Multi-chip: shard envs + replay over the mesh 'env' axis with params
replicated; XLA inserts the gradient allreduce. See flybody_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flybody_tpu.agents import replay as rp
from flybody_tpu.agents.actors import RolloutConfig, make_rollout_fn
from flybody_tpu.agents.dmpo import DMPOConfig, DMPOLearner, TrainState
from flybody_tpu.agents.networks import batch_concat, make_policy_critic
from flybody_tpu.physics.types import pytree


@pytree(meta=())
class LoopState:
    train: TrainState
    env_states: Any
    replay: rp.ReplayState
    rng: jax.Array
    actor_steps: jax.Array


@dataclasses.dataclass
class TrainerConfig:
    num_envs: int = 64
    unroll_length: int = 20
    replay_capacity: int = 100_000
    min_replay_size: int = 1_000
    samples_per_insert: float = 32.0
    dmpo: DMPOConfig = dataclasses.field(default_factory=DMPOConfig)
    rollout: RolloutConfig = dataclasses.field(default_factory=RolloutConfig)


class DMPOTrainer:
    """Builds the fused train step for a FlyEnv."""

    def __init__(self, env, cfg: TrainerConfig = TrainerConfig()):
        self.env = env
        self.cfg = cfg
        # infer obs size from a concrete reset
        state0 = jax.eval_shape(
            env.reset, jax.random.split(jax.random.PRNGKey(0), 1))
        obs_size = int(sum(int(jnp.prod(jnp.asarray(x.shape or (1,))))
                           for x in jax.tree.leaves(state0.obs)))
        self.obs_size = obs_size
        self.action_size = env.action_size
        self.policy, self.critic, _ = make_policy_critic(
            self.action_size, obs_size)
        self.learner = DMPOLearner(self.policy, self.critic,
                                   self.action_size, obs_size, cfg.dmpo)
        cfg.rollout.unroll_length = cfg.unroll_length
        cfg.rollout.n_step = cfg.dmpo.n_step
        cfg.rollout.discount = cfg.dmpo.discount
        self.rollout_fn = make_rollout_fn(env, self.policy.apply,
                                          cfg.rollout)
        windows = cfg.unroll_length - cfg.dmpo.n_step + 1
        inserted = cfg.num_envs * windows
        # samples_per_insert semantics: every inserted transition is sampled
        # ~samples_per_insert times => updates = inserted * spi / batch.
        self.updates_per_iter = max(
            1, int(inserted * cfg.samples_per_insert // cfg.dmpo.batch_size))

    def init(self, rng) -> LoopState:
        k_learn, k_env, k_loop = jax.random.split(rng, 3)
        train = self.learner.init(k_learn)
        env_states = self.env.reset(
            jax.random.split(k_env, self.cfg.num_envs))
        example = self._example_transition()
        replay = rp.replay_init(self.cfg.replay_capacity, example)
        return LoopState(train=train, env_states=env_states, replay=replay,
                         rng=k_loop,
                         actor_steps=jnp.zeros((), jnp.int64)
                         if jax.config.read("jax_enable_x64")
                         else jnp.zeros((), jnp.int32))

    def _example_transition(self):
        from flybody_tpu.agents.dmpo import Transition
        return Transition(
            obs=jnp.zeros((1, self.obs_size)),
            action=jnp.zeros((1, self.action_size)),
            reward=jnp.zeros((1,)), discount=jnp.zeros((1,)),
            next_obs=jnp.zeros((1, self.obs_size)))

    def train_iteration(self, loop: LoopState):
        """rollout -> insert -> updates. Pure; jit/pjit this."""
        cfg = self.cfg
        rng, k_roll = jax.random.split(loop.rng)
        env_states, transitions, actor_metrics = self.rollout_fn(
            loop.train.policy_params, loop.env_states, k_roll)
        replay = rp.replay_insert(loop.replay, transitions)

        def do_update(carry, _):
            train, rng = carry
            rng, k = jax.random.split(rng)
            batch = rp.replay_sample(replay, k, cfg.dmpo.batch_size)
            train, stats = self.learner.update(train, batch)
            return (train, rng), stats

        can_train = replay.size >= cfg.min_replay_size

        def trained(train_rng):
            (train, rng_), stats = jax.lax.scan(
                do_update, train_rng, None, length=self.updates_per_iter)
            return (train, rng_), stats

        def skipped(train_rng):
            # same-structure stats with zeros
            _, stats_shape = jax.eval_shape(
                lambda tr: do_update(tr, None), train_rng)
            stats = jax.tree.map(
                lambda s: jnp.zeros((self.updates_per_iter,) + s.shape,
                                    s.dtype), stats_shape)
            return train_rng, stats

        (train, rng), learn_stats = jax.lax.cond(
            can_train, trained, skipped, (loop.train, rng))

        actor_steps = loop.actor_steps + cfg.num_envs * cfg.unroll_length
        metrics = {**actor_metrics,
                   **{k: jnp.mean(v) for k, v in learn_stats.items()},
                   "replay_size": replay.size,
                   "actor_steps": actor_steps,
                   "learner_steps": train.steps}
        return LoopState(train=train, env_states=env_states, replay=replay,
                         rng=rng, actor_steps=actor_steps), metrics
