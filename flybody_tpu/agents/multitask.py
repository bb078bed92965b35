"""Multi-task (generalist) DMPO: K env families, one learner, one program.

TPU-native re-design of the reference's multi-task topology (reference
vnl_ray/train_dmpo_ray.py:328-400, 474-533 and
config/train_config_generalist.yaml): per-task actor pools become per-task
env BATCH SHARDS rolled out inside one SPMD program, per-task Reverb
servers become per-task on-device replay tables, and the learner's
round-robin over table iterators (reference learning_dmpo.py:425-427)
becomes a deterministic alternation over tables inside the update scan.

All tasks must share one action space (the reference trains one rodent
walker across its four RL tasks); observation layouts may differ — each
task's flattened observation vector is zero-padded to the union size, the
positional analog of the reference's SameObs observation normalization
(reference rodent_tasks_modified.py:31-39).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from flybody_tpu.agents import replay as rp
from flybody_tpu.agents.actors import init_rollout_tail, make_rollout_fn
from flybody_tpu.agents.dmpo import DMPOConfig, DMPOLearner, TrainState
from flybody_tpu.agents.networks import (DistributionalCritic,
                                         make_policy_critic, obs_layout)
from flybody_tpu.agents.train import DEFAULT_TASK_KEYS, TrainerConfig
from flybody_tpu.physics.types import pytree


@pytree(meta=())
class MultiTaskLoopState:
    train: TrainState
    env_states: dict      # task -> EnvState batch
    replays: dict         # task -> ReplayState
    rollout_tails: dict   # task -> tail pytree
    rng: jax.Array
    actor_steps: jax.Array


class MultiTaskDMPOTrainer:
    """K envs -> K replay tables -> one DMPO learner, fully fused.

    `envs`: {task_name: FlyEnv}; `num_envs`: {task_name: batch size}
    (the analog of the reference's `actors_envs` per-task actor counts).
    """

    def __init__(self, envs: Mapping[str, Any],
                 num_envs: Mapping[str, int],
                 cfg: TrainerConfig = TrainerConfig()):
        if not envs:
            raise ValueError("need at least one task env")
        self.names = tuple(sorted(envs))
        self.envs = dict(envs)
        self.num_envs = {k: int(num_envs[k]) for k in self.names}
        self.cfg = cfg

        sizes = {k: envs[k].action_size for k in self.names}
        if len(set(sizes.values())) != 1:
            raise ValueError(f"tasks must share an action space: {sizes}")
        self.action_size = next(iter(sizes.values()))

        # per-task obs layouts; network obs size = union (zero-padded).
        # Intention mode keeps the task-first concat ordering per task
        # (reference separate_observation), so the encoder's task prefix
        # lines up across tasks.
        task_keys = tuple(cfg.task_obs_keys) \
            if cfg.network == "intention" else ()
        self.obs_keys, self.obs_slices = {}, {}
        obs_sizes, task_obs_sizes = {}, {}
        for k in self.names:
            state0 = jax.eval_shape(
                envs[k].reset, jax.random.split(jax.random.PRNGKey(0), 1))
            keys, slices = obs_layout(state0.obs, task_keys)
            self.obs_keys[k], self.obs_slices[k] = keys, slices
            obs_sizes[k] = sum(slices[kk][1] for kk in keys)
            task_obs_sizes[k] = sum(slices[kk][1] for kk in keys
                                    if kk in set(task_keys))
        self.obs_size = max(obs_sizes.values())
        self.obs_sizes = obs_sizes

        intention_apply = None
        if cfg.network == "intention":
            if len(set(task_obs_sizes.values())) != 1:
                raise ValueError(
                    "intention multi-task needs one task-obs prefix size "
                    f"across tasks, got {task_obs_sizes}")
            from flybody_tpu.agents.intention_networks import (
                IntentionPolicy, freeze_decoder_tx)
            self.policy = IntentionPolicy(
                action_size=self.action_size,
                task_obs_size=next(iter(task_obs_sizes.values())),
                intention_size=cfg.intention_size,
                encoder_layers=tuple(cfg.encoder_layers),
                decoder_layers=tuple(cfg.decoder_layers),
                high_level_intention_size=cfg.high_level_intention_size)
            self.critic = DistributionalCritic(
                layer_sizes=tuple(cfg.critic_layers), vmin=cfg.vmin,
                vmax=cfg.vmax, num_atoms=cfg.num_atoms)
            intention_apply = (lambda p, o: self.policy.apply(
                p, o, method=self.policy.with_intention))
            tx_wrap = ((lambda params: freeze_decoder_tx(params))
                       if cfg.freeze_decoder else None)
            policy_apply = (lambda params, obs, key: self.policy.apply(
                params, obs, rngs={"sample": key}))
        else:
            self.policy, self.critic, _ = make_policy_critic(
                self.action_size, self.obs_size,
                policy_layers=tuple(cfg.policy_layers),
                critic_layers=tuple(cfg.critic_layers),
                vmin=cfg.vmin, vmax=cfg.vmax, num_atoms=cfg.num_atoms)
            tx_wrap = None
            policy_apply = (lambda params, obs, key: self.policy.apply(
                params, obs))
        self.learner = DMPOLearner(self.policy, self.critic,
                                   self.action_size, self.obs_size,
                                   cfg.dmpo,
                                   intention_apply=intention_apply,
                                   policy_tx_wrapper=tx_wrap)

        cfg.rollout.unroll_length = cfg.unroll_length
        cfg.rollout.n_step = cfg.dmpo.n_step
        cfg.rollout.discount = cfg.dmpo.discount
        self.rollout_fns = {
            k: make_rollout_fn(envs[k], policy_apply, cfg.rollout,
                               obs_keys=self.obs_keys[k],
                               obs_pad=self.obs_size - obs_sizes[k],
                               action_delay=cfg.action_delay)
            for k in self.names}

        # per-table update counts from samples_per_insert (reference rate
        # limiter semantics made deterministic, SURVEY.md §5.8); the
        # learner alternates tables round-robin so each table contributes
        # one batch per scan iteration (reference learning_dmpo.py:425).
        inserted = {k: self.num_envs[k] * cfg.unroll_length
                    for k in self.names}
        per_table = max(1, int(min(inserted.values())
                               * cfg.samples_per_insert
                               // cfg.dmpo.batch_size))
        self.updates_per_table = per_table

    # ------------------------------------------------------------------
    def load_teacher(self, teacher_params, epsilon: float):
        """Kickstarting (reference learning_dmpo.py:361-373)."""
        teacher_apply = lambda obs: self.policy.apply(teacher_params, obs)
        self.learner.cfg = dataclasses.replace(
            self.cfg.dmpo, kickstart_epsilon=epsilon,
            teacher_apply=teacher_apply)

    def restore_decoder(self, train: TrainState, decoder_source_params):
        """Transfer: graft donor decoder params (reference
        learning_dmpo.py:236-243); same semantics as the single-task
        trainer."""
        from flybody_tpu.agents.train import DMPOTrainer
        return DMPOTrainer.restore_decoder(self, train,
                                           decoder_source_params)

    def _example_transition(self):
        from flybody_tpu.agents.dmpo import Transition
        return Transition(
            obs=jnp.zeros((1, self.obs_size)),
            action=jnp.zeros((1, self.action_size)),
            reward=jnp.zeros((1,)), discount=jnp.zeros((1,)),
            next_obs=jnp.zeros((1, self.obs_size)))

    def init(self, rng) -> MultiTaskLoopState:
        k_learn, k_loop, *k_envs = jax.random.split(
            rng, 2 + len(self.names))
        train = self.learner.init(k_learn)
        example = self._example_transition()
        cap = self.cfg.replay_capacity // len(self.names)
        env_states, replays, tails = {}, {}, {}
        for k, ke in zip(self.names, k_envs):
            env_states[k] = self.envs[k].reset(
                jax.random.split(ke, self.num_envs[k]))
            replays[k] = rp.replay_init(cap, example)
            tails[k] = init_rollout_tail(
                self.cfg.rollout, self.num_envs[k], self.obs_size,
                self.action_size)
        return MultiTaskLoopState(
            train=train, env_states=env_states, replays=replays,
            rollout_tails=tails, rng=k_loop,
            actor_steps=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def train_iteration(self, loop: MultiTaskLoopState):
        cfg = self.cfg
        rng = loop.rng
        env_states, tails, replays, metrics = {}, {}, {}, {}
        for k in self.names:
            rng, k_roll = jax.random.split(rng)
            es, tail, transitions, am = self.rollout_fns[k](
                loop.train.policy_params, loop.env_states[k],
                loop.rollout_tails[k], k_roll)
            env_states[k], tails[k] = es, tail
            replays[k] = rp.replay_insert(loop.replays[k], transitions)
            for mk, mv in am.items():
                metrics[f"{k}/{mk}"] = mv

        def do_update(carry, _):
            train, rng_ = carry
            stats = None
            # round-robin: one batch from each table per scan iteration
            for k in self.names:
                rng_, key = jax.random.split(rng_)
                batch = rp.replay_sample(replays[k], key,
                                         cfg.dmpo.batch_size)
                train, stats = self.learner.update(train, batch)
            return (train, rng_), stats

        can_train = jnp.all(jnp.stack(
            [replays[k].size >= cfg.min_replay_size // len(self.names)
             for k in self.names]))

        def trained(train_rng):
            return jax.lax.scan(do_update, train_rng, None,
                                length=self.updates_per_table)

        def skipped(train_rng):
            _, stats_shape = jax.eval_shape(
                lambda tr: do_update(tr, None), train_rng)
            stats = jax.tree.map(
                lambda s: jnp.zeros((self.updates_per_table,) + s.shape,
                                    s.dtype), stats_shape)
            return train_rng, stats

        (train, rng), learn_stats = jax.lax.cond(
            can_train, trained, skipped, (loop.train, rng))

        actor_steps = loop.actor_steps + sum(
            self.num_envs[k] * cfg.unroll_length for k in self.names)
        metrics.update(
            {k: jnp.mean(v) for k, v in learn_stats.items()})
        metrics["actor_steps"] = actor_steps
        metrics["learner_steps"] = train.steps
        metrics["mean_episode_return"] = jnp.mean(jnp.stack(
            [metrics[f"{k}/mean_episode_return"] for k in self.names]))
        metrics["mean_reward"] = jnp.mean(jnp.stack(
            [metrics[f"{k}/mean_reward"] for k in self.names]))
        return MultiTaskLoopState(
            train=train, env_states=env_states, replays=replays,
            rollout_tails=tails, rng=rng, actor_steps=actor_steps), metrics


def multitask_shardings(mesh, loop_state: MultiTaskLoopState,
                        axis: str = "env"):
    """Sharding pytree: per-task envs + replay shards over the mesh 'env'
    axis, train state replicated (same layout as train.loop_shardings)."""
    import dataclasses as dc

    from jax.sharding import NamedSharding, PartitionSpec as P

    from flybody_tpu.parallel.mesh import (_replicate, _shard_env_states,
                                           _shard_leading)

    def tail_sharding(tail):
        return jax.tree.map(
            lambda x: NamedSharding(
                mesh, P(None, axis, *((None,) * (x.ndim - 2))))
            if hasattr(x, "ndim") and x.ndim >= 2
            else NamedSharding(mesh, P()), tail)

    return MultiTaskLoopState(
        train=_replicate(mesh, loop_state.train),
        env_states={k: _shard_env_states(mesh, v, axis)
                    for k, v in loop_state.env_states.items()},
        replays={k: dc.replace(
            _replicate(mesh, v),
            storage=_shard_leading(mesh, v.storage, axis))
            for k, v in loop_state.replays.items()},
        rollout_tails={k: tail_sharding(v)
                       for k, v in loop_state.rollout_tails.items()},
        rng=NamedSharding(mesh, P()),
        actor_steps=NamedSharding(mesh, P()))
