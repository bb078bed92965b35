"""Fused actor-learner training: the whole DMPO loop as one jit program.

Replaces the reference's Ray topology (N CPU actor processes + Reverb
servers + 1 GPU learner, reference train_dmpo_ray.py / SURVEY.md §3.3)
with a single SPMD program: batched rollout -> device replay insert ->
K learner updates, repeated. Rate limiting (samples_per_insert) becomes a
deterministic updates-per-rollout count.

Network modes mirror the reference factory switch (reference
train_dmpo_ray.py + intention_network_factory.py + vis_net.py):
  * "plain": MLP policy + distributional critic
  * "intention": encoder-decoder policy with task-first obs ordering,
    sampled intention latent, optional latent KL regularizer, and a
    decoder that can be restored + frozen for transfer
  * "vision": eye pixels routed through a conv net in both policy/critic

Kickstarting loads a teacher policy and distills via KL (reference
learning_dmpo.py:361-373).

Multi-chip: shard envs + replay over the mesh 'env' axis with params
replicated; XLA inserts the gradient allreduce. See flybody_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from flybody_tpu.agents import replay as rp
from flybody_tpu.agents.actors import (RolloutConfig, init_rollout_tail,
                                       make_rollout_fn)
from flybody_tpu.agents.dmpo import DMPOConfig, DMPOLearner, TrainState
from flybody_tpu.agents.networks import (DistributionalCritic, VisionCritic,
                                         VisionPolicy, make_policy_critic,
                                         obs_layout)
from flybody_tpu.physics.types import pytree

# default task-observation keys for intention-policy obs routing
# (reference train_dmpo_ray.py separate_observation task prefixes)
DEFAULT_TASK_KEYS = (
    "ref_displacement", "ref_root_quat", "ref_rel_joints",
    "ref_rel_bodies_pos_local", "ref_rel_root_quat",
    "ref_ego_bodies_quats", "ref_appendages_pos", "task_input",
    "task_logic", "origin", "clip_id",
)

EYE_KEYS = ("left_eye", "right_eye")


@pytree(meta=())
class LoopState:
    train: TrainState
    env_states: Any
    replay: rp.ReplayState
    rng: jax.Array
    actor_steps: jax.Array
    rollout_tail: Any


@dataclasses.dataclass
class TrainerConfig:
    num_envs: int = 64
    unroll_length: int = 20
    replay_capacity: int = 100_000
    min_replay_size: int = 1_000
    samples_per_insert: float = 32.0
    dmpo: DMPOConfig = dataclasses.field(default_factory=DMPOConfig)
    rollout: RolloutConfig = dataclasses.field(default_factory=RolloutConfig)
    # network mode: "plain" | "intention" | "vision"
    network: str = "plain"
    task_obs_keys: Sequence[str] = DEFAULT_TASK_KEYS
    intention_size: int = 60
    high_level_intention_size: int | None = None
    # network shapes (reference network_factory.py:89-113 defaults)
    policy_layers: Sequence[int] = (256, 256, 256)
    critic_layers: Sequence[int] = (512, 512, 256)
    encoder_layers: Sequence[int] = (512, 512)
    decoder_layers: Sequence[int] = (512, 512, 512)
    vmin: float = -150.0
    vmax: float = 150.0
    num_atoms: int = 51
    # transfer: freeze the decoder (restore separately via checkpoint)
    freeze_decoder: bool = False
    action_delay: int = 0


class DMPOTrainer:
    """Builds the fused train step for a FlyEnv."""

    def __init__(self, env, cfg: TrainerConfig = TrainerConfig()):
        self.env = env
        self.cfg = cfg
        # infer obs layout from a concrete reset
        state0 = jax.eval_shape(
            env.reset, jax.random.split(jax.random.PRNGKey(0), 1))
        task_keys = tuple(cfg.task_obs_keys) if cfg.network == "intention" \
            else ()
        self.obs_keys, self.obs_slices = obs_layout(state0.obs, task_keys)
        obs_size = sum(self.obs_slices[k][1] for k in self.obs_keys)
        self.obs_size = obs_size
        self.action_size = env.action_size
        self.task_obs_size = sum(self.obs_slices[k][1] for k in self.obs_keys
                                 if k in set(task_keys))
        if cfg.network == "intention" and self.task_obs_size == 0:
            # no task observations in this env: the encoder consumes the
            # full observation (pure bottleneck autoencoding policy)
            import warnings
            warnings.warn("intention network: no task_obs_keys present in "
                          "this env's observations; encoder sees all obs")
            self.task_obs_size = obs_size

        intention_apply = None
        if cfg.network == "intention":
            from flybody_tpu.agents.intention_networks import (
                IntentionPolicy, freeze_decoder_tx)
            self.policy = IntentionPolicy(
                action_size=self.action_size,
                task_obs_size=self.task_obs_size,
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
        elif cfg.network == "vision":
            # fly: stereo eyes -> VisNetFly; rodent: single egocentric
            # camera -> VisNetRodent (reference vis_net.py:30-109/112-202)
            eye_slices = tuple(self.obs_slices[k] for k in EYE_KEYS
                               if k in self.obs_slices)
            if len(eye_slices) != 2:
                if "egocentric_camera" in self.obs_slices:
                    eye_slices = (self.obs_slices["egocentric_camera"],)
                else:
                    raise ValueError(
                        f"vision network needs {EYE_KEYS} or an "
                        f"egocentric_camera observation; env has "
                        f"{sorted(self.obs_slices)}")
            self.policy = VisionPolicy(action_size=self.action_size,
                                       eye_slices=eye_slices)
            self.critic = VisionCritic(eye_slices=eye_slices)
            tx_wrap = None
        else:
            self.policy, self.critic, _ = make_policy_critic(
                self.action_size, obs_size,
                policy_layers=tuple(cfg.policy_layers),
                critic_layers=tuple(cfg.critic_layers),
                vmin=cfg.vmin, vmax=cfg.vmax, num_atoms=cfg.num_atoms)
            tx_wrap = None

        self.learner = DMPOLearner(self.policy, self.critic,
                                   self.action_size, obs_size, cfg.dmpo,
                                   intention_apply=intention_apply,
                                   policy_tx_wrapper=tx_wrap)
        cfg.rollout.unroll_length = cfg.unroll_length
        cfg.rollout.n_step = cfg.dmpo.n_step
        cfg.rollout.discount = cfg.dmpo.discount

        if cfg.network == "intention":
            policy_apply = (lambda params, obs, key: self.policy.apply(
                params, obs, rngs={"sample": key}))
        else:
            policy_apply = (lambda params, obs, key:
                            self.policy.apply(params, obs))
        self.rollout_fn = make_rollout_fn(
            env, policy_apply, cfg.rollout, obs_keys=self.obs_keys,
            action_delay=cfg.action_delay)
        # with the cross-chunk tail every control step starts one n-step
        # window: inserted = num_envs * unroll_length
        inserted = cfg.num_envs * cfg.unroll_length
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
        tail = init_rollout_tail(self.cfg.rollout, self.cfg.num_envs,
                                 self.obs_size, self.action_size)
        return LoopState(train=train, env_states=env_states, replay=replay,
                         rng=k_loop,
                         actor_steps=jnp.zeros((), jnp.int64)
                         if jax.config.read("jax_enable_x64")
                         else jnp.zeros((), jnp.int32),
                         rollout_tail=tail)

    def _example_transition(self):
        from flybody_tpu.agents.dmpo import Transition
        return Transition(
            obs=jnp.zeros((1, self.obs_size)),
            action=jnp.zeros((1, self.action_size)),
            reward=jnp.zeros((1,)), discount=jnp.zeros((1,)),
            next_obs=jnp.zeros((1, self.obs_size)))

    def load_teacher(self, teacher_params, epsilon: float):
        """Enable kickstarting: distill from a frozen teacher policy
        (reference learning_dmpo.py:361-373). Call before jitting."""
        cfg = self.cfg.dmpo
        teacher_apply = lambda obs: self.policy.apply(teacher_params, obs)
        self.learner.cfg = dataclasses.replace(
            cfg, kickstart_epsilon=epsilon, teacher_apply=teacher_apply)

    def restore_decoder(self, train: TrainState, decoder_source_params):
        """Transfer mode: copy decoder params from a donor policy into the
        train state (online + target), typically combined with
        cfg.freeze_decoder=True (reference learning_dmpo.py:236-243)."""
        import flax

        def graft(dst, src):
            dflat = flax.traverse_util.flatten_dict(dst)
            sflat = flax.traverse_util.flatten_dict(src)
            for k, v in sflat.items():
                if "decoder" in "/".join(map(str, k)) and k in dflat:
                    dflat[k] = v
            return flax.traverse_util.unflatten_dict(dflat)

        return train.replace(
            policy_params=graft(train.policy_params, decoder_source_params),
            target_policy_params=graft(train.target_policy_params,
                                       decoder_source_params))

    def train_iteration(self, loop: LoopState):
        """rollout -> insert -> updates. Pure; jit/pjit this."""
        cfg = self.cfg
        rng, k_roll = jax.random.split(loop.rng)
        env_states, tail, transitions, actor_metrics = self.rollout_fn(
            loop.train.policy_params, loop.env_states, loop.rollout_tail,
            k_roll)
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
                         rng=rng, actor_steps=actor_steps,
                         rollout_tail=tail), metrics
