"""Batched on-device actor: policy rollout + n-step transition assembly.

Replaces the reference's process-parallel CPU actors + Reverb
NStepTransitionAdder (reference vnl_ray/agents/actors.py + acme adders)
with a single scanned rollout over lockstep envs: policy forward, physics
step, auto-reset masking, and n-step reward/bootstrap assembly — all
inside one jit program (SURVEY.md §7 design delta 3).

N-step semantics match acme's adder: windows truncate at episode
boundaries; termination zeroes the bootstrap via the env discount, while
time-limit truncation bootstraps from the boundary observation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from flybody_tpu.agents.dmpo import Transition
from flybody_tpu.agents.networks import batch_concat


def canonical_to_real(action, lo, hi):
    """Map canonical [-1, 1] actions to env bounds (acme
    CanonicalSpecWrapper with clip=True)."""
    a = jnp.clip(action, -1.0, 1.0)
    return lo + (a + 1.0) * 0.5 * (hi - lo)


@dataclasses.dataclass
class RolloutConfig:
    unroll_length: int = 40     # control steps per rollout chunk
    n_step: int = 5
    discount: float = 0.99


def init_rollout_tail(cfg: RolloutConfig, n_env: int, obs_size: int,
                      action_size: int):
    """Inert (n-1)-step tail seeding the first chunk: done=True at every
    slot, so no window can extend past a tail step. (The few zero-obs
    transitions that start in the seed tail carry reward 0 / discount 0 —
    one-time, inert for learning.)"""
    n = cfg.n_step - 1
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return dict(obs=z(n, n_env, obs_size), action=z(n, n_env, action_size),
                reward=z(n, n_env), discount=z(n, n_env),
                done=jnp.ones((n, n_env), bool),
                obs_after=z(n, n_env, obs_size),
                episode_return=z(n, n_env))


def make_rollout_fn(env, policy_apply, cfg: RolloutConfig,
                    stochastic: bool = True, action_delay: int = 0,
                    obs_keys=None, obs_pad: int = 0):
    """Returns rollout(params, env_states, tail, rng) ->
    (new_env_states, new_tail, Transition batch (flattened windows),
    metrics).

    `env_states` is a vmapped batch of EnvState. `policy_apply(params, obs,
    key)` may use `key` for latent sampling (intention nets). `tail` is the
    previous chunk's trailing n-1 steps, prepended so every control step
    starts exactly one n-step window (acme's adder streams across chunk
    boundaries; without the tail the last n-1 steps of every chunk never
    start a transition). `action_delay` emulates the reference's
    DelayedFeedForwardActor queue (reference agents/actors.py:79).
    `obs_keys` fixes the flattening order (task-first for intention nets).
    """
    lo, hi = env.action_spec()
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)

    def concat(obs):
        x = batch_concat(obs, keys=obs_keys)
        if obs_pad:
            # zero-pad to the multi-task union obs size (positional
            # analog of the reference SameObs normalization,
            # rodent_tasks_modified.py:31-39)
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (obs_pad,), x.dtype)],
                axis=-1)
        return x

    def rollout(params, env_states, tail, rng):
        def one(carry, _):
            states, rng_, delay_buf = carry
            rng_, k_act, k_lat = jax.random.split(rng_, 3)
            obs_flat = jax.vmap(concat)(states.obs)
            dist = policy_apply(params, obs_flat, k_lat)
            canonical = dist.sample(k_act) if stochastic else dist.mode()
            if action_delay > 0:
                # fixed action-delay queue (reference DelayedFeedForward
                # Actor, agents/actors.py:79-86)
                delayed = delay_buf[0]
                delay_buf = jnp.concatenate(
                    [delay_buf[1:], canonical[None]], axis=0)
                canonical = delayed
            actions = canonical_to_real(canonical, lo, hi)
            stepped = env.step(states, actions)
            obs_after = jax.vmap(concat)(stepped.obs)
            next_states = env.apply_autoreset(stepped)
            # per-key obs maxima split live vs terminal: identifies WHICH
            # observable saturates the env clamp and shows clamp hits are
            # terminal-state readings (TRAINING.md obs_absmax analysis)
            done_b = stepped.done
            key_max = {}
            for k, v in stepped.obs.items():
                a = jnp.abs(v).reshape(v.shape[0], -1)
                mx = jnp.max(a, axis=1) if a.shape[1] else jnp.zeros(
                    a.shape[0], a.dtype)
                key_max[k] = (
                    jnp.max(jnp.where(done_b, 0.0, mx)),
                    jnp.max(jnp.where(done_b, mx, 0.0)))
            out = dict(obs=obs_flat, action=canonical,
                       reward=stepped.reward, discount=stepped.discount,
                       done=stepped.done, obs_after=obs_after,
                       episode_return=stepped.metrics["episode_return"],
                       obs_key_max=key_max)
            return (next_states, rng_, delay_buf), out

        n_env = jax.tree.leaves(env_states.obs)[0].shape[0]
        delay_buf0 = jnp.zeros((max(action_delay, 1), n_env,
                                lo.shape[0]), jnp.float32)
        (env_states, rng, _), traj = jax.lax.scan(
            one, (env_states, rng, delay_buf0), None,
            length=cfg.unroll_length)
        # diagnostics-only leaf: keep it out of the n-step tail pytree
        # (the carried tail template has transition keys only)
        obs_key_max = traj.pop("obs_key_max")
        if cfg.n_step > 1 and tail is not None:
            full = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), tail, traj)
            new_tail = jax.tree.map(lambda x: x[-(cfg.n_step - 1):], traj)
        else:
            full, new_tail = traj, tail
        transitions = nstep_from_trajectory(full, cfg)
        metrics = {
            "mean_reward": jnp.mean(traj["reward"]),
            "obs_absmax": jnp.max(jnp.abs(traj["obs"])),
            "episodes_done": jnp.sum(traj["done"]),
            "mean_episode_return": (
                jnp.sum(jnp.where(traj["done"], traj["episode_return"], 0.0))
                / jnp.maximum(jnp.sum(traj["done"]), 1.0)),
        }
        for k, (live, term) in obs_key_max.items():
            metrics[f"obs_max/{k}"] = jnp.max(live)
            metrics[f"obs_max_terminal/{k}"] = jnp.max(term)
        return env_states, new_tail, transitions, metrics

    return rollout


def nstep_from_trajectory(traj: dict, cfg: RolloutConfig) -> Transition:
    """Assemble overlapping n-step transitions from a (T, B, ...) rollout.

    Windows truncate at the first done inside the window; bootstrap obs is
    the post-step observation at the truncation point.
    """
    n = cfg.n_step
    gamma = cfg.discount
    T = traj["reward"].shape[0]
    n_windows = T - n + 1
    sl = lambda x, k: x[k:k + n_windows]

    acc_r = sl(traj["reward"], 0)
    acc_d = gamma * sl(traj["discount"], 0)
    nxt = sl(traj["obs_after"], 0)
    ended = sl(traj["done"], 0)
    for k in range(1, n):
        take = jnp.logical_not(ended)
        acc_r = acc_r + jnp.where(take, acc_d * sl(traj["reward"], k), 0.0)
        nxt = jnp.where(take[..., None], sl(traj["obs_after"], k), nxt)
        acc_d = jnp.where(take, acc_d * gamma * sl(traj["discount"], k),
                          acc_d)
        ended = jnp.logical_or(ended, sl(traj["done"], k))

    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return Transition(
        obs=flat(sl(traj["obs"], 0)),
        action=flat(sl(traj["action"], 0)),
        reward=flat(acc_r), discount=flat(acc_d), next_obs=flat(nxt))
