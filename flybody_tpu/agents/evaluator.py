"""Evaluator: deterministic mean-policy rollouts + aggregate statistics.

Re-design of the reference evaluator role (reference
vnl_ray/agents/ray_distributed_dmpo.py:342-478: EnvironmentLoop with a
mean-policy head, avg/var/max/min aggregation over eval_average_over
episodes, and periodic snapshot-to-mp4 rendering). Here evaluation is one
vmapped jit rollout over a batch of eval episodes; videos render host-side
through the native rasterizer.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.agents.actors import canonical_to_real
from flybody_tpu.agents.networks import batch_concat


def make_evaluator(env, policy_apply, eval_average_over: int = 8):
    """Returns evaluate(params, rng) -> stats dict.

    Runs `eval_average_over` episodes in lockstep with the deterministic
    (mean) policy and aggregates return/length statistics.
    """
    lo, hi = env.action_spec()
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    n_steps = env.episode_steps

    def evaluate(params, rng):
        states = env.reset(jax.random.split(rng, eval_average_over))

        def one(carry, _):
            states, ret, length, alive = carry
            obs_flat = jax.vmap(batch_concat)(states.obs)
            dist = policy_apply(params, obs_flat)
            actions = canonical_to_real(dist.mode(), lo, hi)
            states = env.step(states, actions)
            ret = ret + jnp.where(alive, states.reward, 0.0)
            length = length + alive.astype(jnp.int32)
            alive = alive & ~states.done
            return (states, ret, length, alive), None

        ret0 = jnp.zeros(eval_average_over)
        len0 = jnp.zeros(eval_average_over, jnp.int32)
        alive0 = jnp.ones(eval_average_over, bool)
        (_, ret, length, _), _ = jax.lax.scan(
            one, (states, ret0, len0, alive0), None, length=n_steps)
        return {
            "eval_episode_return_mean": jnp.mean(ret),
            "eval_episode_return_var": jnp.var(ret),
            "eval_episode_return_max": jnp.max(ret),
            "eval_episode_return_min": jnp.min(ret),
            "eval_episode_length_mean": jnp.mean(length.astype(jnp.float32)),
        }

    return jax.jit(evaluate)


def render_eval_video(env, policy_apply, params, rng, n_steps: int = 200,
                      width: int = 320, height: int = 240):
    """Render a deterministic-policy rollout to frames (host-side,
    native rasterizer). Returns list of (H, W, 3) uint8 frames."""
    from flybody_tpu.utils.rendering import rollout_and_render

    lo, hi = env.action_spec()

    def policy_fn(obs):
        flat = batch_concat(obs, num_batch_dims=1)   # obs batched (B=1)
        dist = policy_apply(params, flat)
        a = np.asarray(dist.mode())
        return canonical_to_real(a, jnp.asarray(lo, jnp.float32),
                                 jnp.asarray(hi, jnp.float32))

    return rollout_and_render(env, policy_fn, rng, n_steps=n_steps,
                              width=width, height=height)


def save_video(frames, path: str, fps: int = 30):
    """Write frames to an mp4/gif (imageio if available, else npz)."""
    try:
        import imageio
        imageio.mimsave(path, frames, fps=fps)
    except Exception:
        np.savez_compressed(path + ".npz", frames=np.stack(frames))
