"""Hierarchical intention (encoder-decoder) policy networks.

Flax re-design of the reference intention policy (reference
vnl_ray/agents/intention_network_base.py:8-169 +
intention_network_factory.py:17-76): observations split into a task prefix
and an egocentric suffix; a stochastic encoder maps task features to a
latent "intention" (optionally through a two-level high-level/mid-level
stack), and a decoder maps [intention, egocentric obs] to the action
distribution with a fixed-scale Gaussian head. Used for skill reuse /
transfer: the decoder can be restored and frozen while new encoders are
trained (reference learning_dmpo.py:236-243).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from flybody_tpu.agents.distributions import NormalDiag
from flybody_tpu.agents.networks import LayerNormMLP, NormalDiagHead


def separate_observation(obs: dict, task_keys: Sequence[str]):
    """Concatenate [task obs || egocentric obs] (reference
    vnl_ray/agents/utils_intention.py:8-56: task-obs-first ordering,
    alphabetical within each group)."""
    task = [k for k in sorted(obs) if k in task_keys]
    ego = [k for k in sorted(obs) if k not in task_keys]
    flat = lambda k: obs[k].reshape(obs[k].shape[:-1] + (-1,)) \
        if obs[k].ndim > 1 else obs[k]
    parts = [flat(k) for k in task + ego]
    task_size = sum(p.shape[-1] for p in (flat(k) for k in task))
    return jnp.concatenate(parts, axis=-1), task_size


class Encoder(nn.Module):
    """Stochastic intention encoder (optionally two-level)."""
    intention_size: int = 60
    layer_sizes: Sequence[int] = (512, 512)
    high_level_intention_size: int | None = None  # e.g. 45 for 2-level
    min_scale: float = 1e-4

    def _maybe_sample(self, dist):
        """Sample when a 'sample' rng stream is provided (actors), else the
        mean (analytic learner paths). The reference always samples
        (intention_network_base.py:160-166, TF implicit seeds)."""
        if self.has_rng("sample"):
            return dist.sample(self.make_rng("sample"))
        return dist.mean

    @nn.compact
    def __call__(self, task_obs):
        x = task_obs
        if self.high_level_intention_size is not None:
            x = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
            hl = NormalDiagHead(self.high_level_intention_size,
                                min_scale=self.min_scale)(x)
            x = self._maybe_sample(hl)  # mid encoder consumes the hl latent
            x = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
        else:
            x = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
        return NormalDiagHead(self.intention_size,
                              min_scale=self.min_scale)(x)


class Decoder(nn.Module):
    """Deterministic-trunk decoder with fixed-scale Gaussian head
    (reference intention_network_base.py:8-48)."""
    action_size: int
    layer_sizes: Sequence[int] = (512, 512, 512)
    action_stddev: float = 0.1

    @nn.compact
    def __call__(self, z_and_ego):
        x = LayerNormMLP(self.layer_sizes, activate_final=True)(z_and_ego)
        mean = nn.Dense(self.action_size,
                        kernel_init=nn.initializers.variance_scaling(
                            1e-4, "fan_in", "truncated_normal"))(x)
        scale = jnp.full_like(mean, self.action_stddev)
        return NormalDiag(mean=mean, stddev=scale)


class IntentionPolicy(nn.Module):
    """Full encoder-decoder policy over a flat [task || ego] observation.

    The action distribution's stochasticity comes from sampling the
    intention latent; the decoder head has fixed stddev. For MPO we expose
    the induced action distribution conditioned on the MEAN intention plus
    the decoder's fixed scale (reference uses the same construction for
    its stochastic sampling heads).
    """
    action_size: int
    task_obs_size: int
    intention_size: int = 60
    encoder_layers: Sequence[int] = (512, 512)
    decoder_layers: Sequence[int] = (512, 512, 512)
    high_level_intention_size: int | None = None
    action_stddev: float = 0.1

    def setup(self):
        self.encoder = Encoder(
            intention_size=self.intention_size,
            layer_sizes=self.encoder_layers,
            high_level_intention_size=self.high_level_intention_size)
        self.decoder = Decoder(action_size=self.action_size,
                               layer_sizes=self.decoder_layers,
                               action_stddev=self.action_stddev)

    def __call__(self, obs_flat):
        dist, _ = self.with_intention(obs_flat)
        return dist

    def with_intention(self, obs_flat):
        """-> (action_dist, intention_dist). The intention latent is
        sampled when a 'sample' rng is passed to apply (actor path),
        otherwise the mean is decoded (analytic MPO losses)."""
        task_obs = obs_flat[..., :self.task_obs_size]
        ego_obs = obs_flat[..., self.task_obs_size:]
        intention = self.encoder(task_obs)
        if self.has_rng("sample"):
            z = intention.sample(self.make_rng("sample"))
        else:
            z = intention.mean
        return self.decoder(jnp.concatenate([z, ego_obs], axis=-1)), \
            intention


def decoder_param_filter(params) -> dict:
    """Partition params into (decoder, rest) for decoder-only restore and
    freeze (reference transfer mode, train_config_bowl_transfer.yaml)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    dec = {k: v for k, v in flat.items() if "decoder" in "/".join(map(str, k))}
    rest = {k: v for k, v in flat.items() if k not in dec}
    return (flax.traverse_util.unflatten_dict(dec),
            flax.traverse_util.unflatten_dict(rest))


def freeze_decoder_tx(params):
    """Optax transform: zero decoder grads (decoder frozen for transfer)."""
    import optax

    def label(params):
        import flax
        flat = flax.traverse_util.flatten_dict(params)
        return flax.traverse_util.unflatten_dict({
            k: ("frozen" if "decoder" in "/".join(map(str, k))
                else "trainable") for k in flat})

    return optax.multi_transform(
        {"trainable": optax.identity(), "frozen": optax.set_to_zero()},
        label)
