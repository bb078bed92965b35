"""DMPO networks (policy, distributional critic, observation nets).

Flax re-design of the reference network factory (reference
vnl_ray/agents/network_factory.py:89-121):

* policy: batch-concat obs -> LayerNormMLP(256,256,256) ->
  MultivariateNormalDiag head (init_scale 0.7, min_scale 1e-6)
* critic: CriticMultiplexer(clip action to spec) -> LayerNormMLP(512,512,256)
  -> DiscreteValuedHead(vmin=-150, vmax=150, 51 atoms)

All modules run in bfloat16-friendly shapes; observation dicts are
flattened by sorted key (matching acme's batch_concat ordering).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flybody_tpu.agents.distributions import DiscreteValued, NormalDiag


def batch_concat(obs: dict, keys: Sequence[str] | None = None,
                 num_batch_dims: int = 0):
    """Flatten each observation beyond the leading `num_batch_dims` axes
    and concatenate, sorted by key (acme tf2_utils.batch_concat
    ordering). Multi-dim observations (camera images) flatten into the
    vector; obs_layout's slices record their shapes for the conv
    front-ends to unflatten. num_batch_dims=-1 concatenates along the
    last axis without flattening (all items same rank)."""
    keys = sorted(obs.keys()) if keys is None else keys
    parts = []
    for k in keys:
        x = obs[k]
        if num_batch_dims < 0:
            parts.append(x if x.ndim else x[None])
            continue
        if x.ndim <= num_batch_dims:
            x = x[..., None]
        parts.append(x.reshape(x.shape[:num_batch_dims] + (-1,)))
    return jnp.concatenate(parts, axis=-1)


class LayerNormMLP(nn.Module):
    """Linear -> LayerNorm -> tanh -> [Linear -> elu]* (acme's LayerNormMLP).

    The reference's sonnet nets use truncated-normal/orthogonal-like inits;
    we use flax defaults (lecun_normal) — learning-curve-equivalent.
    """
    layer_sizes: Sequence[int]
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.layer_sizes[0])(x)
        x = nn.LayerNorm()(x)
        x = jnp.tanh(x)
        for i, size in enumerate(self.layer_sizes[1:]):
            x = nn.Dense(size)(x)
            last = i == len(self.layer_sizes) - 2
            if not last or self.activate_final:
                x = nn.elu(x)
        return x


class NormalDiagHead(nn.Module):
    """MultivariateNormalDiagHead (acme): affine mean + softplus stddev."""
    num_dimensions: int
    init_scale: float = 0.7
    min_scale: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(self.num_dimensions,
                        kernel_init=nn.initializers.variance_scaling(
                            1e-4, "fan_in", "truncated_normal"))(x)
        scale_raw = nn.Dense(self.num_dimensions,
                             kernel_init=nn.initializers.variance_scaling(
                                 1e-4, "fan_in", "truncated_normal"))(x)
        scale = jax.nn.softplus(scale_raw)
        scale = scale * self.init_scale / jax.nn.softplus(0.0)
        scale = scale + self.min_scale
        return NormalDiag(mean=mean, stddev=scale)


class PolicyNetwork(nn.Module):
    """Feed-forward stochastic policy."""
    action_size: int
    layer_sizes: Sequence[int] = (256, 256, 256)
    init_scale: float = 0.7

    @nn.compact
    def __call__(self, obs):
        x = obs if isinstance(obs, jnp.ndarray) else batch_concat(
            obs, num_batch_dims=-1)
        x = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
        return NormalDiagHead(self.action_size,
                              init_scale=self.init_scale)(x)


class DistributionalCritic(nn.Module):
    """Critic multiplexer + distributional head (51 atoms in [-150, 150])."""
    layer_sizes: Sequence[int] = (512, 512, 256)
    vmin: float = -150.0
    vmax: float = 150.0
    num_atoms: int = 51
    action_clip: tuple | None = (-1.0, 1.0)

    @nn.compact
    def __call__(self, obs, action):
        x = obs if isinstance(obs, jnp.ndarray) else batch_concat(
            obs, num_batch_dims=-1)
        if self.action_clip is not None:
            action = jnp.clip(action, self.action_clip[0],
                              self.action_clip[1])
        h = jnp.concatenate([x, action], axis=-1)
        h = LayerNormMLP(self.layer_sizes, activate_final=True)(h)
        logits = nn.Dense(self.num_atoms)(h)
        values = jnp.linspace(self.vmin, self.vmax, self.num_atoms,
                              dtype=logits.dtype)
        return DiscreteValued(logits=logits, values=values)


class VisNetFly(nn.Module):
    """Eye-camera conv net (reference vnl_ray/agents/vis_net.py:30-109):
    left/right 32x32 eyes stacked as 2 channels -> 4 strided convs ->
    flatten -> linear feature, concatenated after the task observations."""
    out_features: int = 8
    norm_mean: float = 77.0
    norm_std: float = 56.0

    @nn.compact
    def __call__(self, left_eye, right_eye):
        # (..., H, W) grayscale eyes -> (..., H, W, 2)
        x = jnp.stack([left_eye, right_eye], axis=-1)
        x = (x - self.norm_mean) / self.norm_std
        for features, stride in ((8, 2), (16, 2), (32, 2), (64, 2)):
            x = nn.Conv(features, (3, 3), strides=(stride, stride))(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        return nn.Dense(self.out_features)(x)


class VisNetRodent(nn.Module):
    """Egocentric-camera conv net (reference vnl_ray/agents/vis_net.py:
    112-202): grayscale camera -> convs (2,s1)(4,s1)(8,s2)(16,s2) VALID
    -> flatten -> linear feature, concatenated with the remaining
    observations."""
    out_features: int = 8
    norm_mean: float = 77.0
    norm_std: float = 56.0

    @nn.compact
    def __call__(self, camera):
        # (..., H, W) grayscale (raycast eye) or (..., H, W, 3) RGB
        if camera.ndim >= 3 and camera.shape[-1] == 3:
            camera = jnp.mean(camera, axis=-1)
        x = (camera - self.norm_mean) / self.norm_std
        x = x[..., None]
        for features, stride in ((2, 1), (4, 1), (8, 2), (16, 2)):
            x = nn.Conv(features, (3, 3), strides=(stride, stride),
                        padding="VALID")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        return nn.Dense(self.out_features)(x)


def _vis_features(eye_slices, obs, vis_features):
    """Shared eye front-end: 2 slices = fly stereo eyes (VisNetFly),
    1 slice = rodent egocentric camera (VisNetRodent)."""
    views = []
    spans = []
    for (s, sz, shape) in eye_slices:
        views.append(obs[..., s:s + sz].reshape(obs.shape[:-1] + shape))
        spans.append((s, sz))
    if len(views) == 2:
        feat = VisNetFly(out_features=vis_features)(*views)
    else:
        feat = VisNetRodent(out_features=vis_features)(views[0])
    return feat, _drop_slices(obs, spans)


def obs_layout(example_obs: dict, task_keys: Sequence[str] = ()):
    """Flat-vector layout of an observation dict.

    Returns (keys, slices) where keys is the concatenation order — task
    keys FIRST (sorted), then the rest (sorted), matching the reference's
    separate_observation ordering (vnl_ray/agents/utils_intention.py) —
    and slices maps key -> (start, size, shape) in the flattened vector.
    Shapes exclude the leading batch axis (example obs is batched)."""
    present_task = sorted(k for k in example_obs if k in set(task_keys))
    rest = sorted(k for k in example_obs if k not in set(task_keys))
    keys = present_task + rest
    slices = {}
    start = 0
    for k in keys:
        shape = tuple(example_obs[k].shape[1:]) or (1,)
        size = int(np.prod(shape))
        slices[k] = (start, size, shape)
        start += size
    return keys, slices


class VisionPolicy(nn.Module):
    """Policy with a convolutional eye front-end: the flat observation's
    eye pixels run through VisNetFly, whose features replace the raw
    pixels before the MLP policy (reference vis_net.py VisNetFly +
    network_factory observation_network composition)."""
    action_size: int
    eye_slices: tuple          # ((start, size, (H, W)) left, ... right)
    layer_sizes: Sequence[int] = (256, 256, 256)
    vis_features: int = 8
    init_scale: float = 0.7

    @nn.compact
    def __call__(self, obs):
        feat, rest = _vis_features(self.eye_slices, obs,
                                   self.vis_features)
        x = jnp.concatenate([feat, rest], axis=-1)
        x = LayerNormMLP(self.layer_sizes, activate_final=True)(x)
        return NormalDiagHead(self.action_size,
                              init_scale=self.init_scale)(x)


class VisionCritic(nn.Module):
    """Distributional critic with the same eye front-end."""
    eye_slices: tuple
    layer_sizes: Sequence[int] = (512, 512, 256)
    vis_features: int = 8
    vmin: float = -150.0
    vmax: float = 150.0
    num_atoms: int = 51

    @nn.compact
    def __call__(self, obs, action):
        feat, rest = _vis_features(self.eye_slices, obs,
                                   self.vis_features)
        action = jnp.clip(action, -1.0, 1.0)
        h = jnp.concatenate([feat, rest, action], axis=-1)
        h = LayerNormMLP(self.layer_sizes, activate_final=True)(h)
        logits = nn.Dense(self.num_atoms)(h)
        values = jnp.linspace(self.vmin, self.vmax, self.num_atoms,
                              dtype=logits.dtype)
        return DiscreteValued(logits=logits, values=values)


def _drop_slices(x, spans):
    """Remove [start, start+size) spans from the last axis."""
    spans = sorted(spans)
    parts = []
    pos = 0
    for s, n in spans:
        if s > pos:
            parts.append(x[..., pos:s])
        pos = s + n
    if pos < x.shape[-1]:
        parts.append(x[..., pos:])
    return jnp.concatenate(parts, axis=-1)


def make_policy_critic(action_size: int, obs_size: int,
                       policy_layers=(256, 256, 256),
                       critic_layers=(512, 512, 256),
                       vmin=-150.0, vmax=150.0, num_atoms=51):
    """Network factory (reference make_network_factory_dmpo)."""
    policy = PolicyNetwork(action_size=action_size,
                           layer_sizes=policy_layers)
    critic = DistributionalCritic(layer_sizes=critic_layers, vmin=vmin,
                                  vmax=vmax, num_atoms=num_atoms)

    def init(key):
        kp, kc = jax.random.split(key)
        obs = jnp.zeros((1, obs_size))
        act = jnp.zeros((1, action_size))
        return {"policy": policy.init(kp, obs),
                "critic": critic.init(kc, obs, act)}

    return policy, critic, init
