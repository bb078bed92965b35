"""Minimal distribution library for the DMPO stack (pure JAX).

Replaces the reference's TFP usage (reference vnl_ray/agents use
tfd.MultivariateNormalDiag / DiscreteValuedDistribution via acme). Only the
operations DMPO needs are implemented: sample, log_prob, per-dimension KL
for diagonal Gaussians, and the mean of a discrete-valued categorical.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


@dataclasses.dataclass(frozen=True)
class NormalDiag:
    """Diagonal Gaussian over action vectors; batch dims lead."""
    mean: jax.Array    # (..., d)
    stddev: jax.Array  # (..., d)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.mean.shape
        eps = jax.random.normal(key, shape, dtype=self.mean.dtype)
        return self.mean + self.stddev * eps

    def log_prob_per_dim(self, x):
        z = (x - self.mean) / self.stddev
        return -0.5 * z * z - jnp.log(self.stddev) - _HALF_LOG_2PI

    def log_prob(self, x):
        return jnp.sum(self.log_prob_per_dim(x), axis=-1)

    def entropy(self):
        return jnp.sum(jnp.log(self.stddev) + _HALF_LOG_2PI + 0.5, axis=-1)

    def mode(self):
        return self.mean


def kl_normal_diag_per_dim(p: NormalDiag, q: NormalDiag):
    """KL(p || q) per action dimension (decoupled-KL MPO needs per-dim)."""
    var_ratio = (p.stddev / q.stddev) ** 2
    mean_term = ((q.mean - p.mean) / q.stddev) ** 2
    return 0.5 * (var_ratio + mean_term - 1.0 - jnp.log(var_ratio))


jax.tree_util.register_pytree_node(
    NormalDiag,
    lambda d: ((d.mean, d.stddev), None),
    lambda _, c: NormalDiag(*c))


@dataclasses.dataclass(frozen=True)
class DiscreteValued:
    """Categorical over a fixed support (distributional critic head)."""
    logits: jax.Array  # (..., n_atoms)
    values: jax.Array  # (n_atoms,)

    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def mean(self):
        return jnp.sum(self.probs() * self.values, axis=-1)


jax.tree_util.register_pytree_node(
    DiscreteValued,
    lambda d: ((d.logits, d.values), None),
    lambda _, c: DiscreteValued(*c))
