"""Reward shaping primitives (jnp port of dm_control.utils.rewards).

The reference tasks build rewards from `rewards.tolerance` (e.g. the
walk-on-ball task, reference vnl_ray/tasks/walk_on_ball.py:61-73). This is
a functional JAX implementation of the same sigmoid family, batched and
differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEFAULT_VALUE_AT_MARGIN = 0.1


def _sigmoid(x, value_at_1: float, sigmoid: str):
    if sigmoid == "gaussian":
        scale = jnp.sqrt(-2.0 * jnp.log(value_at_1))
        return jnp.exp(-0.5 * (x * scale) ** 2)
    if sigmoid == "hyperbolic":
        scale = jnp.arccosh(1.0 / value_at_1)
        return 1.0 / jnp.cosh(x * scale) ** 2
    if sigmoid == "long_tail":
        scale = jnp.sqrt(1.0 / value_at_1 - 1.0)
        return 1.0 / ((x * scale) ** 2 + 1.0)
    if sigmoid == "reciprocal":
        scale = 1.0 / value_at_1 - 1.0
        return 1.0 / (jnp.abs(x) * scale + 1.0)
    if sigmoid == "cosine":
        scale = jnp.arccos(2.0 * value_at_1 - 1.0) / jnp.pi
        scaled = jnp.abs(x * scale)
        return jnp.where(scaled < 1,
                         (1.0 + jnp.cos(jnp.pi * scaled)) / 2.0, 0.0)
    if sigmoid == "linear":
        scale = 1.0 - value_at_1
        scaled = jnp.abs(x) * scale
        return jnp.where(scaled < 1, 1.0 - scaled, 0.0)
    if sigmoid == "quadratic":
        scale = jnp.sqrt(1.0 - value_at_1)
        scaled = jnp.abs(x) * scale
        return jnp.where(scaled < 1, 1.0 - scaled ** 2, 0.0)
    if sigmoid == "tanh_squared":
        scale = jnp.arctanh(jnp.sqrt(1.0 - value_at_1))
        return 1.0 - jnp.tanh(x * scale) ** 2
    raise ValueError(f"unknown sigmoid {sigmoid!r}")


def tolerance(x, bounds=(0.0, 0.0), margin=0.0, sigmoid="gaussian",
              value_at_margin=_DEFAULT_VALUE_AT_MARGIN):
    """Reward 1 inside `bounds`, decaying through `margin` outside.

    margin may be a TRACED array (e.g. per-env task targets, as in
    vision_guided_flight's speed factors), so the zero-margin hard-cutoff
    case is a jnp.where, not a Python branch."""
    lower, upper = bounds
    in_bounds = jnp.logical_and(lower <= x, x <= upper)
    margin = jnp.asarray(margin)
    d = (jnp.where(x < lower, lower - x, x - upper)
         / jnp.where(margin == 0, 1.0, margin))
    soft = _sigmoid(d, value_at_margin, sigmoid)
    outside = jnp.where(margin == 0, 0.0, soft)
    return jnp.where(in_bounds, 1.0, outside)
