"""Reference-pose tracking reward family (vendored semantics, JAX).

Implements the reward functions the reference vendors from dm_control
(reference vnl_ray/tasks/rewards.py:181-319 — dm_control tuning — and the
rodent-tuned variants of vnl_ray/tasks/tracking_rewards.py:86-179):

* ``termination_reward``: 1 - err/threshold (rodent tuning scales by /5);
* ``multi_term_pose_reward``: sum of exponentiated squared feature
  differences over center_of_mass / joints_velocity / appendages /
  body_quaternions. Fly/dm_control exponents (-10, -1, -40, -2) with
  weights (1, 0.1, 0.15, 0.65); rodent exponents (-100, -0.1, -400, -2)
  with unit weights;
* ``comic``: 0.5 * termination/5 + 0.5 * multi_term (Hasenclever et al.,
  CoMic, ICML 2020).

All functions are pure JAX over feature dicts and return
``(reward, reward_channels)`` where reward_channels is an OrderedDict of
the per-term contributions (the reference records these per step as
``last_reward_channels`` for the evaluator's reward-decomposition plots).
"""

from __future__ import annotations

import collections

import jax.numpy as jnp


def bounded_quat_dist(source, target):
    """Quaternion distance bounded to pi/2; supports batch dims.

    (reference rewards.py:136-158 semantics.)"""
    source = source / jnp.linalg.norm(source, axis=-1, keepdims=True)
    target = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    dist = 2.0 * jnp.sum(source * target, axis=-1) ** 2 - 1.0
    dist = jnp.minimum(1.0, dist)
    return 0.5 * jnp.arccos(dist)[..., None]


def compute_squared_differences(walker_features, reference_features,
                                exclude_keys=()):
    """Squared feature differences; quaternion keys use bounded_quat_dist."""
    out = {}
    for k in walker_features:
        if k in exclude_keys:
            continue
        w, r = walker_features[k], reference_features[k]
        if "quaternion" not in k:
            out[k] = jnp.sum((w - r) ** 2)
        elif "quaternions" in k:
            out[k] = jnp.sum(bounded_quat_dist(w, r) ** 2)
        else:
            out[k] = jnp.sum(bounded_quat_dist(w, r) ** 2)
    return out


def termination_reward_fn(termination_error, termination_error_threshold,
                          scale: float = 1.0, **unused):
    r = 1.0 - termination_error / termination_error_threshold / scale
    return r, collections.OrderedDict(termination=r)


def multi_term_pose_reward_fn(walker_features, reference_features,
                              tuning: str = "rodent", **unused):
    d = compute_squared_differences(walker_features, reference_features)
    if tuning == "rodent":
        terms = collections.OrderedDict(
            appendages=jnp.exp(-400.0 * d["appendages"]),
            body_quaternions=jnp.exp(-2.0 * d["body_quaternions"]),
            center_of_mass=jnp.exp(-100.0 * d["center_of_mass"]),
            joints_velocity=jnp.exp(-0.1 * d["joints_velocity"]),
        )
    else:  # fly / vendored-file tuning (reference rewards.py:221-226)
        terms = collections.OrderedDict(
            appendages=0.15 * jnp.exp(-40.0 * d["appendages"]),
            body_quaternions=0.65 * jnp.exp(-2.0 * d["body_quaternions"]),
            center_of_mass=1.0 * jnp.exp(-10.0 * d["center_of_mass"]),
            joints_velocity=0.1 * jnp.exp(-d["joints_velocity"]),
        )
    reward = sum(terms.values())
    return reward, terms


def comic_reward_fn(termination_error, termination_error_threshold,
                    walker_features, reference_features,
                    tuning: str = "rodent", **unused):
    term_r, term_ch = termination_reward_fn(
        termination_error, termination_error_threshold)
    mt_r, mt_ch = multi_term_pose_reward_fn(
        walker_features, reference_features, tuning=tuning)
    channels = collections.OrderedDict(
        (k, 0.5 * v / 5.0) for k, v in term_ch.items())
    channels.update((k, 0.5 * v) for k, v in mt_ch.items())
    return 0.5 * term_r / 5.0 + 0.5 * mt_r, channels


_REWARD_FN = {
    "termination_reward": termination_reward_fn,
    "multi_term_pose_reward": multi_term_pose_reward_fn,
    "comic": comic_reward_fn,
}

_REWARD_CHANNELS = {
    "termination_reward": ("termination",),
    "multi_term_pose_reward": (
        "appendages", "body_quaternions", "center_of_mass",
        "joints_velocity"),
    "comic": (
        "appendages", "body_quaternions", "center_of_mass", "termination",
        "joints_velocity"),
}


def get_reward(reward_key: str):
    if reward_key not in _REWARD_FN:
        raise ValueError(f"unknown reward {reward_key!r}")
    return _REWARD_FN[reward_key]


def get_reward_channels(reward_key: str):
    if reward_key not in _REWARD_CHANNELS:
        raise ValueError(f"unknown reward {reward_key!r}")
    return _REWARD_CHANNELS[reward_key]
