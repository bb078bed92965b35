"""Imitation reward features and DeepMimic factored rewards (pure JAX).

JAX re-design of the reference imitation rewards (reference
vnl_ray/tasks/rewards.py:9-111): pose features (com, qvel, egocentric
root->site vectors, joint orientation quaternions) compared against the
reference trajectory with per-feature Gaussian factors. All functions are
jit/vmap-able and operate on the engine's Data pytree.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.physics.types import Data, Model

# Default stds for fruitfly walking imitation (reference rewards.py:99-105)
DEFAULT_STDS = {
    "com": 0.078487,
    "qvel": 53.7801,
    "root2site": 0.0735,
    "joint_quat": 1.2247,
}


def compute_diffs(walker_features: dict, reference_features: dict,
                  n: int = 2) -> dict:
    """Sums of |differences|^n per feature; geodesic distance for quats."""
    diffs = {}
    for k in walker_features:
        if "quat" not in k:
            diffs[k] = jnp.sum(
                jnp.abs(walker_features[k] - reference_features[k]) ** n)
        else:
            diffs[k] = jnp.sum(mq.quat_dist_short_arc(
                walker_features[k], reference_features[k]) ** n)
    return diffs


def get_walker_features(model: Model, data: Data, joint_dofadr: np.ndarray,
                        joint_ids: np.ndarray, site_ids: np.ndarray,
                        root_qposadr: int = 0) -> dict:
    """Model pose features (reference get_walker_features).

    joint_ids/dofadr: the walker's scalar joints (excluding the free root);
    site_ids: end-effector/tracking sites.
    """
    a = root_qposadr
    root_pos = jnp.asarray(data.qpos[a:a + 3])
    root_quat = jnp.asarray(data.qpos[a + 3:a + 7])
    sites = data.site_xpos[site_ids]
    root2site = mq.get_egocentric_vec(root_pos, sites, root_quat)

    # joint axes in root-local frame -> joint orientation quats
    xaxis = data.xaxis[joint_ids]
    xaxis_local = mq.rotate_vec_with_quat(
        xaxis, mq.reciprocal_quat(root_quat))
    qpos_joints = data.qpos[np.asarray(model.jnt_qposadr)[joint_ids]]
    joint_quat = mq.joint_orientation_quat(xaxis_local, qpos_joints)
    joint_quat = jnp.concatenate([root_quat[None], joint_quat], axis=0)

    qvel = jnp.concatenate(
        [data.qvel[:6], data.qvel[joint_dofadr]]) \
        if root_qposadr == 0 else data.qvel

    return {
        "com": root_pos,
        "qvel": qvel,
        "root2site": root2site,
        "joint_quat": joint_quat,
    }


def get_reference_features(reference: dict, step) -> dict:
    """Reference pose features at (traced) step index.

    `reference` holds device arrays keyed qpos/qvel/root2site/joint_quat
    with leading time dim (reference get_reference_features)."""
    qpos_ref = reference["qpos"][step]
    joint_quat = jnp.concatenate(
        [qpos_ref[3:7][None], reference["joint_quat"][step]], axis=0)
    return {
        "com": qpos_ref[:3],
        "qvel": reference["qvel"][step],
        "root2site": reference["root2site"][step],
        "joint_quat": joint_quat,
    }


def reward_factors_deep_mimic(walker_features, reference_features,
                              std=None, weights=(1, 1, 1, 1)):
    """Four DeepMimic reward factors (com, qvel, end-effectors, joints)."""
    if std is None:
        std = DEFAULT_STDS
    diffs = compute_diffs(walker_features, reference_features, n=2)
    factors = jnp.stack([
        jnp.exp(-0.5 / std[k] ** 2 * diffs[k])
        for k in walker_features.keys()])
    return factors * jnp.asarray(weights, factors.dtype)
