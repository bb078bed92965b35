"""Task utilities (reference vnl_ray/tasks/task_utils.py subset, in JAX)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq

# Fixed fly CoM offset from the root (thorax) frame, cm
# (reference task_utils.py:174-213).
_COM_OFFSET = np.array([-0.03697634, 0.00029744, -0.01415133])


def com2root(com_pos, quat):
    """CoM world position(s) -> root joint position(s)."""
    offset = mq.rotate_vec_with_quat(
        jnp.asarray(_COM_OFFSET, jnp.asarray(com_pos).dtype), quat)
    return jnp.asarray(com_pos) - offset


def root2com(root_pos, quat):
    """Root joint position(s) -> CoM world position(s)."""
    offset = mq.rotate_vec_with_quat(
        jnp.asarray(_COM_OFFSET, jnp.asarray(root_pos).dtype), quat)
    return jnp.asarray(root_pos) + offset


def real_to_canonical(action, lo, hi):
    """Real env action -> canonical [-1, 1] (reference real2canonical)."""
    return 2.0 * (jnp.asarray(action) - lo) / (hi - lo) - 1.0


def canonical_to_real(action, lo, hi):
    """Canonical [-1, 1] -> real env action (reference canonical2real)."""
    return lo + (jnp.clip(jnp.asarray(action), -1.0, 1.0) + 1.0) \
        * 0.5 * (hi - lo)
