"""Inverse kinematics by differentiable forward kinematics.

Re-design of the reference IK (reference vnl_ray/inverse_kinematics.py:
momentum gradient descent on ||s(q) - s*||^2 + a||q||^2 using hand-wired
MuJoCo site Jacobians). Here the engine's FK is pure JAX, so the gradient
comes from autodiff and the whole optimization is one ``lax.scan`` —
jittable and batchable over many targets at once (e.g. an entire mocap
clip solved in parallel on a TPU).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics.types import Data, Model


@dataclasses.dataclass
class IKResult:
    qpos: jnp.ndarray
    err_norm: jnp.ndarray
    site_error: jnp.ndarray
    steps: int


def qpos_from_site_xpos(model: Model, data: Data,
                        site_ids: np.ndarray,
                        target_xpos: jnp.ndarray,
                        dof_qposadr: np.ndarray,
                        reg_strength: float = 0.0,
                        lr: float = 0.01, beta: float = 0.99,
                        max_steps: int = 2000,
                        include_mask: jnp.ndarray | None = None) -> IKResult:
    """Find qpos such that site positions match targets.

    Args:
      site_ids: sites to match, (S,).
      target_xpos: (S, 3) targets.
      dof_qposadr: qpos addresses of the scalar joints to optimize.
      include_mask: optional (S, 3) 0/1 mask of Cartesian components.
    """
    site_ids = np.asarray(site_ids)
    dof_qposadr = np.asarray(dof_qposadr)
    # accept unbatched (S, 3) targets against batched engine data
    if target_xpos.ndim == 2:
        target_xpos = target_xpos[..., None]
    mask = (jnp.ones_like(target_xpos) if include_mask is None
            else include_mask.astype(target_xpos.dtype).reshape(
                target_xpos.shape))
    q0 = data.qpos[dof_qposadr]

    def objective(q):
        qpos = data.qpos.at[dof_qposadr].set(q)
        d = K.kinematics(model, data.replace(qpos=qpos))
        site_xpos = d.site_xpos[site_ids]
        err = (site_xpos - target_xpos) * mask
        site_err = jnp.sum(err ** 2)
        return site_err + reg_strength * jnp.sum((q - q0) ** 2), site_err

    grad_fn = jax.grad(objective, has_aux=True)

    def step(carry, _):
        q, mom = carry
        g, site_err = grad_fn(q)
        mom = beta * mom + g
        q = q - lr * mom
        return (q, mom), site_err

    (q, _), site_errs = jax.lax.scan(
        step, (q0, jnp.zeros_like(q0)), None, length=max_steps)
    final, site_err = objective(q)
    qpos = data.qpos.at[dof_qposadr].set(q)
    return IKResult(qpos=qpos, err_norm=jnp.sqrt(final),
                    site_error=jnp.sqrt(site_err), steps=max_steps)
