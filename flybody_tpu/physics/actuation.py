"""Actuation: activation dynamics, gain/bias force model, adhesion.

Covers the actuator feature set of the fly model (reference fruitfly MJCF
actuator block + walker surgery that converts actuators to dyntype=filter,
reference vnl_ray/fruitfly/fruitfly.py:271-281):

* ``general`` actuators, gaintype fixed, biastype none/affine,
  dyntype none/integrator/filter/filterexact;
* ``adhesion`` actuators (trntype body): the moment is the mean of the
  contact-normal Jacobian rows over active contacts of the target body,
  with sign such that positive ctrl pulls the contact pair together.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def act_dynamics(m: Model, d: Data) -> Data:
    """Compute act_dot from ctrl (dyntype integrator/filter)."""
    if m.na == 0:
        return d
    ctrl = clamp_ctrl(m, d.ctrl)
    act_dot = jnp.zeros_like(d.act)
    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    for u in range(m.nu):
        if dyn[u] == T.DYN_NONE:
            continue
        a = actadr[u]
        if dyn[u] == T.DYN_INTEGRATOR:
            act_dot = act_dot.at[a].set(ctrl[u])
        elif dyn[u] in (T.DYN_FILTER, T.DYN_FILTEREXACT):
            tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-12)
            act_dot = act_dot.at[a].set((ctrl[u] - d.act[a]) / tau)
    return d.replace(act_dot=act_dot)


def clamp_ctrl(m: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    limited = jnp.asarray(np.asarray(m.actuator_ctrllimited, dtype=bool))
    lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
    return jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)


def adhesion_moment(m: Model, d: Data) -> Data:
    """Fill actuator_moment rows for body-transmission (adhesion) actuators.

    For each active contact (dist < includemargin) with exactly one geom on
    the target body's subtree-weld, accumulate the normal-direction contact
    Jacobian; the moment is the average over active contacts, signed so that
    positive force attracts. Matches mj_transmission mjTRN_BODY semantics.
    """
    trntype = np.asarray(m.actuator_trntype)
    body_acts = np.nonzero(trntype == T.TRN_BODY)[0]
    if len(body_acts) == 0 or m.ncon_max == 0:
        return d
    dtype = d.qpos.dtype
    con = d.contact
    slot_b1, slot_b2 = _slot_bodies(m)

    moment = d.actuator_moment
    for u in body_acts:
        b = int(np.asarray(m.actuator_trnid)[u, 0])
        # STATIC subset of contact slots that involve body b (few per claw)
        slots = np.nonzero((slot_b1 == b) | (slot_b2 == b))[0]
        if len(slots) == 0:
            continue
        from flybody_tpu.physics import constraint as C
        jn, _ = C.contact_jacobians(m, d, slots=slots, dims=1)
        jn = jn[:, 0, :]                             # (S, nv)
        # adhesion acts across the full margin (incl. the gap zone — that is
        # what geom gap exists for; reference adhesion-collision class sets
        # margin=gap=0.0005)
        active = (con.dist[slots] < m.con_margin[slots]).astype(dtype)
        count = jnp.sum(active)
        # normal jac is positive along the separating direction; adhesion
        # must oppose separation => moment = -mean(J_normal) * gear.
        row = -(active[:, None] * jn).sum(0) / jnp.maximum(count, 1.0)
        gain = m.actuator_gear[u, 0]
        moment = moment.at[u].set(row * jnp.where(count > 0, gain, 0.0))
    return d.replace(actuator_moment=moment)


def _slot_bodies(m: Model):
    """Static (ncon_max,) body ids of geom1/geom2 per contact slot."""
    gb = np.asarray(m.geom_bodyid)
    b1, b2 = [], []
    pt = np.asarray(m.pair_type)
    from flybody_tpu.physics.io_mj import _PAIR_NCON
    for k in range(len(np.asarray(m.pair_geom1))):
        n = _PAIR_NCON[(int(pt[k, 0]), int(pt[k, 1]))]
        b1 += [gb[np.asarray(m.pair_geom1)[k]]] * n
        b2 += [gb[np.asarray(m.pair_geom2)[k]]] * n
    return np.array(b1), np.array(b2)


def actuation(m: Model, d: Data) -> Data:
    """mj_fwdActuation: actuator forces -> qfrc_actuator."""
    if m.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros_like(d.qvel))
    ctrl = clamp_ctrl(m, d.ctrl)

    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    # input = act for stateful actuators, ctrl otherwise
    has_act = dyn != T.DYN_NONE
    act_idx = np.where(has_act, np.maximum(actadr, 0), 0)
    inp = jnp.where(jnp.asarray(has_act),
                    d.act[act_idx] if m.na else ctrl, ctrl)

    gaintype = np.asarray(m.actuator_gaintype)
    gp = m.actuator_gainprm
    gain = jnp.where(jnp.asarray(gaintype == T.GAIN_AFFINE),
                     gp[:, 0] + gp[:, 1] * d.actuator_length
                     + gp[:, 2] * d.actuator_velocity,
                     gp[:, 0])

    biastype = np.asarray(m.actuator_biastype)
    bp = m.actuator_biasprm
    bias = jnp.where(jnp.asarray(biastype == T.BIAS_AFFINE),
                     bp[:, 0] + bp[:, 1] * d.actuator_length
                     + bp[:, 2] * d.actuator_velocity,
                     0.0)

    force = gain * inp + bias
    flimited = jnp.asarray(np.asarray(m.actuator_forcelimited, dtype=bool))
    force = jnp.where(
        flimited,
        jnp.clip(force, m.actuator_forcerange[:, 0],
                 m.actuator_forcerange[:, 1]),
        force)

    qfrc = d.actuator_moment.T @ force
    return d.replace(actuator_force=force, qfrc_actuator=qfrc, ctrl=d.ctrl)
