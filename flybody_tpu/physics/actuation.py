"""Actuation: activation dynamics, gain/bias force model, adhesion (batched).

Covers the actuator feature set of the fly model (reference fruitfly MJCF
actuator block + walker surgery that converts actuators to dyntype=filter,
reference vnl_ray/fruitfly/fruitfly.py:271-281):

* ``general`` actuators, gaintype fixed, biastype none/affine,
  dyntype none/integrator/filter/filterexact;
* ``adhesion`` actuators (trntype body): the moment is the mean of the
  contact-normal Jacobian rows over active contacts of the target body,
  with sign such that positive ctrl pulls the contact pair together.

The dense (nu, nv) moment matrix of the round-1 engine is replaced by
static scatter maps (joints/tendons) and a static-support sparse normal-
jacobian accumulation (adhesion) — nothing O(nu*nv) is materialized.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def clamp_ctrl(m: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    limited = jnp.asarray(np.asarray(m.actuator_ctrllimited, dtype=bool))
    lo = m.actuator_ctrlrange[:, 0:1]
    hi = m.actuator_ctrlrange[:, 1:2]
    return jnp.where(limited[:, None], jnp.clip(ctrl, lo, hi), ctrl)


def act_dynamics(m: Model, d: Data) -> Data:
    """Compute act_dot from ctrl (dyntype integrator/filter)."""
    if m.na == 0:
        return d
    ctrl = clamp_ctrl(m, d.ctrl)
    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    act_dot = jnp.zeros_like(d.act)

    integ = np.nonzero(dyn == T.DYN_INTEGRATOR)[0]
    if len(integ):
        act_dot = act_dot.at[actadr[integ]].set(ctrl[integ])
    filt = np.nonzero((dyn == T.DYN_FILTER) | (dyn == T.DYN_FILTEREXACT))[0]
    if len(filt):
        tau = jnp.maximum(m.actuator_dynprm[filt, 0], 1e-12)[:, None]
        a = actadr[filt]
        act_dot = act_dot.at[a].set((ctrl[filt] - d.act[a]) / tau)
    return d.replace(act_dot=act_dot)


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


_ADH_CACHE: dict = {}


def _adhesion_acts(m: Model):
    """Static (actuator id, target body id) pairs of adhesion actuators."""
    key = T.static_key(m.actuator_trnid, m.actuator_trntype)
    if key not in _ADH_CACHE:
        trntype = np.asarray(m.actuator_trntype)
        acts = np.nonzero(trntype == T.TRN_BODY)[0]
        bodies = np.asarray(m.actuator_trnid)[acts, 0]
        _ADH_CACHE[key] = (acts.astype(np.int32), bodies.astype(np.int32))
    return _ADH_CACHE[key]


def adhesion_qfrc(m: Model, d: Data, force: jnp.ndarray,
                  efc=None) -> jnp.ndarray:
    """qfrc (nv, B) contribution of adhesion actuators given their scalar
    forces (nu, B). Matches mj_transmission mjTRN_BODY semantics: moment =
    -(mean over active contacts of the target body of the contact-normal
    jacobian row) * gear.

    Factorized: the normal row is J_n[k, v] = mdiff[k, v] *
    (u6n_k . D6_v) with u6n = [normal, p x normal], so the weighted row
    sum collapses to per-body 6D wrench accumulation (one one-hot
    contraction over the selected contacts) followed by the static
    (nbody, nv) dof-support matmul — no (Ksum, nv, B) Jacobian is
    materialized and no constraint assembly is needed here (``efc`` is
    accepted for API compatibility and ignored)."""
    del efc
    qfrc = jnp.zeros_like(d.qvel)
    acts, bodies = _adhesion_acts(m)
    if len(acts) == 0 or (m.ncon_max == 0 and m.nccd == 0):
        return qfrc
    from flybody_tpu.math import bquat as bq
    from flybody_tpu.physics import solver_fused as SF
    dtype = d.qpos.dtype
    con = d.contact

    active = (con.dist < con.marginfull).astype(dtype)      # (Ksum, B)
    # membership of each selected contact in each actuator's body (either
    # side of the pair), matching the static slot-set semantics of
    # MuJoCo's adhesion transmission
    bod = jnp.asarray(bodies, jnp.int32)[:, None, None]     # (nact, 1, 1)
    member = ((con.b1[None] == bod) | (con.b2[None] == bod)
              ).astype(dtype)                               # (nact, Ksum, B)
    count = jnp.sum(member * active[None], axis=1)          # (nact, B)

    gain = m.actuator_gear[acts, 0]                         # (nact,)
    scale = jnp.where(count > 0,
                      -gain[:, None] / jnp.maximum(count, 1.0),
                      0.0) * force[acts]                    # (nact, B)
    coeff = jnp.sum(member * scale[:, None, :], axis=0) * active  # (Ksum, B)

    # weighted normal-row sum via per-body wrench accumulation
    normal = con.frame[:, 0]                                # (Ksum, 3, B)
    u6n = jnp.concatenate([normal, bq.cross(con.pos, normal)],
                          axis=-2)                          # (Ksum, 6, B)
    iota = jnp.arange(m.nbody, dtype=jnp.int32)[None, :, None]
    ohd = ((con.b2[:, None, :] == iota).astype(dtype)
           - (con.b1[:, None, :] == iota).astype(dtype))    # (Ksum, nb, B)
    wrench = jnp.einsum("kbB,kcB->bcB", ohd, u6n * coeff[:, None, :])
    maskd = jnp.asarray(np.asarray(m.body_dof_mask), dtype)
    wv = jnp.einsum("bv,bcB->vcB", maskd, wrench)           # (nv, 6, B)
    D6 = SF._dof_basis(m, d)
    return qfrc + jnp.sum(wv * D6, axis=1)


def actuation(m: Model, d: Data, efc=None) -> Data:
    """mj_fwdActuation: actuator forces -> qfrc_actuator."""
    if m.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros_like(d.qvel))
    ctrl = clamp_ctrl(m, d.ctrl)

    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    has_act = dyn != T.DYN_NONE
    act_idx = np.where(has_act, np.maximum(actadr, 0), 0)
    inp = jnp.where(jnp.asarray(has_act)[:, None],
                    d.act[act_idx] if m.na else ctrl, ctrl)

    gaintype = np.asarray(m.actuator_gaintype)
    gp = m.actuator_gainprm
    gain = jnp.where(jnp.asarray(gaintype == T.GAIN_AFFINE)[:, None],
                     gp[:, 0:1] + gp[:, 1:2] * d.actuator_length
                     + gp[:, 2:3] * d.actuator_velocity,
                     gp[:, 0:1])

    biastype = np.asarray(m.actuator_biastype)
    bp = m.actuator_biasprm
    bias = jnp.where(jnp.asarray(biastype == T.BIAS_AFFINE)[:, None],
                     bp[:, 0:1] + bp[:, 1:2] * d.actuator_length
                     + bp[:, 2:3] * d.actuator_velocity,
                     0.0)

    force = gain * inp + bias
    flimited = jnp.asarray(np.asarray(m.actuator_forcelimited, dtype=bool))
    force = jnp.where(
        flimited[:, None],
        jnp.clip(force, m.actuator_forcerange[:, 0:1],
                 m.actuator_forcerange[:, 1:2]),
        force)

    # qfrc via static transmission maps
    qfrc = jnp.zeros_like(d.qvel)
    trntype = np.asarray(m.actuator_trntype)
    trnid = np.asarray(m.actuator_trnid)[:, 0]
    gear0 = m.actuator_gear[:, 0]
    jnt_dofadr = np.asarray(m.jnt_dofadr)

    jids = np.nonzero(trntype == T.TRN_JOINT)[0]
    if len(jids):
        qfrc = qfrc.at[jnt_dofadr[trnid[jids]]].add(
            gear0[jids][:, None] * force[jids])

    tids = np.nonzero(trntype == T.TRN_TENDON)[0]
    if len(tids):
        from flybody_tpu.physics import kinematics as K
        ten_frc = jnp.zeros((m.ntendon, d.qpos.shape[-1]), d.qpos.dtype)
        ten_frc = ten_frc.at[trnid[tids]].add(gear0[tids][:, None]
                                              * force[tids])
        qfrc = qfrc + K.ten_moment_apply(m, d, ten_frc)

    qfrc = qfrc + adhesion_qfrc(m, d, force, efc=efc)
    return d.replace(actuator_force=force, qfrc_actuator=qfrc)
