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

from flybody_tpu.math import bquat as bq
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


def _adhesion_plan(m: Model):
    """Static flattened plan for ALL adhesion actuators: contact slots and
    the sparse (slot, dof, sign) support triplets of the normal-direction
    jacobian, concatenated with per-actuator segment ids so the runtime is
    a single batched gather/scatter pass (not a per-actuator loop)."""
    key = id(m.actuator_trnid)
    if key in _ADH_CACHE:
        return _ADH_CACHE[key]
    trntype = np.asarray(m.actuator_trntype)
    body_acts = np.nonzero(trntype == T.TRN_BODY)[0]
    slot_b1, slot_b2 = _slot_bodies(m)
    bdm = np.asarray(m.body_dof_mask)
    acts, slot_list, slot_seg = [], [], []
    tri_s, tri_v, tri_sign, tri_seg = [], [], [], []
    for u in body_acts:
        b = int(np.asarray(m.actuator_trnid)[u, 0])
        slots = np.nonzero((slot_b1 == b) | (slot_b2 == b))[0]
        if len(slots) == 0:
            continue
        seg = len(acts)
        acts.append(int(u))
        for s in slots:
            slot_list.append(int(s))
            slot_seg.append(seg)
            m1 = bdm[slot_b1[s]]
            m2 = bdm[slot_b2[s]]
            for v in np.nonzero(m1 | m2)[0]:
                sign = float(m2[v]) - float(m1[v])
                if sign != 0.0:
                    tri_s.append(int(s)); tri_v.append(int(v))
                    tri_sign.append(sign); tri_seg.append(seg)
    plan = None
    if acts:
        plan = dict(
            acts=np.asarray(acts, np.int32),
            slots=np.asarray(slot_list, np.int32),
            slot_seg=np.asarray(slot_seg, np.int32),
            tri_s=np.asarray(tri_s, np.int32),
            tri_v=np.asarray(tri_v, np.int32),
            tri_sign=np.asarray(tri_sign, np.float64),
            tri_seg=np.asarray(tri_seg, np.int32),
        )
    _ADH_CACHE[key] = plan
    return plan


def adhesion_qfrc(m: Model, d: Data, force: jnp.ndarray) -> jnp.ndarray:
    """qfrc (nv, B) contribution of adhesion actuators given their scalar
    forces (nu, B). Matches mj_transmission mjTRN_BODY semantics: moment =
    -(mean over active contacts of the normal jacobian row) * gear.

    Triple-product form: n_s . jacp(v) = base_v . n_s + ang_v . (p_s x n_s)
    — everything is computed from SLOT-sized (S ~ 50) and dof-sized arrays
    with one (S, nv) static signed support mask; nothing triplet-sized
    (S x supports) is ever materialized (round-2 trace: the triplet
    gathers were ~20% of the whole substep)."""
    qfrc = jnp.zeros_like(d.qvel)
    plan = _adhesion_plan(m)
    if plan is None or m.ncon_max == 0:
        return qfrc
    dtype = d.qpos.dtype
    con = d.contact
    nact = len(plan["acts"])
    slots, slot_seg = plan["slots"], plan["slot_seg"]
    S = len(slots)

    # per-slot quantities (S, 3, B)
    pos_s = con.pos[slots]
    n_s = con.frame[slots][:, 0]
    w_s = bq.cross(pos_s, n_s)
    active = (con.dist[slots] < m.con_margin[slots, None]).astype(dtype)
    count = jnp.zeros((nact, active.shape[-1]),
                      dtype).at[slot_seg].add(active)          # (nact, B)

    # per-dof quantities
    root_of_dof = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    ang = d.cdof[:, :3]                                        # (nv, 3, B)
    base = d.cdof[:, 3:] - bq.cross(ang, d.subtree_com[root_of_dof])

    # static signed support mask (S, nv): (m2 - m1)[v] per slot
    key = ("signmask", id(m.actuator_trnid))
    if key not in _ADH_CACHE:
        slot_b1, slot_b2 = _slot_bodies(m)
        bdm = np.asarray(m.body_dof_mask).astype(np.float64)
        sm = bdm[slot_b2[slots]] - bdm[slot_b1[slots]]         # (S, nv)
        _ADH_CACHE[key] = sm
    signmask = jnp.asarray(_ADH_CACHE[key], dtype)

    gain = m.actuator_gear[plan["acts"], 0]                    # (nact,)
    scale = jnp.where(count > 0,
                      -gain[:, None] / jnp.maximum(count, 1.0),
                      0.0) * force[plan["acts"]]               # (nact, B)
    coeff = active * scale[slot_seg]                           # (S, B)

    # qfrc_v = sum_s signmask[s,v] coeff[s] (base_v . n_s + ang_v . w_s)
    jn = (jnp.einsum("vcB,scB->svB", base, n_s)
          + jnp.einsum("vcB,scB->svB", ang, w_s))              # (S, nv, B)
    return qfrc + jnp.einsum("sv,svB,sB->vB", signmask, jn, coeff)


def actuation(m: Model, d: Data) -> Data:
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

    qfrc = qfrc + adhesion_qfrc(m, d, force)
    return d.replace(actuator_force=force, qfrc_actuator=qfrc)
