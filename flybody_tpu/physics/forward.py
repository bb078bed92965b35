"""Forward dynamics pipeline and integrators (batch-native).

``step(model, data) -> data`` is a pure function over a whole batch of
envs (trailing batch axis): jit it, shard it over a mesh, scan it over
substeps. The pipeline order and semantics mirror MuJoCo's
mj_forward/mj_Euler (the reference's physics hot loop, SURVEY.md §3.2)
re-expressed as batched functional stages.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.ops import tree_ldl as TL
from flybody_tpu.physics import actuation as A
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics import passive as P
from flybody_tpu.physics import smooth as S
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def fwd_position(m: Model, d: Data, col_update: bool = False) -> Data:
    """col_update=True runs the cheap selection-persistent collision
    refresh (Model.col_refresh > 1 substep schedule) instead of the full
    gated selection."""
    d = K.kinematics(m, d)
    d = K.com_pos(m, d)
    d = K.tendon(m, d)
    d = S.crb(m, d)
    d = col.collision_update(m, d) if col_update else col.collision(m, d)
    d = S.transmission(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = S.com_vel(m, d)
    d = P.passive(m, d)
    d = S.rne(m, d)
    return d


def fwd_actuation(m: Model, d: Data, efc=None) -> Data:
    d = A.act_dynamics(m, d)
    d = A.actuation(m, d, efc=efc)
    return d


def _xfrc_to_qfrc(m: Model, d: Data) -> jnp.ndarray:
    """Project xfrc_applied ((nbody, 6, B): force, torque at body com,
    world frame) into joint space."""
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    force = d.xfrc_applied[:, :3]
    torque = d.xfrc_applied[:, 3:]
    trq_o = torque + bq.cross(offset, force)
    cfrc = jnp.concatenate([trq_o, force], axis=-2)
    return P.project_body_forces(m, d, cfrc)


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                   + d.qfrc_applied + _xfrc_to_qfrc(m, d))
    qacc_smooth = S.solve_m(m, d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data, col_update: bool = False) -> Data:
    """Full forward dynamics: qacc from (qpos, qvel, ctrl, act).

    Adhesion transmission consumes the selected contacts directly in
    factorized 6D-wrench form (actuation.adhesion_qfrc), so no constraint
    assembly happens before the solver stage."""
    d = fwd_position(m, d, col_update=col_update)
    d = fwd_velocity(m, d)
    d = fwd_actuation(m, d)
    d = fwd_acceleration(m, d)
    d = C.solve(m, d, fresh=not col_update)
    return d


def _integrate_qpos(m: Model, qpos, qvel, h):
    """Position integration respecting quaternion manifolds (batched)."""
    out = qpos
    jt = np.asarray(m.jnt_type)
    qadr = np.asarray(m.jnt_qposadr)
    dadr = np.asarray(m.jnt_dofadr)

    sj = np.nonzero((jt == T.HINGE) | (jt == T.SLIDE))[0]
    if len(sj):
        out = out.at[qadr[sj]].add(h * qvel[dadr[sj]])

    ball = np.nonzero(jt == T.BALL)[0]
    if len(ball):
        qidx = qadr[ball][:, None] + np.arange(4)      # (nb, 4)
        widx = dadr[ball][:, None] + np.arange(3)
        q = qpos[qidx]                                  # (nb, 4, B)
        w = qvel[widx]
        out = out.at[qidx].set(bq.integrate(q, w, h))

    free = np.nonzero(jt == T.FREE)[0]
    if len(free):
        pidx = qadr[free][:, None] + np.arange(3)
        vidx = dadr[free][:, None] + np.arange(3)
        out = out.at[pidx].add(h * qvel[vidx])
        qidx = qadr[free][:, None] + np.arange(3, 7)
        widx = dadr[free][:, None] + np.arange(3, 6)
        q = qpos[qidx]
        w = qvel[widx]
        out = out.at[qidx].set(bq.integrate(q, w, h))
    return out


def _integrate_act(m: Model, d: Data, h):
    if m.na == 0:
        return d.act
    act = d.act + h * d.act_dot
    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    fe = np.nonzero(dyn == T.DYN_FILTEREXACT)[0]
    if len(fe):
        a = actadr[fe]
        tau = jnp.maximum(m.actuator_dynprm[fe, 0], 1e-12)[:, None]
        ctrl = A.clamp_ctrl(m, d.ctrl)[fe]
        act = act.at[a].set(d.act[a] + (ctrl - d.act[a])
                            * (1.0 - jnp.exp(-h / tau)))
    return act


def euler(m: Model, d: Data) -> Data:
    """Semi-implicit Euler with implicit-in-velocity joint damping,
    matching MuJoCo's default integrator.

    (M + h diag(damping)) qacc' = qfrc_smooth + qfrc_constraint, using
    the implicit-damping factor computed alongside qM's in smooth.crb
    (one stacked elimination pass per substep instead of two)."""
    h = m.opt.timestep.astype(d.qpos.dtype)
    tree = m.tree
    rhs = d.qfrc_smooth + d.qfrc_constraint
    qacc = TL.solve(tree, d.qLDh, d.qLDiagInvh, rhs)
    qvel = d.qvel + h * qacc
    act = _integrate_act(m, d, h)
    qpos = _integrate_qpos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step(m: Model, d: Data, col_update: bool = False) -> Data:
    """One physics step: forward dynamics + integration (+ sensors)."""
    d = forward(m, d, col_update=col_update)
    from flybody_tpu.physics import sensors as sens
    d = sens.sensor(m, d)
    d = euler(m, d)
    return d
