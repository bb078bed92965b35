"""Forward dynamics pipeline and integrators.

``step(model, data) -> data`` is a pure function: jit it, vmap it over
thousands of envs, scan it over substeps. The pipeline order and semantics
mirror MuJoCo's mj_forward/mj_Euler (the reference's physics hot loop,
SURVEY.md §3.2) re-expressed as batched functional stages.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.physics import actuation as A
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics import passive as P
from flybody_tpu.physics import smooth as S
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def fwd_position(m: Model, d: Data) -> Data:
    d = K.kinematics(m, d)
    d = K.com_pos(m, d)
    d = K.tendon(m, d)
    d = S.crb(m, d)
    d = col.collision(m, d)
    d = S.transmission(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = S.com_vel(m, d)
    d = P.passive(m, d)
    d = S.rne(m, d)
    return d


def fwd_actuation(m: Model, d: Data) -> Data:
    d = A.act_dynamics(m, d)
    d = A.adhesion_moment(m, d)
    d = A.actuation(m, d)
    return d


def _xfrc_to_qfrc(m: Model, d: Data) -> jnp.ndarray:
    """Project xfrc_applied ((nbody,6): force, torque at body com, world
    frame) into joint space."""
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    force = d.xfrc_applied[:, :3]
    torque = d.xfrc_applied[:, 3:]
    trq_o = torque + jnp.cross(offset, force)
    cfrc = jnp.concatenate([trq_o, force], axis=-1)
    return P.project_body_forces(m, d, cfrc)


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                   + d.qfrc_applied + _xfrc_to_qfrc(m, d))
    qacc_smooth = S.solve_m(d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data) -> Data:
    """Full forward dynamics: qacc from (qpos, qvel, ctrl, act)."""
    d = fwd_position(m, d)
    d = fwd_velocity(m, d)
    d = fwd_actuation(m, d)
    d = fwd_acceleration(m, d)
    d = C.solve(m, d)
    return d


def _integrate_qpos(m: Model, qpos, qvel, h):
    """Position integration respecting quaternion manifolds."""
    out = qpos
    jt = np.asarray(m.jnt_type)
    qadr = np.asarray(m.jnt_qposadr)
    dadr = np.asarray(m.jnt_dofadr)

    # scalar joints (hinge/slide): simple addition, batched via index lists
    sj = np.nonzero((jt == T.HINGE) | (jt == T.SLIDE))[0]
    if len(sj):
        out = out.at[qadr[sj]].add(h * qvel[dadr[sj]])

    for j in np.nonzero(jt == T.BALL)[0]:
        q = qpos[qadr[j]:qadr[j] + 4]
        w = qvel[dadr[j]:dadr[j] + 3]
        out = jax.lax.dynamic_update_slice(
            out, mq.quat_integrate(q, w, h), (qadr[j],))
    for j in np.nonzero(jt == T.FREE)[0]:
        a, v = qadr[j], dadr[j]
        out = jax.lax.dynamic_update_slice(
            out, qpos[a:a + 3] + h * qvel[v:v + 3], (a,))
        q = qpos[a + 3:a + 7]
        w = qvel[v + 3:v + 6]
        out = jax.lax.dynamic_update_slice(
            out, mq.quat_integrate(q, w, h), (a + 3,))
    return out


def _integrate_act(m: Model, d: Data, h):
    if m.na == 0:
        return d.act
    act = d.act + h * d.act_dot
    # filterexact: exact exponential update
    dyn = np.asarray(m.actuator_dyntype)
    actadr = np.asarray(m.actuator_actadr)
    for u in np.nonzero(dyn == T.DYN_FILTEREXACT)[0]:
        a = actadr[u]
        tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-12)
        ctrl = A.clamp_ctrl(m, d.ctrl)[u]
        act = act.at[a].set(d.act[a] + (ctrl - d.act[a])
                            * (1.0 - jnp.exp(-h / tau)))
    return act


def euler(m: Model, d: Data) -> Data:
    """Semi-implicit Euler with implicit-in-velocity joint damping,
    matching MuJoCo's default integrator."""
    h = m.opt.timestep.astype(d.qpos.dtype)
    # Implicit-in-velocity joint damping (MuJoCo Euler):
    # (M + h*diag(damping)) qacc' = qfrc_smooth + qfrc_constraint.
    # Always applied; exact no-op when damping == 0.
    from flybody_tpu.ops import linalg as LA
    MhB = d.qM + h * jnp.diag(m.dof_damping)
    rhs = d.qfrc_smooth + d.qfrc_constraint
    qacc = LA.cho_solve(LA.cho_factor(MhB), rhs)
    qvel = d.qvel + h * qacc
    act = _integrate_act(m, d, h)
    qpos = _integrate_qpos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step(m: Model, d: Data) -> Data:
    """One physics step: forward dynamics + integration (+ sensors)."""
    d = forward(m, d)
    from flybody_tpu.physics import sensors as sens
    d = sens.sensor(m, d)
    d = euler(m, d)
    return d
