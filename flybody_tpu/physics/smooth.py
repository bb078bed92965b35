"""Smooth (unconstrained) dynamics: velocities, mass matrix, bias forces.

Matches MuJoCo's mj_comVel / mj_crb / mj_rne / mj_transmission semantics for
the supported feature set, re-expressed as dense batched linear algebra:

* The CRB composite inertias are accumulated level-parallel up the tree and
  the joint-space inertia matrix is formed as one masked (nv,6)x(6,nv)
  matmul — under vmap this is a large batched GEMM that maps onto the MXU.
* The bias force (RNE) uses the same level-parallel forward/backward sweeps.
* Factorization is a dense Cholesky of the (nv,nv) matrix; for the fly
  nv=108, so a batch of envs turns into well-shaped batched linalg.

Spatial vector convention: motion = (angular, linear) at the com-root
origin; force = (torque, force) at the same origin (MuJoCo's c-frame).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def motion_cross(v, u):
    """Spatial motion cross product v x u (both motion vectors)."""
    ang = jnp.cross(v[..., :3], u[..., :3])
    lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v, f):
    """Spatial force cross product v x* f (motion x force)."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def com_vel(m: Model, d: Data) -> Data:
    """mj_comVel: body spatial velocities and cdof time derivatives."""
    dtype = d.qpos.dtype
    cvel = jnp.zeros((m.nbody, 6), dtype=dtype)
    cdof_dot = jnp.zeros((m.nv, 6), dtype=dtype)

    jnt_type = np.asarray(m.jnt_type)
    jnt_dofadr = np.asarray(m.jnt_dofadr)

    for level in m.body_tree:
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        v = cvel[pid]  # (L, 6)
        jntnum = np.asarray(m.body_jntnum)[lev]
        jntadr = np.asarray(m.body_jntadr)[lev]
        for slot in range(int(jntnum.max()) if len(jntnum) else 0):
            has = jntnum > slot
            jid = np.where(has, jntadr + slot, 0)
            jt = np.where(has, jnt_type[jid], -1)
            dadr = jnt_dofadr[jid]

            if (jt == T.FREE).any():
                fm = jnp.asarray(jt == T.FREE)[:, None]
                # translation dofs first: cdof_dot stays zero
                contrib = sum(d.cdof[dadr + k] * d.qvel[dadr + k][:, None]
                              for k in range(3))
                v = jnp.where(fm, v + contrib, v)
                # rotation dofs: cdof_dot = cvel x cdof with translation added
                rot = jnp.zeros_like(v)
                for k in range(3, 6):
                    cd = motion_cross(v, d.cdof[dadr + k])
                    cdof_dot = cdof_dot.at[dadr + k].set(
                        jnp.where(fm, cd, cdof_dot[dadr + k]))
                    rot = rot + d.cdof[dadr + k] * d.qvel[dadr + k][:, None]
                v = jnp.where(fm, v + rot, v)

            for typ, ndof in ((T.BALL, 3), (T.SLIDE, 1), (T.HINGE, 1)):
                if not (jt == typ).any():
                    continue
                tm = jnp.asarray(jt == typ)[:, None]
                contrib = jnp.zeros_like(v)
                for k in range(ndof):
                    cd = motion_cross(v, d.cdof[dadr + k])
                    cdof_dot = cdof_dot.at[dadr + k].set(
                        jnp.where(tm, cd, cdof_dot[dadr + k]))
                    contrib = contrib + (d.cdof[dadr + k]
                                         * d.qvel[dadr + k][:, None])
                v = jnp.where(tm, v + contrib, v)

        cvel = cvel.at[lev].set(v)

    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def crb(m: Model, d: Data) -> Data:
    """mj_crb + mj_factorM: dense joint-space inertia and its Cholesky."""
    crb_inert = d.cinert
    for level in reversed(m.body_tree):
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        crb_inert = crb_inert.at[pid].add(crb_inert[lev])

    body_of_dof = np.asarray(m.dof_bodyid)
    crb_dof = crb_inert[body_of_dof]                      # (nv, 6, 6)
    tmp = jnp.einsum("vij,vj->vi", crb_dof, d.cdof)       # (nv, 6)
    full = tmp @ d.cdof.T                                 # (nv, nv)
    mask = jnp.asarray(np.asarray(m.ancestor_mask))
    lower = jnp.where(mask, full, 0.0)                    # rows i, anc cols j
    qM = lower + lower.T - jnp.diag(jnp.diag(lower))
    qM = qM + jnp.diag(m.dof_armature)
    from flybody_tpu.ops import linalg as LA
    qLD, qLD_scale = LA.cho_factor(qM)
    return d.replace(qM=qM, qLD=qLD, qLD_scale=qLD_scale)


def solve_m(d: Data, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve qM x = rhs using the cached (scaled) Cholesky factor."""
    from flybody_tpu.ops import linalg as LA
    return LA.cho_solve((d.qLD, d.qLD_scale), rhs)


def rne(m: Model, d: Data) -> Data:
    """mj_rne (flg_acc=0): qfrc_bias = C(qpos, qvel)."""
    dtype = d.qpos.dtype
    grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)])
    cacc = jnp.broadcast_to(grav, (m.nbody, 6))

    # forward: cacc[i] = cacc[parent] + cdof_dot * qvel
    dof_contrib = d.cdof_dot * d.qvel[:, None]  # (nv, 6)
    for level in m.body_tree:
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        a = cacc[pid]
        # sum contributions of this body's own dofs
        dofnum = np.asarray(m.body_dofnum)[lev]
        dofadr = np.asarray(m.body_dofadr)[lev]
        for slot in range(int(dofnum.max()) if len(dofnum) else 0):
            has = dofnum > slot
            didx = np.where(has, dofadr + slot, 0)
            a = a + jnp.where(jnp.asarray(has)[:, None],
                              dof_contrib[didx], 0.0)
        cacc = cacc.at[lev].set(a)

    Iv = jnp.einsum("bij,bj->bi", d.cinert, d.cvel)
    cfrc = jnp.einsum("bij,bj->bi", d.cinert, cacc) + force_cross(d.cvel, Iv)

    # backward: accumulate into parents
    for level in reversed(m.body_tree):
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        cfrc = cfrc.at[pid].add(cfrc[lev])

    qfrc_bias = jnp.einsum("vi,vi->v", d.cdof,
                           cfrc[np.asarray(m.dof_bodyid)])
    return d.replace(qfrc_bias=qfrc_bias)


def transmission(m: Model, d: Data) -> Data:
    """mj_transmission for joint/tendon actuators.

    Adhesion (body) transmission depends on contacts and is filled in by
    ``actuation.adhesion_moment`` after collision detection.
    """
    if m.nu == 0:
        return d
    dtype = d.qpos.dtype
    length = jnp.zeros((m.nu,), dtype=dtype)
    moment = jnp.zeros((m.nu, m.nv), dtype=dtype)
    trntype = np.asarray(m.actuator_trntype)
    trnid = np.asarray(m.actuator_trnid)[:, 0]
    gear0 = m.actuator_gear[:, 0]

    jnt_qposadr = np.asarray(m.jnt_qposadr)
    jnt_dofadr = np.asarray(m.jnt_dofadr)

    jnt_mask = trntype == T.TRN_JOINT
    if jnt_mask.any():
        ids = np.nonzero(jnt_mask)[0]
        jids = trnid[ids]
        length = length.at[ids].set(d.qpos[jnt_qposadr[jids]] * gear0[ids])
        moment = moment.at[ids, jnt_dofadr[jids]].set(gear0[ids])

    ten_mask = trntype == T.TRN_TENDON
    if ten_mask.any():
        ids = np.nonzero(ten_mask)[0]
        tids = trnid[ids]
        length = length.at[ids].set(d.ten_length[tids] * gear0[ids])
        moment = moment.at[ids].set(gear0[ids][:, None] * d.ten_moment[tids])

    velocity = moment @ d.qvel
    ten_velocity = (d.ten_moment @ d.qvel) if m.ntendon else d.ten_velocity
    return d.replace(actuator_length=length, actuator_moment=moment,
                     actuator_velocity=velocity, ten_velocity=ten_velocity)
