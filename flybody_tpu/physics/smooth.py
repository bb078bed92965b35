"""Smooth (unconstrained) dynamics: velocities, mass matrix, bias forces.

Matches MuJoCo's mj_comVel / mj_crb / mj_rne / mj_transmission semantics for
the supported feature set, batch-native (trailing env axis):

* The CRB composite inertias are accumulated level-parallel up the tree and
  the joint-space inertia matrix is assembled DIRECTLY IN COMPRESSED FORM
  over the kinematic-tree sparsity pattern (Model.tree): one gather over the
  586 nonzero (i, j) ancestor pairs instead of a dense (nv, nv) product.
* Factorization is the level-parallel sparse LDL^T of ops/tree_ldl — the
  TPU-native analog of MuJoCo's mj_factorM (~87x fewer FLOPs than dense
  Cholesky for the fly, no (nv, nv, B) traffic).
* The bias force (RNE) uses the same level-parallel forward/backward sweeps.

Spatial vector convention: motion = (angular, linear) at the com-root
origin; force = (torque, force) at the same origin (MuJoCo's c-frame).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.ops import tree_ldl as TL
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def motion_cross(v, u):
    """Spatial motion cross product v x u; (..., 6, B) inputs."""
    ang = bq.cross(v[..., :3, :], u[..., :3, :])
    lin = (bq.cross(v[..., :3, :], u[..., 3:, :])
           + bq.cross(v[..., 3:, :], u[..., :3, :]))
    return jnp.concatenate([ang, lin], axis=-2)


def force_cross(v, f):
    """Spatial force cross product v x* f (motion x force)."""
    ang = (bq.cross(v[..., :3, :], f[..., :3, :])
           + bq.cross(v[..., 3:, :], f[..., 3:, :]))
    lin = bq.cross(v[..., :3, :], f[..., 3:, :])
    return jnp.concatenate([ang, lin], axis=-2)


def com_vel(m: Model, d: Data) -> Data:
    """mj_comVel: body spatial velocities and cdof time derivatives."""
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    cvel = jnp.zeros((m.nbody, 6, B), dtype=dtype)
    cdof_dot = jnp.zeros((m.nv, 6, B), dtype=dtype)

    jnt_type = np.asarray(m.jnt_type)
    jnt_dofadr = np.asarray(m.jnt_dofadr)

    for level in m.body_tree:
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        v = cvel[pid]  # (L, 6, B)
        jntnum = np.asarray(m.body_jntnum)[lev]
        jntadr = np.asarray(m.body_jntadr)[lev]
        for slot in range(int(jntnum.max()) if len(jntnum) else 0):
            has = jntnum > slot
            jid = np.where(has, jntadr + slot, 0)
            jt = np.where(has, jnt_type[jid], -1)
            dadr = jnt_dofadr[jid]

            if (jt == T.FREE).any():
                fm = jnp.asarray(jt == T.FREE)[:, None, None]
                contrib = sum(d.cdof[dadr + k] * d.qvel[dadr + k][:, None, :]
                              for k in range(3))
                v = jnp.where(fm, v + contrib, v)
                rot = jnp.zeros_like(v)
                for k in range(3, 6):
                    cd = motion_cross(v, d.cdof[dadr + k])
                    cdof_dot = cdof_dot.at[dadr + k].set(
                        jnp.where(fm, cd, cdof_dot[dadr + k]))
                    rot = rot + d.cdof[dadr + k] * d.qvel[dadr + k][:, None, :]
                v = jnp.where(fm, v + rot, v)

            for typ, ndof in ((T.BALL, 3), (T.SLIDE, 1), (T.HINGE, 1)):
                if not (jt == typ).any():
                    continue
                tm = jnp.asarray(jt == typ)[:, None, None]
                contrib = jnp.zeros_like(v)
                for k in range(ndof):
                    cd = motion_cross(v, d.cdof[dadr + k])
                    cdof_dot = cdof_dot.at[dadr + k].set(
                        jnp.where(tm, cd, cdof_dot[dadr + k]))
                    contrib = contrib + (d.cdof[dadr + k]
                                         * d.qvel[dadr + k][:, None, :])
                v = jnp.where(tm, v + contrib, v)

        cvel = cvel.at[lev].set(v)

    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def crb(m: Model, d: Data) -> Data:
    """mj_crb + mj_factorM: compressed tree-sparse inertia + LDL^T."""
    crb_inert = d.cinert                        # (nbody, 6, 6, B)
    for level in reversed(m.body_tree):
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        crb_inert = crb_inert.at[pid].add(crb_inert[lev])

    body_of_dof = np.asarray(m.dof_bodyid)
    crb_dof = crb_inert[body_of_dof]            # (nv, 6, 6, B)
    tmp = jnp.einsum("vijB,vjB->viB", crb_dof, d.cdof)  # (nv, 6, B)

    tree = m.tree
    ei = np.asarray(tree.entry_i)
    ej = np.asarray(tree.entry_j)
    # M[e] = cdof[j_e] . tmp[i_e]  (i's composite inertia, shared ancestor j)
    qM = jnp.sum(tmp[ei] * d.cdof[ej], axis=-2)          # (nM, B)
    qM = qM.at[np.asarray(tree.diag_entry)].add(
        m.dof_armature[:, None])
    qLD, qLDiagInv = TL.factor(tree, qM)
    return d.replace(qM=qM, qLD=qLD, qLDiagInv=qLDiagInv)


def solve_m(m: Model, d: Data, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve qM x = rhs using the cached sparse factor. rhs (nv, ...B)."""
    return TL.solve(m.tree, d.qLD, d.qLDiagInv, rhs)


def mul_m(m: Model, d: Data, v: jnp.ndarray) -> jnp.ndarray:
    """qM @ v with the compressed matrix."""
    return TL.matmul(m.tree, d.qM, v)


def rne(m: Model, d: Data) -> Data:
    """mj_rne (flg_acc=0): qfrc_bias = C(qpos, qvel)."""
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)])
    cacc = jnp.broadcast_to(grav[:, None], (m.nbody, 6, B))

    dof_contrib = d.cdof_dot * d.qvel[:, None, :]   # (nv, 6, B)
    for level in m.body_tree:
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        a = cacc[pid]
        dofnum = np.asarray(m.body_dofnum)[lev]
        dofadr = np.asarray(m.body_dofadr)[lev]
        for slot in range(int(dofnum.max()) if len(dofnum) else 0):
            has = dofnum > slot
            didx = np.where(has, dofadr + slot, 0)
            a = a + jnp.where(jnp.asarray(has)[:, None, None],
                              dof_contrib[didx], 0.0)
        cacc = cacc.at[lev].set(a)

    Iv = jnp.einsum("bijB,bjB->biB", d.cinert, d.cvel)
    cfrc = (jnp.einsum("bijB,bjB->biB", d.cinert, cacc)
            + force_cross(d.cvel, Iv))

    for level in reversed(m.body_tree):
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        cfrc = cfrc.at[pid].add(cfrc[lev])

    qfrc_bias = jnp.sum(d.cdof * cfrc[np.asarray(m.dof_bodyid)], axis=-2)
    return d.replace(qfrc_bias=qfrc_bias)


def transmission(m: Model, d: Data) -> Data:
    """mj_transmission for joint/tendon actuators (static moment maps;
    the dense (nu, nv) moment matrix of the round-1 engine is gone).

    Adhesion (body) transmission depends on contacts and is handled inside
    ``actuation`` after collision detection.
    """
    if m.nu == 0:
        return d
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    length = jnp.zeros((m.nu, B), dtype=dtype)
    velocity = jnp.zeros((m.nu, B), dtype=dtype)
    trntype = np.asarray(m.actuator_trntype)
    trnid = np.asarray(m.actuator_trnid)[:, 0]
    gear0 = m.actuator_gear[:, 0]

    jnt_qposadr = np.asarray(m.jnt_qposadr)
    jnt_dofadr = np.asarray(m.jnt_dofadr)

    jnt_mask = trntype == T.TRN_JOINT
    if jnt_mask.any():
        ids = np.nonzero(jnt_mask)[0]
        jids = trnid[ids]
        length = length.at[ids].set(d.qpos[jnt_qposadr[jids]]
                                    * gear0[ids][:, None])
        velocity = velocity.at[ids].set(d.qvel[jnt_dofadr[jids]]
                                        * gear0[ids][:, None])

    ten_velocity = d.ten_velocity
    ten_mask = trntype == T.TRN_TENDON
    if ten_mask.any():
        from flybody_tpu.physics import kinematics as K
        ten_velocity = K.ten_velocity_of(m, d)
        ids = np.nonzero(ten_mask)[0]
        tids = trnid[ids]
        length = length.at[ids].set(d.ten_length[tids] * gear0[ids][:, None])
        velocity = velocity.at[ids].set(ten_velocity[tids]
                                        * gear0[ids][:, None])

    return d.replace(actuator_length=length, actuator_velocity=velocity,
                     ten_velocity=ten_velocity)
