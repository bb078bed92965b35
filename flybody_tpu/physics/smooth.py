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


_VELPRE_CACHE: dict = {}


def _dof_velpre_pairs(m: Model):
    """Static (i, j) dof pairs: dof j's velocity contribution is part of
    the partial body velocity seen by dof i when forming cdof_dot[i].

    Replicates the sequential mj_comVel semantics (oracle-validated in the
    round-1 engine): j ranges over dofs of strict body ancestors, dofs of
    earlier joints on the same body, and — for the rotational dofs of a
    free joint — the translational dofs of that same joint."""
    key = T.static_key(m.dof_bodyid, m.jnt_type, m.jnt_dofadr,
                       m.body_parentid, m.body_jntadr, m.body_jntnum)
    if key in _VELPRE_CACHE:
        return _VELPRE_CACHE[key]
    jnt_type = np.asarray(m.jnt_type)
    jnt_dofadr = np.asarray(m.jnt_dofadr)
    body_parent = np.asarray(m.body_parentid)
    body_jntadr = np.asarray(m.body_jntadr)
    body_jntnum = np.asarray(m.body_jntnum)

    def joint_dofs(j):
        n = {T.FREE: 6, T.BALL: 3, T.SLIDE: 1, T.HINGE: 1}[int(jnt_type[j])]
        return list(range(jnt_dofadr[j], jnt_dofadr[j] + n))

    body_own = {b: [joint_dofs(j)
                    for j in range(body_jntadr[b],
                                   body_jntadr[b] + body_jntnum[b])]
                for b in range(m.nbody)}

    ii, jj = [], []
    for b in range(1, m.nbody):
        # strict ancestors' dofs
        anc_dofs = []
        cur = body_parent[b]
        while cur != 0:
            anc_dofs = sum(body_own[cur], []) + anc_dofs
            cur = body_parent[cur]
        seen = list(anc_dofs)
        for j in range(body_jntadr[b], body_jntadr[b] + body_jntnum[b]):
            dofs = joint_dofs(j)
            if int(jnt_type[j]) == T.FREE:
                trans, rot = dofs[:3], dofs[3:]
                for i in rot:
                    for jd in seen + trans:
                        ii.append(i); jj.append(jd)
                # translational cdof_dot stays zero
            else:
                for i in dofs:
                    for jd in seen:
                        ii.append(i); jj.append(jd)
            seen = seen + dofs
    pairs = (np.asarray(ii, np.int32), np.asarray(jj, np.int32))
    _VELPRE_CACHE[key] = pairs
    return pairs


_VELPRE_MAT_CACHE: dict = {}


def _velpre_matrix(m: Model, dtype):
    """(nv, nv) 0/1 matrix of the static partial-velocity pair set.

    Keyed on the same statics as _dof_velpre_pairs: two models can share
    a body tree but differ in dofs (tethered vs free fly), so keying on
    body_parentid alone poisons the cache across envs."""
    key = T.static_key(m.dof_bodyid, m.jnt_type, m.jnt_dofadr,
                       m.body_parentid, m.body_jntadr, m.body_jntnum)
    if key not in _VELPRE_MAT_CACHE:
        ii, jj = _dof_velpre_pairs(m)
        P = np.zeros((m.nv, m.nv), np.float32)
        P[ii, jj] = 1.0
        _VELPRE_MAT_CACHE[key] = P
    return jnp.asarray(_VELPRE_MAT_CACHE[key], dtype)


def com_vel(m: Model, d: Data) -> Data:
    """mj_comVel: body spatial velocities and cdof time derivatives.

    Fully parallel: cvel via static (body, dof) support pairs; cdof_dot
    via the static partial-velocity pair set (no sequential tree sweep)."""
    from flybody_tpu.physics.passive import support_matrix
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    dof_vel = d.cdof * d.qvel[:, None, :]            # (nv, 6, B)

    import jax
    S = support_matrix(m, dtype)
    cvel = jnp.einsum("bv,vcB->bcB", S, dof_vel,
                      precision=jax.lax.Precision.HIGHEST)

    ii, jj = _dof_velpre_pairs(m)
    P = _velpre_matrix(m, dtype)
    vpre = jnp.einsum("iv,vcB->icB", P, dof_vel,
                      precision=jax.lax.Precision.HIGHEST)
    cdof_dot = motion_cross(vpre, d.cdof)
    # translational free-joint dofs have no vpre pairs and zero cross with
    # themselves is not guaranteed — mask dofs with no contributing pairs
    has_pre = np.zeros(m.nv, dtype=bool)
    has_pre[np.unique(ii)] = True
    cdof_dot = jnp.where(jnp.asarray(has_pre)[:, None, None], cdof_dot, 0.0)
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def crb(m: Model, d: Data) -> Data:
    """mj_crb + mj_factorM: compressed tree-sparse inertia + LDL^T.

    Factors BOTH M and (M + h diag(damping)) in one stacked elimination
    pass — the Euler implicit-damping factor (forward.euler) shares the
    sparsity pattern and schedule, so stacking halves the level-sweep
    launches of the two per-substep factorizations."""
    from flybody_tpu.physics.kinematics import mul_inertia
    from flybody_tpu.physics.sensors import subtree_sum
    crb_inert = subtree_sum(m, d.cinert)

    body_of_dof = np.asarray(m.dof_bodyid)
    crb_dof = crb_inert[body_of_dof]            # (nv, 10, B)
    tmp = mul_inertia(crb_dof, d.cdof)          # (nv, 6, B)

    tree = m.tree
    ei = np.asarray(tree.entry_i)
    ej = np.asarray(tree.entry_j)
    # M[e] = cdof[j_e] . tmp[i_e]  (i's composite inertia, shared ancestor j)
    qM = jnp.sum(tmp[ei] * d.cdof[ej], axis=-2)          # (nM, B)
    qM = qM.at[np.asarray(tree.diag_entry)].add(
        m.dof_armature[:, None])
    h = m.opt.timestep.astype(qM.dtype)
    MhB = qM.at[np.asarray(tree.diag_entry)].add(
        h * m.dof_damping.astype(qM.dtype)[:, None])
    both = jnp.stack([qM, MhB], axis=1)                  # (nM, 2, B)
    LD2, Dinv2 = TL.factor(tree, both)
    return d.replace(qM=qM, qLD=LD2[:, 0], qLDiagInv=Dinv2[:, 0],
                     qLDh=LD2[:, 1], qLDiagInvh=Dinv2[:, 1])


def solve_m(m: Model, d: Data, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve qM x = rhs using the cached sparse factor. rhs (nv, ...B)."""
    return TL.solve(m.tree, d.qLD, d.qLDiagInv, rhs)


def mul_m(m: Model, d: Data, v: jnp.ndarray) -> jnp.ndarray:
    """qM @ v with the compressed matrix."""
    return TL.matmul(m.tree, d.qM, v)


def body_cacc(m: Model, d: Data, dof_contrib: jnp.ndarray) -> jnp.ndarray:
    """(nbody, 6, B) body accelerations: gravity + sum of per-dof
    contributions over each body's supporting dofs — one static
    scatter-add over the ~500 (body, dof) support pairs instead of a
    sequential tree sweep."""
    from flybody_tpu.physics.passive import support_matrix
    import jax
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    grav = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)])
    S = support_matrix(m, dtype)
    acc = jnp.einsum("bv,vcB->bcB", S, dof_contrib,
                     precision=jax.lax.Precision.HIGHEST)
    return grav[None, :, None] + acc


def rne(m: Model, d: Data) -> Data:
    """mj_rne (flg_acc=0): qfrc_bias = C(qpos, qvel).

    Both tree sweeps are flattened into static support-pair gathers:
    cacc via ``body_cacc``; the backward force accumulation disappears into
    qfrc_bias[v] = sum over supported bodies of cdof[v] . cfrc_leaf[b]."""
    from flybody_tpu.physics.passive import project_body_forces
    dof_contrib = d.cdof_dot * d.qvel[:, None, :]   # (nv, 6, B)
    cacc = body_cacc(m, d, dof_contrib)

    from flybody_tpu.physics.kinematics import mul_inertia
    Iv = mul_inertia(d.cinert, d.cvel)
    cfrc = mul_inertia(d.cinert, cacc) + force_cross(d.cvel, Iv)

    qfrc_bias = project_body_forces(m, d, cfrc)
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
