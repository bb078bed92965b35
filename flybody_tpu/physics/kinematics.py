"""Forward kinematics, com-frame quantities, and fixed tendons (batched).

TPU-first design: the kinematic tree is processed *level-parallel* — all
bodies at the same depth are updated in one batched quaternion pass, so the
sequential depth of FK is the tree height (~10 for the fly), not nbody (67).
All indices are static numpy, so XLA sees only fixed gathers/scatters; every
level update is a wide elementwise op over the trailing env batch.

Semantics match MuJoCo's mj_kinematics / mj_comPos / mj_tendon for the
supported joint set (free/ball/slide/hinge); validated against the MuJoCo
oracle in tests/test_physics_kinematics.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def kinematics(m: Model, d: Data) -> Data:
    """mj_kinematics: body/geom/site frames from qpos.

    Level-parallel with ROLLING CONCATENATION: each level's frames are
    appended to a growing level-ordered buffer (one concat per level)
    instead of being scattered into full-size arrays — the per-level
    scatter/gather chains were a latency bottleneck. A single static
    permutation restores body order at the end.
    """
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    nb = m.nbody

    jnt_type = np.asarray(m.jnt_type)
    jnt_qposadr = np.asarray(m.jnt_qposadr)

    mb = lambda x: x[..., None]  # broadcast model params over batch

    # level-ordered layout: world (0) first, then tree levels in order
    order_flat = np.concatenate([np.array([0])]
                                + [np.asarray(l) for l in m.body_tree])
    pos_of_body = np.empty(nb, dtype=np.int64)
    pos_of_body[order_flat] = np.arange(nb)

    buf_pos = jnp.zeros((1, 3, B), dtype=dtype)
    buf_quat = jnp.zeros((1, 4, B), dtype=dtype).at[:, 0].set(1.0)
    anchors, axes, jids_all, valid_all = [], [], [], []

    for level in m.body_tree:
        lev = np.asarray(level)
        pid = pos_of_body[np.asarray(m.body_parentid)[lev]]
        p_pos, p_quat = buf_pos[pid], buf_quat[pid]
        pos = p_pos + bq.rotate(mb(m.body_pos[lev]), p_quat)
        quat = bq.mult(p_quat, mb(m.body_quat[lev]))

        jntnum = np.asarray(m.body_jntnum)[lev]
        jntadr = np.asarray(m.body_jntadr)[lev]
        max_slots = int(jntnum.max()) if len(jntnum) else 0
        for slot in range(max_slots):
            has = jntnum > slot
            jid = np.where(has, jntadr + slot, 0)  # 0 = safe pad
            jt = np.where(has, jnt_type[jid], -1)
            qadr = jnt_qposadr[jid]

            is_free = jt == T.FREE
            is_ball = jt == T.BALL
            is_slide = jt == T.SLIDE
            is_hinge = jt == T.HINGE
            any_rot = is_ball | is_hinge

            anchor = jnp.zeros((len(lev), 3, B), dtype)
            axis_w = jnp.zeros((len(lev), 3, B), dtype)

            if is_free.any():
                q3 = d.qpos[qadr[:, None] + np.arange(3)]     # (L, 3, B)
                q4 = d.qpos[qadr[:, None] + np.arange(3, 7)]  # (L, 4, B)
                fm = jnp.asarray(is_free)[:, None, None]
                pos = jnp.where(fm, q3, pos)
                quat = jnp.where(fm, q4, quat)
                anchor = jnp.where(fm, q3, anchor)
                zax = jnp.zeros((len(jid), 3, B), dtype).at[:, 2].set(1.0)
                axis_w = jnp.where(fm, zax, axis_w)

            if (is_ball | is_slide | is_hinge).any():
                jpos = mb(m.jnt_pos[jid])
                jaxis = mb(m.jnt_axis[jid])
                anc = pos + bq.rotate(jpos, quat)
                axw = bq.rotate(jaxis, quat)

                if is_slide.any():
                    delta = d.qpos[qadr] - m.qpos0[qadr][:, None]  # (L, B)
                    pos = jnp.where(jnp.asarray(is_slide)[:, None, None],
                                    pos + axw * delta[:, None, :], pos)

                if any_rot.any():
                    angle = d.qpos[qadr] - m.qpos0[qadr][:, None]
                    qloc_h = bq.axis_angle(jaxis, angle)
                    qloc_b = d.qpos[qadr[:, None] + np.arange(4)]
                    qloc = jnp.where(jnp.asarray(is_ball)[:, None, None],
                                     qloc_b, qloc_h)
                    new_quat = bq.mult(quat, qloc)
                    new_pos = anc - bq.rotate(jpos, new_quat)
                    am = jnp.asarray(any_rot)[:, None, None]
                    quat = jnp.where(am, new_quat, quat)
                    pos = jnp.where(am, new_pos, pos)

                mask = jnp.asarray(
                    is_ball | is_slide | is_hinge)[:, None, None]
                anchor = jnp.where(mask, anc, anchor)
                axis_w = jnp.where(mask, axw, axis_w)

            anchors.append(anchor)
            axes.append(axis_w)
            jids_all.append(jid)
            valid_all.append(has & (jt >= 0))

        # normalize quats once per level to keep long chains stable
        quat = quat / jnp.linalg.norm(quat, axis=-2, keepdims=True)
        buf_pos = jnp.concatenate([buf_pos, pos], axis=0)
        buf_quat = jnp.concatenate([buf_quat, quat], axis=0)

    # restore body order with one static permutation
    xpos = buf_pos[pos_of_body]
    xquat = buf_quat[pos_of_body]

    # joint anchors/axes: one concat + one static scatter over valid slots
    xanchor = jnp.zeros((m.njnt, 3, B), dtype=dtype)
    xaxis = jnp.zeros((m.njnt, 3, B), dtype=dtype)
    if jids_all:
        jcat = np.concatenate(jids_all)
        vcat = np.concatenate(valid_all)
        acat = jnp.concatenate(anchors, axis=0)
        xcat = jnp.concatenate(axes, axis=0)
        xanchor = xanchor.at[jcat[vcat]].set(acat[vcat])
        xaxis = xaxis.at[jcat[vcat]].set(xcat[vcat])

    xmat = bq.to_mat(xquat)
    mb = lambda x: x[..., None]
    xipos = xpos + bq.rotate(mb(m.body_ipos), xquat)
    ximat = bq.matmat(xmat, bq.to_mat(mb(m.body_iquat)))

    gb = np.asarray(m.geom_bodyid)
    geom_xpos = xpos[gb] + bq.rotate(mb(m.geom_pos), xquat[gb])
    geom_xmat = bq.matmat(xmat[gb], bq.to_mat(mb(m.geom_quat)))
    sb = np.asarray(m.site_bodyid)
    site_xpos = xpos[sb] + bq.rotate(mb(m.site_pos), xquat[sb])
    site_xmat = bq.matmat(xmat[sb], bq.to_mat(mb(m.site_quat)))

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def _skew(v):
    """(..., 3, B) -> (..., 3, 3, B)."""
    zero = jnp.zeros_like(v[..., 0, :])
    vx, vy, vz = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    return jnp.stack([
        jnp.stack([zero, -vz, vy], axis=-2),
        jnp.stack([vz, zero, -vx], axis=-2),
        jnp.stack([-vy, vx, zero], axis=-2),
    ], axis=-3)


def spatial_inertia(m: Model, d: Data) -> jnp.ndarray:
    """(nbody, 10, B) COMPACT spatial inertia at the com-root origin, in
    MuJoCo's own cinert layout: [Ixx Iyy Izz Ixy Ixz Iyz, mc(3), m].

    The compact form keeps the CRB/RNE products as a handful of fused
    elementwise ops — the explicit (6, 6) matrix build (and the layout
    copies XLA inserted around it) was ~15% of the round-2 substep.
    Convention: motion vectors are (angular, linear);
    force = (torque, force) about the same origin (see mul_inertia).
    """
    root = np.asarray(m.body_rootid)
    com_root = d.subtree_com[root]
    c = d.xipos - com_root                       # (nbody, 3, B)
    R = d.ximat                                  # (nbody, 3, 3, B)
    Ic = m.body_inertia[:, None, :, None]        # (nbody, 1, 3, 1)
    mass = m.body_mass[:, None, None]            # (nbody, 1, 1)
    # I_O[i, j] = sum_k Ic_k R[i, k] R[j, k] + m (|c|^2 d_ij - c_i c_j)
    RI = R * Ic                                  # (nbody, 3, 3, B)
    c2 = jnp.sum(c * c, axis=-2, keepdims=True)  # (nbody, 1, B)

    def entry(i, j):
        val = jnp.sum(RI[:, i] * R[:, j], axis=-2)
        if i == j:
            val = val + mass[..., 0] * (c2[:, 0] - c[:, i] * c[:, j])
        else:
            val = val - mass[..., 0] * c[:, i] * c[:, j]
        return val

    comps = [entry(0, 0), entry(1, 1), entry(2, 2),
             entry(0, 1), entry(0, 2), entry(1, 2)]
    h = mass * c                                 # (nbody, 3, B)
    return jnp.concatenate(
        [jnp.stack(comps, axis=1), h,
         jnp.broadcast_to(mass, c[:, :1].shape)], axis=1)


def mul_inertia(cin: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Compact spatial inertia product: (..., 10, B) x (..., 6, B) motion
    -> (..., 6, B) force (torque, force)."""
    Ixx, Iyy, Izz = cin[..., 0, :], cin[..., 1, :], cin[..., 2, :]
    Ixy, Ixz, Iyz = cin[..., 3, :], cin[..., 4, :], cin[..., 5, :]
    h = cin[..., 6:9, :]
    mass = cin[..., 9:10, :]
    w = v[..., :3, :]
    u = v[..., 3:, :]
    wx, wy, wz = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    Iw = jnp.stack([Ixx * wx + Ixy * wy + Ixz * wz,
                    Ixy * wx + Iyy * wy + Iyz * wz,
                    Ixz * wx + Iyz * wy + Izz * wz], axis=-2)
    torque = Iw + bq.cross(h, u)
    force = mass * u - bq.cross(h, w)
    return jnp.concatenate([torque, force], axis=-2)


def com_pos(m: Model, d: Data) -> Data:
    """mj_comPos: subtree com, spatial inertias, com-frame dof axes."""
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    from flybody_tpu.physics.sensors import subtree_sum
    mom = m.body_mass[:, None, None] * d.xipos
    acc = subtree_sum(m, mom)
    denom = jnp.maximum(m.body_subtreemass, 1e-12)[:, None, None]
    subtree_com = acc / denom
    d = d.replace(subtree_com=subtree_com)

    cinert = spatial_inertia(m, d)

    # cdof
    jnt_of_dof = np.asarray(m.dof_jntid)
    body_of_dof = np.asarray(m.dof_bodyid)
    jt = np.asarray(m.jnt_type)[jnt_of_dof]
    root = np.asarray(m.body_rootid)[body_of_dof]
    com = subtree_com[root]                      # (nv, 3, B)
    anchor = d.xanchor[jnt_of_dof]
    axis = d.xaxis[jnt_of_dof]
    xmat_b = d.xmat[body_of_dof]                 # (nv, 3, 3, B)

    dofadr = np.asarray(m.jnt_dofadr)[jnt_of_dof]
    k = np.arange(m.nv) - dofadr

    is_free_trans = (jt == T.FREE) & (k < 3)
    is_rot_local = (jt == T.BALL) | ((jt == T.FREE) & (k >= 3))
    is_slide = jt == T.SLIDE
    is_hinge = jt == T.HINGE

    e_world = jnp.asarray(np.eye(3)[np.clip(k, 0, 2)],
                          dtype=dtype)[..., None]          # (nv, 3, 1)
    local_col = np.clip(np.where(jt == T.FREE, k - 3, k), 0, 2)
    e_local = xmat_b[np.arange(m.nv), :, local_col]        # (nv, 3, B)

    rot_axis = jnp.where(jnp.asarray(is_hinge)[:, None, None], axis, e_local)
    rot_anchor = jnp.where(jnp.asarray(is_hinge)[:, None, None], anchor,
                           d.xpos[body_of_dof])
    ang = jnp.where(jnp.asarray(is_rot_local | is_hinge)[:, None, None],
                    rot_axis, jnp.zeros_like(axis))
    lin_rot = bq.cross(rot_axis, com - rot_anchor)
    lin = jnp.where(jnp.asarray(is_rot_local | is_hinge)[:, None, None],
                    lin_rot,
                    jnp.where(jnp.asarray(is_slide)[:, None, None], axis,
                              jnp.broadcast_to(e_world, axis.shape)))
    del is_free_trans
    cdof = jnp.concatenate([ang, lin], axis=-2)            # (nv, 6, B)
    return d.replace(cdof=cdof, cinert=cinert)


def tendon(m: Model, d: Data) -> Data:
    """Fixed tendons: length = sum coef * qpos_joint (static sparse map)."""
    if m.ntendon == 0:
        return d
    ten_adr = np.asarray(m.ten_adr)
    ten_num = np.asarray(m.ten_num)
    wrap_jnt = np.asarray(m.wrap_jntid)
    qposadr = np.asarray(m.jnt_qposadr)
    # flattened (wrap entry -> tendon) segment map
    seg = np.concatenate([np.full(ten_num[t], t) for t in range(m.ntendon)])
    widx = np.concatenate([np.arange(ten_adr[t], ten_adr[t] + ten_num[t])
                           for t in range(m.ntendon)])
    coefs = m.wrap_coef.reshape(-1)[widx][:, None]
    vals = coefs * d.qpos[qposadr[wrap_jnt[widx]]]   # (nwrapused, B)
    length = jnp.zeros((m.ntendon, d.qpos.shape[-1]),
                       d.qpos.dtype).at[seg].add(vals)
    return d.replace(ten_length=length)


def ten_moment_apply(m: Model, d: Data, frc: jnp.ndarray) -> jnp.ndarray:
    """qfrc (nv, B) from per-tendon forces frc (ntendon, B) via the static
    fixed-tendon moment map (replaces the dense (ntendon, nv) matrix)."""
    ten_adr = np.asarray(m.ten_adr)
    ten_num = np.asarray(m.ten_num)
    wrap_jnt = np.asarray(m.wrap_jntid)
    dofadr = np.asarray(m.jnt_dofadr)
    seg = np.concatenate([np.full(ten_num[t], t) for t in range(m.ntendon)])
    widx = np.concatenate([np.arange(ten_adr[t], ten_adr[t] + ten_num[t])
                           for t in range(m.ntendon)])
    coefs = m.wrap_coef.reshape(-1)[widx][:, None]
    out = jnp.zeros_like(d.qvel)
    return out.at[dofadr[wrap_jnt[widx]]].add(coefs * frc[seg])


def ten_velocity_of(m: Model, d: Data) -> jnp.ndarray:
    """(ntendon, B) tendon velocities via the static moment map."""
    ten_adr = np.asarray(m.ten_adr)
    ten_num = np.asarray(m.ten_num)
    wrap_jnt = np.asarray(m.wrap_jntid)
    dofadr = np.asarray(m.jnt_dofadr)
    seg = np.concatenate([np.full(ten_num[t], t) for t in range(m.ntendon)])
    widx = np.concatenate([np.arange(ten_adr[t], ten_adr[t] + ten_num[t])
                           for t in range(m.ntendon)])
    coefs = m.wrap_coef.reshape(-1)[widx][:, None]
    vals = coefs * d.qvel[dofadr[wrap_jnt[widx]]]
    return jnp.zeros((m.ntendon, d.qvel.shape[-1]),
                     d.qvel.dtype).at[seg].add(vals)
