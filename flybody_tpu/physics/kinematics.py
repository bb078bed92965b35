"""Forward kinematics, com-frame quantities, and fixed tendons.

TPU-first design: the kinematic tree is processed *level-parallel* — all
bodies at the same depth are updated in one batched quaternion pass, so the
sequential depth of FK is the tree height (~10 for the fly), not nbody (67).
All indices are static numpy, so XLA sees only fixed gathers/scatters; under
``vmap`` every level update becomes a wide elementwise op over envs*bodies.

Semantics match MuJoCo's mj_kinematics / mj_comPos / mj_tendon for the
supported joint set (free/ball/slide/hinge); validated against the MuJoCo
oracle in tests/test_physics_kinematics.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def _rot(vec, quat):
    return mq.rotate_vec_with_quat(vec, quat)


def kinematics(m: Model, d: Data) -> Data:
    """mj_kinematics: body/geom/site frames from qpos."""
    dtype = d.qpos.dtype
    nb = m.nbody
    xpos = jnp.zeros((nb, 3), dtype=dtype)
    xquat = jnp.zeros((nb, 4), dtype=dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((m.njnt, 3), dtype=dtype)
    xaxis = jnp.zeros((m.njnt, 3), dtype=dtype)

    jnt_type = np.asarray(m.jnt_type)
    jnt_qposadr = np.asarray(m.jnt_qposadr)

    for level in m.body_tree:
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        p_pos, p_quat = xpos[pid], xquat[pid]
        pos = p_pos + _rot(m.body_pos[lev], p_quat)
        quat = mq.mult_quat(p_quat, m.body_quat[lev])

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

            # --- free: qpos directly sets the frame ---
            if is_free.any():
                q3 = jnp.stack([d.qpos[qadr], d.qpos[qadr + 1],
                                d.qpos[qadr + 2]], axis=-1)
                q4 = jnp.stack([d.qpos[qadr + 3], d.qpos[qadr + 4],
                                d.qpos[qadr + 5], d.qpos[qadr + 6]], axis=-1)
                fm = is_free[:, None]
                pos = jnp.where(fm, q3, pos)
                quat = jnp.where(fm, q4, quat)
                xanchor = xanchor.at[jid].set(
                    jnp.where(fm, q3, xanchor[jid]))
                xaxis = xaxis.at[jid].set(
                    jnp.where(fm, jnp.asarray([0., 0., 1.], dtype),
                              xaxis[jid]))

            if not (is_ball | is_slide | is_hinge).any():
                continue

            jpos = m.jnt_pos[jid]
            jaxis = m.jnt_axis[jid]
            anchor = pos + _rot(jpos, quat)
            axis_w = _rot(jaxis, quat)

            # slide: translate along world axis
            if is_slide.any():
                delta = d.qpos[qadr] - m.qpos0[qadr]
                pos = jnp.where(is_slide[:, None],
                                pos + axis_w * delta[:, None], pos)

            # hinge / ball: local rotation, re-anchored
            if any_rot.any():
                angle = d.qpos[qadr] - m.qpos0[qadr]
                qloc_h = mq.axis_angle_to_quat(jaxis, angle)
                qloc_b = jnp.stack(
                    [d.qpos[qadr], d.qpos[qadr + 1],
                     d.qpos[qadr + 2], d.qpos[qadr + 3]], axis=-1)
                qloc = jnp.where(is_ball[:, None], qloc_b, qloc_h)
                new_quat = mq.mult_quat(quat, qloc)
                new_pos = anchor - _rot(jpos, new_quat)
                am = any_rot[:, None]
                quat = jnp.where(am, new_quat, quat)
                pos = jnp.where(am, new_pos, pos)

            mask = (is_ball | is_slide | is_hinge)[:, None]
            xanchor = xanchor.at[jid].set(
                jnp.where(mask, anchor, xanchor[jid]))
            xaxis = xaxis.at[jid].set(jnp.where(mask, axis_w, xaxis[jid]))

        # normalize quats once per level to keep long chains stable
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        xpos = xpos.at[lev].set(pos)
        xquat = xquat.at[lev].set(quat)

    xmat = mq.quat_to_mat(xquat)
    xipos = xpos + _rot(m.body_ipos, xquat)
    ximat = xmat @ mq.quat_to_mat(m.body_iquat)

    gb = np.asarray(m.geom_bodyid)
    geom_xpos = xpos[gb] + _rot(m.geom_pos, xquat[gb])
    geom_xmat = xmat[gb] @ mq.quat_to_mat(m.geom_quat)
    sb = np.asarray(m.site_bodyid)
    site_xpos = xpos[sb] + _rot(m.site_pos, xquat[sb])
    site_xmat = xmat[sb] @ mq.quat_to_mat(m.site_quat)

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def spatial_inertia(m: Model, d: Data) -> jnp.ndarray:
    """(nbody, 6, 6) spatial inertia of each body at its com-root origin.

    Convention: motion vectors are (angular, linear); the spatial inertia
    maps v -> force (torque, force) about the same origin.
    """
    root = np.asarray(m.body_rootid)
    com_root = d.subtree_com[root]
    c = d.xipos - com_root  # offset of body com from frame origin
    R = d.ximat
    I3 = R @ (m.body_inertia[..., None] * jnp.swapaxes(R, -1, -2))
    mass = m.body_mass[:, None, None]
    cx = _skew(c)
    top_left = I3 + mass * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = mass * cx
    bot_left = mass * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=c.dtype), cx.shape)
    bot_right = mass * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ], axis=-2)


def com_pos(m: Model, d: Data) -> Data:
    """mj_comPos: subtree com, spatial inertias, com-frame dof axes."""
    dtype = d.qpos.dtype
    # subtree com: backward accumulation over levels
    acc = m.body_mass[:, None] * d.xipos
    for level in reversed(m.body_tree):
        lev = np.asarray(level)
        pid = np.asarray(m.body_parentid)[lev]
        acc = acc.at[pid].add(acc[lev])
    denom = jnp.maximum(m.body_subtreemass, 1e-12)[:, None]
    subtree_com = acc / denom  # world row = com of everything, as in MuJoCo
    d = d.replace(subtree_com=subtree_com)

    cinert = spatial_inertia(m, d)

    # cdof
    jnt_of_dof = np.asarray(m.dof_jntid)
    body_of_dof = np.asarray(m.dof_bodyid)
    jt = np.asarray(m.jnt_type)[jnt_of_dof]
    root = np.asarray(m.body_rootid)[body_of_dof]
    com = subtree_com[root]
    anchor = d.xanchor[jnt_of_dof]
    axis = d.xaxis[jnt_of_dof]
    xmat_b = d.xmat[body_of_dof]

    # per-dof index within its joint (0..5 for free, 0..2 for ball)
    dofadr = np.asarray(m.jnt_dofadr)[jnt_of_dof]
    k = np.arange(m.nv) - dofadr

    is_free_trans = (jt == T.FREE) & (k < 3)
    is_rot_local = ((jt == T.BALL) | ((jt == T.FREE) & (k >= 3)))
    is_slide = jt == T.SLIDE
    is_hinge = jt == T.HINGE

    e_world = jnp.asarray(np.eye(3)[np.clip(k, 0, 2)], dtype=dtype)
    local_col = np.clip(np.where(jt == T.FREE, k - 3, k), 0, 2)
    # xmat columns = local axes in world frame
    e_local = jnp.take_along_axis(
        xmat_b, jnp.asarray(local_col)[:, None, None].repeat(3, 1), axis=2
    )[..., 0]

    rot_axis = jnp.where(jnp.asarray(is_hinge)[:, None], axis, e_local)
    rot_anchor = jnp.where(jnp.asarray(is_hinge)[:, None], anchor,
                           d.xpos[body_of_dof])
    ang = jnp.where(jnp.asarray(is_rot_local | is_hinge)[:, None],
                    rot_axis, jnp.zeros_like(axis))
    lin_rot = jnp.cross(rot_axis, com - rot_anchor)
    lin = jnp.where(jnp.asarray(is_rot_local | is_hinge)[:, None], lin_rot,
                    jnp.where(jnp.asarray(is_slide)[:, None], axis, e_world))
    cdof = jnp.concatenate([ang, lin], axis=-1)
    return d.replace(cdof=cdof, cinert=cinert)


def tendon(m: Model, d: Data) -> Data:
    """Fixed tendons: length = sum coef * qpos_joint, constant moment rows."""
    if m.ntendon == 0:
        return d
    dtype = d.qpos.dtype
    # Build (ntendon, nv) moment matrix and lengths.
    moment = jnp.zeros((m.ntendon, m.nv), dtype=dtype)
    length = jnp.zeros((m.ntendon,), dtype=dtype)
    ten_adr = np.asarray(m.ten_adr)
    ten_num = np.asarray(m.ten_num)
    wrap_jnt = np.asarray(m.wrap_jntid)
    qposadr = np.asarray(m.jnt_qposadr)
    dofadr = np.asarray(m.jnt_dofadr)
    for t in range(m.ntendon):
        idx = np.arange(ten_adr[t], ten_adr[t] + ten_num[t])
        jids = wrap_jnt[idx]
        coefs = m.wrap_coef.reshape(-1)[idx]
        length = length.at[t].set(jnp.sum(coefs * d.qpos[qposadr[jids]]))
        moment = moment.at[t, dofadr[jids]].set(coefs)
    return d.replace(ten_length=length, ten_moment=moment)
