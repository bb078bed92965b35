"""Passive forces: joint/tendon springs & dampers and fluid forces (batched).

The fly model runs in a viscous medium (air at CGS scale: density 0.00128,
viscosity 0.000185 — reference fruitfly MJCF <option>), so fluid forces act
on EVERY body via MuJoCo's inertia-box model, and on the wings via the
per-geom ellipsoid model during flight (reference tasks/base.py:309-313).
Both are implemented here as batched closed-form expressions over the
trailing env axis.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model

_PI = np.pi


def _mid(s):
    """Middle semi-axis per geom: sum - max - min over the last axis."""
    return (jnp.sum(s, axis=-1) - jnp.max(s, axis=-1)
            - jnp.min(s, axis=-1))


_SUPPORT_CACHE: dict = {}


def _support_pairs(m: Model):
    """Static (body, dof) pairs where the dof supports the body."""
    key = T.static_key(m.body_dof_mask)
    if key not in _SUPPORT_CACHE:
        b, v = np.nonzero(np.asarray(m.body_dof_mask))
        _SUPPORT_CACHE[key] = (b.astype(np.int32), v.astype(np.int32))
    return _SUPPORT_CACHE[key]


def support_matrix(m: Model, dtype):
    """Static (nbody, nv) 0/1 support mask as an array (dof supports
    body). Pair scatter-adds over it lower to serialized TPU scatters;
    contracting against this matrix rides the MXU instead."""
    return jnp.asarray(np.asarray(m.body_dof_mask), dtype)


def project_body_forces(m: Model, d: Data, cfrc: jnp.ndarray) -> jnp.ndarray:
    """Project per-body spatial forces (at com-root origin, world frame,
    shape (nbody, 6, B)) into joint space: qfrc (nv, B).

    qfrc[v] = cdof[v] . sum_{bodies b supported by v} cfrc[b] — one
    (nv, nbody) x (nbody, 6B) matmul plus an elementwise dot."""
    import jax
    S = support_matrix(m, cfrc.dtype)
    acc = jnp.einsum("bv,bcB->vcB", S, cfrc,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(acc * d.cdof, axis=-2)


def body_velocity_local(m: Model, d: Data):
    """6D velocity of each body at its com (xipos), in the inertia frame
    (ximat columns). Returns (angvel_local, linvel_local), (nbody, 3, B).

    Matches mj_objectVelocity(..., mjOBJ_BODY, flg_local=1).
    """
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    ang_w = d.cvel[:, :3]
    lin_w = d.cvel[:, 3:] + bq.cross(ang_w, offset)
    ang_l = bq.matvec_t(d.ximat, ang_w)
    lin_l = bq.matvec_t(d.ximat, lin_w)
    return ang_l, lin_l


def _inertia_box(m: Model):
    """Equivalent-box FULL side lengths from diagonal inertia (nbody, 3)."""
    I = m.body_inertia
    mass = jnp.maximum(m.body_mass, 1e-12)[:, None]
    Ij = jnp.stack([I[:, 1] + I[:, 2] - I[:, 0],
                    I[:, 2] + I[:, 0] - I[:, 1],
                    I[:, 0] + I[:, 1] - I[:, 2]], axis=-1)
    return jnp.sqrt(jnp.maximum(6.0 * Ij / mass, 1e-24))


def fluid_box(m: Model, d: Data) -> jnp.ndarray:
    """Inertia-box fluid model (mj_inertiaBoxFluid): per-body 6D force at
    the body com in world frame, mapped to com-root origin. Returns
    (nbody, 6, B) spatial forces. Bodies with an ellipsoid-fluid geom are
    excluded (they use ``fluid_ellipsoid``)."""
    dtype = d.qpos.dtype
    ang_l, lin_l = body_velocity_local(m, d)
    wind = m.opt.wind.astype(dtype)
    wind_l = bq.matvec_t(d.ximat, jnp.broadcast_to(
        wind[None, :, None], d.xipos.shape))
    lin_l = lin_l - wind_l

    box = _inertia_box(m)[..., None]  # (nbody, 3, 1)
    rho, beta = m.opt.density, m.opt.viscosity

    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]  # (nbody, 1)
    area = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=-2)
    frc = -0.5 * rho * area * jnp.abs(lin_l) * lin_l
    btrq = jnp.stack([
        b0 * (b1 ** 4 + b2 ** 4),
        b1 * (b0 ** 4 + b2 ** 4),
        b2 * (b0 ** 4 + b1 ** 4)], axis=-2)
    trq = -rho * btrq * jnp.abs(ang_l) * ang_l / 64.0

    diam = (b0 + b1 + b2) / 3.0      # (nbody, 1)
    frc = frc - 3.0 * _PI * diam[:, None] * beta * lin_l
    trq = trq - _PI * (diam ** 3)[:, None] * beta * ang_l

    frc_w = bq.matvec(d.ximat, frc)
    trq_w = bq.matvec(d.ximat, trq)
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    trq_o = trq_w + bq.cross(offset, frc_w)
    out = jnp.concatenate([trq_o, frc_w], axis=-2)   # (nbody, 6, B)
    has_ell = _ellipsoid_body_mask(m)
    keep = jnp.asarray(~has_ell, dtype=dtype)[:, None, None]
    keep = keep.at[0].set(0.0)
    return out * keep


def _ellipsoid_body_mask(m: Model) -> np.ndarray:
    """Static (nbody,) bool: body has at least one ellipsoid-fluid geom."""
    geom_body = np.asarray(m.geom_bodyid)
    active = np.asarray(m.geom_fluid_active)
    out = np.zeros(m.nbody, dtype=bool)
    for g in range(m.ngeom):
        if active[g]:
            out[geom_body[g]] = True
    return out


def fluid_ellipsoid(m: Model, d: Data) -> jnp.ndarray:
    """Per-geom ellipsoid fluid model (wings). Returns (nbody, 6, B) spatial
    forces at com-root origin; zero unless the geom opts in via fluidshape.

    Every term is ORACLE-EXACT: the closed forms were identified
    numerically against MuJoCo qfrc_passive over random off-axis (v, w)
    states with each fluidcoef isolated (tools/derive_fluid.py;
    tests/test_fluid.py asserts 1e-6 agreement per term and combined):

    * viscous Stokes: -6 pi r_eq beta v / -8 pi r_eq^3 beta w,
      r_eq = mean semi-axis;
    * quadratic drag: -rho (C_B A_proj + C_S max(A_max - A_proj, 0))|v|v
      with A_proj = pi sqrt(den/num), num = sum((P_i v_i)^2),
      den = sum((P_i^2 v_i)^2), P = (s_y s_z, s_x s_z, s_x s_y),
      A_max = pi d_max d_mid;
    * angular drag + slender rotational drag:
      T = -rho ||w o (C_A I + C_S (I_max - I))|| w with
      I_i = (8/15) pi s_i max(s_j, s_k)^4, I_max = max_i I_i;
    * Kutta lift: n = P^2 o v,
      F = C_K rho pi sqrt(num/den)/|v| ((n x v) x v);
    * Magnus: C_M rho V (w x v);
    * added mass (Kirchhoff gyroscopic terms; the dv/dt parts are
      omitted by MuJoCo as well): p = rho m_A o v, L = rho I_A o w,
      F += p x w, T += p x v + L x w, with the compile-time virtual
      mass/inertia m_A = geom_fluid[6:9], I_A = geom_fluid[9:12].
    """
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    active = np.asarray(m.geom_fluid_active)
    if not active.any():
        return jnp.zeros((m.nbody, 6, B), dtype=dtype)
    gids = np.nonzero(active)[0]
    bids = np.asarray(m.geom_bodyid)[gids]
    root = np.asarray(m.body_rootid)[bids]

    offset = d.geom_xpos[gids] - d.subtree_com[root]
    ang_w = d.cvel[bids, :3]
    lin_w = d.cvel[bids, 3:] + bq.cross(ang_w, offset)
    R = d.geom_xmat[gids]                      # (g, 3, 3, B)
    wind = jnp.broadcast_to(m.opt.wind.astype(dtype)[None, :, None],
                            lin_w.shape)
    ang = bq.matvec_t(R, ang_w)
    lin = bq.matvec_t(R, lin_w - wind)

    fl = m.geom_fluid[gids]
    c_blunt, c_slender, c_ang = fl[:, 1:2], fl[:, 2:3], fl[:, 3:4]  # (g,1)
    c_kutta, c_magnus = fl[:, 4:5], fl[:, 5:6]
    vmass = fl[:, 6:9, None]                    # (g, 3, 1)
    vinertia = fl[:, 9:12, None]                # (g, 3, 1)
    s = m.geom_size[gids]
    sx, sy, sz = s[:, 0:1], s[:, 1:2], s[:, 2:3]   # (g, 1)
    rho, beta = m.opt.density, m.opt.viscosity
    eps = jnp.asarray(1e-15, dtype)

    # viscous resistance (equivalent sphere, r = mean semi-axis)
    r_eq = (sx + sy + sz) / 3.0
    frc = -6.0 * _PI * r_eq[..., None] * beta * lin
    trq = -8.0 * _PI * (r_eq ** 3)[..., None] * beta * ang

    # quadratic angular drag + slender rotational drag:
    # T = -rho ||w o (C_A I + C_S (I_max - I))|| w
    I_ang = (8.0 / 15.0) * _PI * jnp.concatenate([
        sx * jnp.maximum(sy, sz) ** 4,
        sy * jnp.maximum(sx, sz) ** 4,
        sz * jnp.maximum(sx, sy) ** 4], axis=-1)[..., None]  # (g, 3, 1)
    I_max = jnp.max(I_ang, axis=-2, keepdims=True)
    mom_visc = ang * (c_ang[..., None] * I_ang
                      + c_slender[..., None] * (I_max - I_ang))
    trq = trq - rho * bq.norm(mom_visc)[:, None, :] * ang

    # blunt + slender quadratic drag (MuJoCo projected-area form)
    speed = bq.norm(lin)[:, None, :]            # (g, 1, B)
    pair = jnp.concatenate([sy * sz, sx * sz, sx * sy], axis=-1)[..., None]
    p_num = jnp.sum((pair * lin) ** 2, axis=-2, keepdims=True)
    p_den = jnp.sum((pair ** 2 * lin) ** 2, axis=-2, keepdims=True)
    A_proj = _PI * jnp.sqrt(p_den / jnp.maximum(p_num, eps))
    A_max = _PI * (jnp.max(s, axis=-1) * _mid(s))[:, None, None]
    drag = (rho * c_blunt[..., None] * A_proj
            + rho * c_slender[..., None] * jnp.maximum(A_max - A_proj, 0.0))
    frc = frc - drag * speed * lin

    # Kutta lift: n = P^2 o v; F = C_K rho pi sqrt(num/den)/|v| (n x v) x v
    normal = pair ** 2 * lin
    lift = bq.cross(bq.cross(normal, lin), lin)
    kutta_coef = (_PI * jnp.sqrt(p_num / jnp.maximum(p_den, eps))
                  / jnp.maximum(speed, eps))
    frc = frc + rho * c_kutta[..., None] * kutta_coef * lift

    # Magnus: C_M rho V (w x v)
    vol = ((4.0 / 3.0) * _PI * (sx * sy * sz))[..., None]
    frc = frc + c_magnus[..., None] * rho * vol * bq.cross(ang, lin)

    # added mass (Kirchhoff gyroscopic terms)
    p_mom = rho * vmass * lin
    l_mom = rho * vinertia * ang
    frc = frc + bq.cross(p_mom, ang)
    trq = trq + bq.cross(p_mom, lin) + bq.cross(l_mom, ang)

    frc_w = bq.matvec(R, frc)
    trq_w = bq.matvec(R, trq)
    trq_o = trq_w + bq.cross(offset, frc_w)
    out = jnp.zeros((m.nbody, 6, B), dtype=dtype)
    out = out.at[bids, :3].add(trq_o).at[bids, 3:].add(frc_w)
    return out


def passive(m: Model, d: Data) -> Data:
    """mj_passive: springs + dampers + fluid -> qfrc_passive."""
    dtype = d.qpos.dtype
    qfrc = jnp.zeros_like(d.qvel)

    jt = np.asarray(m.jnt_type)
    scalar = np.nonzero((jt == T.HINGE) | (jt == T.SLIDE))[0]
    if len(scalar):
        qadr = np.asarray(m.jnt_qposadr)[scalar]
        dadr = np.asarray(m.jnt_dofadr)[scalar]
        stiff = m.jnt_stiffness[scalar][:, None]
        qfrc = qfrc.at[dadr].add(
            -stiff * (d.qpos[qadr] - m.qpos_spring[qadr][:, None]))

    qfrc = qfrc - m.dof_damping[:, None] * d.qvel

    if m.ntendon:
        from flybody_tpu.physics import kinematics as K
        lo = m.ten_lengthspring[:, 0:1]
        hi = m.ten_lengthspring[:, 1:2]
        dlen = jnp.where(d.ten_length > hi, d.ten_length - hi,
                         jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
        ten_vel = K.ten_velocity_of(m, d)
        frc = (-m.ten_stiffness[:, None] * dlen
               - m.ten_damping[:, None] * ten_vel)
        qfrc = qfrc + K.ten_moment_apply(m, d, frc)

    qfrc_fluid = jnp.zeros_like(qfrc)
    if m.opt.has_fluid:
        cfrc = fluid_box(m, d) + fluid_ellipsoid(m, d)
        qfrc_fluid = project_body_forces(m, d, cfrc)
        qfrc = qfrc + qfrc_fluid

    return d.replace(qfrc_passive=qfrc, qfrc_fluid=qfrc_fluid)
