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


_SUPPORT_CACHE: dict = {}


def _support_pairs(m: Model):
    """Static (body, dof) pairs where the dof supports the body."""
    key = T.static_key(m.body_dof_mask)
    if key not in _SUPPORT_CACHE:
        b, v = np.nonzero(np.asarray(m.body_dof_mask))
        _SUPPORT_CACHE[key] = (b.astype(np.int32), v.astype(np.int32))
    return _SUPPORT_CACHE[key]


def project_body_forces(m: Model, d: Data, cfrc: jnp.ndarray) -> jnp.ndarray:
    """Project per-body spatial forces (at com-root origin, world frame,
    shape (nbody, 6, B)) into joint space: qfrc (nv, B).

    Sparse over the ~500 static (body, dof) support pairs instead of a
    dense (nbody, nv, B) contraction."""
    bp, vp = _support_pairs(m)
    dots = jnp.sum(cfrc[bp] * d.cdof[vp], axis=-2)       # (npairs, B)
    return jnp.zeros_like(d.qvel).at[vp].add(dots)


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

    Term forms were identified against the MuJoCo oracle by isolating each
    fluidcoef (tests/test_fluid.py): viscous Stokes terms with the
    mean-semi-axis equivalent sphere; blunt drag -rho*Cb*A_proj*|v|v and
    slender drag -rho*Cs*(A_max - A_proj)*|v|v (no 1/2 factor; A_proj
    exact ellipsoid projected area); angular drag with per-axis moment
    (8/15)*pi*r_i*max(r_j,r_k)^4; Magnus force C_m * w x ((rho*V - m_v)*v)
    with the precomputed virtual mass m_v (mjModel.geom_fluid[6:9]).
    Kutta lift is approximate; added-mass d(v)/dt terms are omitted.
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
    s = m.geom_size[gids]
    sx, sy, sz = s[:, 0:1], s[:, 1:2], s[:, 2:3]   # (g, 1)
    rho, beta = m.opt.density, m.opt.viscosity

    # viscous resistance (equivalent sphere, r = mean semi-axis)
    r_eq = (sx + sy + sz) / 3.0
    frc = -6.0 * _PI * r_eq[..., None] * beta * lin
    trq = -8.0 * _PI * (r_eq ** 3)[..., None] * beta * ang

    # quadratic angular drag
    I_ang = (8.0 / 15.0) * _PI * jnp.concatenate([
        sx * jnp.maximum(sy, sz) ** 4,
        sy * jnp.maximum(sx, sz) ** 4,
        sz * jnp.maximum(sx, sy) ** 4], axis=-1)[..., None]  # (g, 3, 1)
    trq = trq - rho * c_ang[..., None] * I_ang * jnp.abs(ang) * ang

    # blunt + slender quadratic drag (exact projected area)
    speed = bq.norm(lin)[:, None, :]            # (g, 1, B)
    u = lin / jnp.maximum(speed, 1e-12)
    pair = jnp.concatenate([sy * sz, sx * sz, sx * sy], axis=-1)[..., None]
    A_proj = _PI * jnp.sqrt(jnp.sum((pair * u) ** 2, axis=-2,
                                    keepdims=True))
    A_max = _PI * jnp.max(pair, axis=-2, keepdims=True)
    drag = (rho * c_blunt[..., None] * A_proj
            + rho * c_slender[..., None] * jnp.maximum(A_max - A_proj, 0.0))
    frc = frc - drag * speed * lin

    # Kutta lift (approximate closed form)
    nvec = lin / jnp.maximum((s * s)[..., None], 1e-12)
    nhat = nvec / jnp.maximum(bq.norm(nvec)[:, None, :], 1e-12)
    cosun = jnp.sum(u * nhat, axis=-2, keepdims=True)
    lift_dir = bq.cross(bq.cross(nhat, u), u)
    frc = frc + (rho * c_kutta[..., None] * A_proj * cosun
                 * speed * speed) * lift_dir

    # Magnus: C_m * w x ((rho V - m_virtual) * v)
    vol = ((4.0 / 3.0) * _PI * (sx * sy * sz))[..., None]
    weighted_v = (rho * vol - vmass) * lin
    frc = frc + c_magnus[..., None] * bq.cross(ang, weighted_v)

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
