"""Passive forces: joint/tendon springs & dampers and fluid forces.

The fly model runs in a viscous medium (air at CGS scale: density 0.00128,
viscosity 0.000185 — reference fruitfly MJCF <option>), so fluid forces act
on EVERY body via MuJoCo's inertia-box model, and on the wings via the
per-geom ellipsoid model during flight (reference tasks/base.py:309-313).
Both are implemented here as batched closed-form expressions.

Body-applied 6D forces are projected into joint space with one masked
(nbody,6)x(6,nv) contraction instead of a tree sweep: qfrc[v] = sum over
supported bodies of cdof[v] . f_body — see ``project_body_forces``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model

_PI = np.pi


def project_body_forces(m: Model, d: Data, cfrc: jnp.ndarray) -> jnp.ndarray:
    """Project per-body spatial forces (at com-root origin, world frame,
    shape (nbody, 6)) into joint space: qfrc (nv,)."""
    dots = cfrc @ d.cdof.T                      # (nbody, nv)
    mask = jnp.asarray(np.asarray(m.body_dof_mask), dtype=cfrc.dtype)
    return jnp.sum(dots * mask, axis=0)


def body_velocity_local(m: Model, d: Data):
    """6D velocity of each body at its com (xipos), in the inertia frame
    (ximat columns). Returns (angvel_local, linvel_local), each (nbody, 3).

    Matches mj_objectVelocity(..., mjOBJ_BODY, flg_local=1).
    """
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    ang_w = d.cvel[:, :3]
    lin_w = d.cvel[:, 3:] + jnp.cross(ang_w, offset)
    # rotate into inertia frame: v_local = ximat^T v_world
    ang_l = jnp.einsum("bji,bj->bi", d.ximat, ang_w)
    lin_l = jnp.einsum("bji,bj->bi", d.ximat, lin_w)
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
    (nbody, 6) spatial forces. Bodies with an ellipsoid-fluid geom are
    excluded (they use ``fluid_ellipsoid``)."""
    dtype = d.qpos.dtype
    ang_l, lin_l = body_velocity_local(m, d)
    # subtract wind (rotated into local frame)
    wind = m.opt.wind.astype(dtype)
    wind_l = jnp.einsum("bji,j->bi", d.ximat, wind)
    lin_l = lin_l - wind_l

    box = _inertia_box(m)  # full side lengths
    rho, beta = m.opt.density, m.opt.viscosity

    frc = jnp.zeros_like(lin_l)
    trq = jnp.zeros_like(ang_l)

    # quadratic (density) drag
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    area = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=-1)
    frc = frc - 0.5 * rho * area * jnp.abs(lin_l) * lin_l
    btrq = jnp.stack([
        b0 * (b1 ** 4 + b2 ** 4),
        b1 * (b0 ** 4 + b2 ** 4),
        b2 * (b0 ** 4 + b1 ** 4)], axis=-1)
    trq = trq - rho * btrq * jnp.abs(ang_l) * ang_l / 64.0

    # viscous (Stokes-like) drag with equivalent-sphere diameter
    diam = (b0 + b1 + b2) / 3.0
    frc = frc - 3.0 * _PI * diam[:, None] * beta * lin_l
    trq = trq - _PI * (diam ** 3)[:, None] * beta * ang_l

    # rotate back to world, shift to com-root origin
    frc_w = jnp.einsum("bij,bj->bi", d.ximat, frc)
    trq_w = jnp.einsum("bij,bj->bi", d.ximat, trq)
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    trq_o = trq_w + jnp.cross(offset, frc_w)
    out = jnp.concatenate([trq_o, frc_w], axis=-1)
    # zero out world body and bodies using the ellipsoid model
    has_ell = _ellipsoid_body_mask(m)
    keep = jnp.asarray(~has_ell, dtype=dtype)[:, None]
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
    """Per-geom ellipsoid fluid model (wings). Returns (nbody, 6) spatial
    forces at com-root origin; zero unless the geom opts in via fluidshape.

    Term forms were identified against the MuJoCo oracle by isolating each
    fluidcoef (tests/test_fluid.py): viscous Stokes terms with the
    mean-semi-axis equivalent sphere; blunt drag -rho*Cb*A_proj*|v|v and
    slender drag -rho*Cs*(A_max - A_proj)*|v|v (no 1/2 factor; A_proj
    exact ellipsoid projected area); angular drag with per-axis moment
    (8/15)*pi*r_i*max(r_j,r_k)^4; Magnus force C_m * w x ((rho*V - m_v)*v)
    with the precomputed virtual mass m_v (mjModel.geom_fluid[6:9]).
    Kutta lift is approximate (TODO: exact closed form); added-mass
    d(v)/dt terms are omitted.
    """
    dtype = d.qpos.dtype
    active = np.asarray(m.geom_fluid_active)
    if not active.any():
        return jnp.zeros((m.nbody, 6), dtype=dtype)
    gids = np.nonzero(active)[0]
    bids = np.asarray(m.geom_bodyid)[gids]
    root = np.asarray(m.body_rootid)[bids]

    # geom 6D velocity at geom frame, local coords
    offset = d.geom_xpos[gids] - d.subtree_com[root]
    ang_w = d.cvel[bids, :3]
    lin_w = d.cvel[bids, 3:] + jnp.cross(ang_w, offset)
    R = d.geom_xmat[gids]
    ang = jnp.einsum("gji,gj->gi", R, ang_w)
    lin = jnp.einsum("gji,gj->gi", R, lin_w - m.opt.wind.astype(dtype))

    fl = m.geom_fluid[gids]
    # mjModel.geom_fluid layout (mjNFLUID=12):
    # [active, Cblunt, Cslender, Cang, Ckutta, Cmagnus,
    #  virtual_mass(3), virtual_inertia(3)]
    c_blunt, c_slender, c_ang = fl[:, 1], fl[:, 2], fl[:, 3]
    c_kutta, c_magnus = fl[:, 4], fl[:, 5]
    vmass = fl[:, 6:9]
    s = m.geom_size[gids]  # ellipsoid semi-axes
    sx, sy, sz = s[:, 0], s[:, 1], s[:, 2]
    rho, beta = m.opt.density, m.opt.viscosity

    # ----- viscous resistance (equivalent sphere, r = mean semi-axis) ----
    r_eq = (sx + sy + sz) / 3.0
    frc = -6.0 * _PI * r_eq[:, None] * beta * lin
    trq = -8.0 * _PI * (r_eq ** 3)[:, None] * beta * ang

    # ----- quadratic angular drag: I_i = (8/15) pi r_i max(r_j,r_k)^4 ----
    I_ang = (8.0 / 15.0) * _PI * jnp.stack([
        sx * jnp.maximum(sy, sz) ** 4,
        sy * jnp.maximum(sx, sz) ** 4,
        sz * jnp.maximum(sx, sy) ** 4], axis=-1)
    # per-axis |w_i| w_i (oracle-verified; small off-axis coupling terms
    # of the exact model are not reproduced)
    trq = trq - rho * c_ang[:, None] * I_ang * jnp.abs(ang) * ang

    # ----- blunt + slender quadratic drag (exact projected area) -----
    speed = jnp.linalg.norm(lin, axis=-1, keepdims=True)
    u = lin / jnp.maximum(speed, 1e-12)
    pair = jnp.stack([sy * sz, sx * sz, sx * sy], axis=-1)
    A_proj = _PI * jnp.sqrt(jnp.sum((pair * u) ** 2, axis=-1,
                                    keepdims=True))
    A_max = _PI * jnp.max(pair, axis=-1, keepdims=True)
    drag = (rho * c_blunt[:, None] * A_proj
            + rho * c_slender[:, None] * jnp.maximum(A_max - A_proj, 0.0))
    frc = frc - drag * speed * lin

    # ----- Kutta lift (approximate closed form) -----
    # surface-normal direction ~ normalize(v / r^2); lift perpendicular to
    # v in the (v, n) plane, magnitude ~ rho*Ck*A_proj*(u.n)*|v|^2
    nvec = lin / jnp.maximum(s * s, 1e-12)
    nhat = nvec / jnp.maximum(
        jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-12)
    cosun = jnp.sum(u * nhat, axis=-1, keepdims=True)
    lift_dir = jnp.cross(jnp.cross(nhat, u), u)
    frc = frc + (rho * c_kutta[:, None] * A_proj * cosun
                 * speed * speed) * lift_dir

    # ----- Magnus: C_m * w x ((rho V - m_virtual) * v) -----
    vol = (4.0 / 3.0) * _PI * (sx * sy * sz)
    weighted_v = (rho * vol[:, None] - vmass) * lin
    frc = frc + c_magnus[:, None] * jnp.cross(ang, weighted_v)

    # rotate to world, shift to com-root origin, scatter-add per body
    frc_w = jnp.einsum("gij,gj->gi", R, frc)
    trq_w = jnp.einsum("gij,gj->gi", R, trq)
    trq_o = trq_w + jnp.cross(offset, frc_w)
    out = jnp.zeros((m.nbody, 6), dtype=dtype)
    out = out.at[bids, :3].add(trq_o).at[bids, 3:].add(frc_w)
    return out


def passive(m: Model, d: Data) -> Data:
    """mj_passive: springs + dampers + fluid -> qfrc_passive."""
    dtype = d.qpos.dtype
    qfrc = jnp.zeros((m.nv,), dtype=dtype)

    # joint springs (hinge/slide only; fly has no ball springs)
    jt = np.asarray(m.jnt_type)
    scalar = np.nonzero((jt == T.HINGE) | (jt == T.SLIDE))[0]
    if len(scalar):
        qadr = np.asarray(m.jnt_qposadr)[scalar]
        dadr = np.asarray(m.jnt_dofadr)[scalar]
        stiff = m.jnt_stiffness[scalar]
        qfrc = qfrc.at[dadr].add(
            -stiff * (d.qpos[qadr] - m.qpos_spring[qadr]))

    # dof damping
    qfrc = qfrc - m.dof_damping * d.qvel

    # tendon springs (deadband) and dampers
    if m.ntendon:
        lo = m.ten_lengthspring[:, 0]
        hi = m.ten_lengthspring[:, 1]
        dlen = jnp.where(d.ten_length > hi, d.ten_length - hi,
                         jnp.where(d.ten_length < lo, d.ten_length - lo, 0.0))
        frc = -m.ten_stiffness * dlen - m.ten_damping * d.ten_velocity
        qfrc = qfrc + d.ten_moment.T @ frc

    # fluid
    qfrc_fluid = jnp.zeros_like(qfrc)
    if m.opt.has_fluid:
        cfrc = fluid_box(m, d) + fluid_ellipsoid(m, d)
        qfrc_fluid = project_body_forces(m, d, cfrc)
        qfrc = qfrc + qfrc_fluid

    return d.replace(qfrc_passive=qfrc, qfrc_fluid=qfrc_fluid)
