"""Constraints: joint limits + contacts, and the primal Newton solver.

MuJoCo's soft-constraint model, TPU-shaped:

* Row counts are static. Contacts are grouped by (static) condim; within
  each group a top-K "active island" is selected by penetration depth, so
  the Jacobian is a fixed (nefc_sel, nv) matrix per env regardless of how
  many candidate pairs the model has. K caps the constraint work per step
  and turns the solve into fixed batched GEMMs + an (nv,nv) Cholesky.

* The solver minimizes the MuJoCo primal objective
      0.5 (x - a_smooth)' M (x - a_smooth) + sum_i s_i(J x - aref)
  with exact unilateral/elliptic-cone force projection and a Gauss-Newton
  Hessian, plus a 1D Newton linesearch on the directional derivative.
  The fixed point satisfies M(x - a_s) = J' f(Jx - aref) — identical
  optimality conditions to MuJoCo's Newton solver.

References for behavior parity: MuJoCo computation docs (soft constraint
model); reference model solref/solimp at vnl_ray fruitfly.xml defaults.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model

# Per-condim cap on simultaneously active contacts (static island size).
_MAX_ACTIVE = {1: 32, 3: 32, 4: 16, 6: 16}


def _impedance(solimp, pos):
    """MuJoCo solimp sigmoid: impedance d(pos) in (0, 1)."""
    dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    mid = jnp.clip(mid, 1e-6, 1 - 1e-6)
    power = jnp.maximum(power, 1.0)
    y_lo = (x / mid) ** power * mid
    y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
    y = jnp.where(x < mid, y_lo, y_hi)
    imp = dmin + y * (dmax - dmin)
    return jnp.clip(imp, 1e-5, 1.0 - 1e-5)


def _kbi(solref, solimp, pos):
    """Stiffness/damping/impedance from solref/solimp (MuJoCo formulas)."""
    imp = _impedance(solimp, pos)
    dmax = jnp.clip(solimp[..., 1], 1e-5, 1.0 - 1e-5)
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    # standard (positive) solref
    b_std = 2.0 / (dmax * jnp.maximum(timeconst, 1e-12))
    k_std = imp / (dmax * dmax * jnp.maximum(timeconst, 1e-12) ** 2
                   * jnp.maximum(dampratio, 1e-12) ** 2)
    # direct (non-positive) solref: (-stiffness, -damping)
    direct = timeconst <= 0
    b = jnp.where(direct, -solref[..., 1], b_std)
    k = jnp.where(direct, -solref[..., 0] * imp, k_std)
    return k, b, imp


@dataclasses.dataclass(frozen=True)
class EfcMeta:
    """Static layout of selected constraint rows."""
    nlimit: int
    groups: tuple  # ((condim, K), ...) in slot order
    nrows: int


def efc_meta(m: Model) -> EfcMeta:
    nlimit = int(np.asarray(m.jnt_limited).sum())
    con_dim = np.asarray(m.con_dim)
    groups = []
    for cd in sorted(set(con_dim.tolist())):
        n = int((con_dim == cd).sum())
        groups.append((int(cd), min(n, _MAX_ACTIVE.get(int(cd), 16))))
    nrows = nlimit + sum(cd * k for cd, k in groups)
    return EfcMeta(nlimit=nlimit, groups=tuple(groups), nrows=nrows)


def point_jacobian(m: Model, d: Data, pos: jnp.ndarray) -> jnp.ndarray:
    """(nv, 3) translational Jacobian of world point `pos` (per dof,
    unmasked — caller applies body-support masks)."""
    root_of_dof = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    comroot = d.subtree_com[root_of_dof]       # (nv, 3)
    return d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], pos[None] - comroot)


def jac_for_contacts(m: Model, d: Data, pos, frame, m1, m2,
                     dims: int = 3) -> jnp.ndarray:
    """(K, dims, nv) contact Jacobians for K contacts given their world
    positions, frames, and per-body dof-support masks m1/m2 (K, nv).
    Row 0 = normal (separation velocity positive)."""

    def one(p, fr, mm1, mm2):
        jp = point_jacobian(m, d, p)            # (nv, 3)
        jt = (mm2 - mm1)[:, None] * jp          # (nv, 3)
        return fr[:dims] @ jt.T                 # (dims, nv)

    return jax.vmap(one)(pos, frame, m1, m2)


def contact_jacobians(m: Model, d: Data, slots: np.ndarray | None = None,
                      dims: int = 3):
    """Jacobians for a STATIC subset of contact slots (all if None).

    Returns ((K, dims, nv) jacobian, (b1, b2) static per-slot body ids).
    Prefer passing `slots` — computing all candidate slots is O(ncon_max)
    memory and defeats the top-K active-island design.
    """
    from flybody_tpu.physics.actuation import _slot_bodies

    b1, b2 = _slot_bodies(m)
    if slots is not None:
        b1, b2 = b1[slots], b2[slots]
        pos, frame = d.contact.pos[slots], d.contact.frame[slots]
    else:
        pos, frame = d.contact.pos, d.contact.frame
    mask = jnp.asarray(np.asarray(m.body_dof_mask), dtype=d.qpos.dtype)
    jac = jac_for_contacts(m, d, pos, frame, mask[b1], mask[b2], dims)
    return jac, (b1, b2)


def _limit_rows(m: Model, d: Data):
    """Joint-limit rows: J (nl, nv), pos, jnt ids (static)."""
    jl = np.asarray(m.jnt_limited, dtype=bool)
    jt = np.asarray(m.jnt_type)
    ids = np.nonzero(jl & ((jt == T.HINGE) | (jt == T.SLIDE)))[0]
    if len(ids) == 0:
        return None
    qadr = np.asarray(m.jnt_qposadr)[ids]
    dadr = np.asarray(m.jnt_dofadr)[ids]
    q = d.qpos[qadr]
    lo = m.jnt_range[ids, 0]
    hi = m.jnt_range[ids, 1]
    dist_lo = q - lo
    dist_hi = hi - q
    lower = dist_lo < dist_hi
    dist = jnp.where(lower, dist_lo, dist_hi)
    sign = jnp.where(lower, 1.0, -1.0)
    pos = dist - m.jnt_margin[ids]
    J = jnp.zeros((len(ids), m.nv), dtype=d.qpos.dtype)
    J = J.at[np.arange(len(ids)), dadr].set(sign)
    k, b, imp = _kbi(m.jnt_solref[ids], m.jnt_solimp[ids], pos)
    vel = sign * d.qvel[dadr]
    aref = -b * vel - k * pos
    invweight = m.dof_invweight0[dadr]
    R = jnp.maximum((1.0 - imp) / imp * invweight, 1e-12)
    return J, pos, aref, 1.0 / R, ids


def make_efc(m: Model, d: Data, meta: EfcMeta):
    """Assemble selected constraint rows.

    Returns dict with J (n, nv), aref, D, pos, and static cone structure:
    per elliptic-contact (start_row, condim) plus friction coefs.
    """
    dtype = d.qpos.dtype
    rows_J, rows_aref, rows_D, rows_pos = [], [], [], []
    lim = _limit_rows(m, d)
    if lim is not None:
        J, pos, aref, D, _ = lim
        rows_J.append(J); rows_aref.append(aref)
        rows_D.append(D); rows_pos.append(pos)

    cones = []  # (start_row, condim, K) static
    mu_list = []
    sels = []   # (sel_slots, start_row, condim, K) for force scatter-back
    row_ofs = meta.nlimit
    if m.ncon_max:
        from flybody_tpu.physics.actuation import _slot_bodies
        slot_b1, slot_b2 = _slot_bodies(m)
        dof_mask = jnp.asarray(np.asarray(m.body_dof_mask),
                               dtype=d.qpos.dtype)
        con = d.contact
        con_dim = np.asarray(m.con_dim)
        eff_dist = con.dist - m.con_includemargin.astype(dtype)
        for cd, K in meta.groups:
            slots = np.nonzero(con_dim == cd)[0]
            sd = eff_dist[slots]
            if len(slots) > K:
                _, top = jax.lax.top_k(-sd, K)
            else:
                top = jnp.arange(len(slots))
            sel = jnp.asarray(slots)[top]           # (K,) dynamic
            pos_c = eff_dist[sel]                   # (K,)
            k_, b_, imp = _kbi(m.con_solref[sel], m.con_solimp[sel], pos_c)
            # jacobians only for the selected island (K slots)
            m1 = dof_mask[jnp.asarray(slot_b1)[sel]]
            m2 = dof_mask[jnp.asarray(slot_b2)[sel]]
            jac = jac_for_contacts(m, d, con.pos[sel], con.frame[sel],
                                   m1, m2, dims=3)  # (K, 3, nv)
            vel = jnp.einsum("kdv,v->kd", jac, d.qvel)
            b1_sel = jnp.asarray(slot_b1)[sel]
            b2_sel = jnp.asarray(slot_b2)[sel]
            bw = m.body_invweight0[:, 0]
            invw = bw[b1_sel] + bw[b2_sel]
            R_n = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
            ndim = min(cd, 3)
            # normal row
            aref_n = -b_ * vel[:, 0] - k_ * pos_c
            rows_J.append(jac[:, 0, :])
            rows_aref.append(aref_n)
            rows_D.append(1.0 / R_n)
            rows_pos.append(pos_c)
            if ndim > 1:
                # friction rows: aref = -b*vel (no position term)
                fr = m.con_friction[sel]            # (K, 5)
                R_f = R_n[:, None] / jnp.maximum(m.opt.impratio, 1e-12)
                for t in range(1, ndim):
                    rows_J.append(jac[:, t, :])
                    rows_aref.append(-b_ * vel[:, t])
                    rows_D.append(1.0 / R_f[:, 0])
                    rows_pos.append(jnp.zeros_like(pos_c))
                mu_list.append(fr[:, 0])
            cones.append((row_ofs, cd, K))
            sels.append((sel, row_ofs, ndim, K))
            row_ofs += ndim * K

    if not rows_J:
        return None
    # row layout: [limits][g1 normals(K)][g1 t1(K)][g1 t2(K)][g2 ...]
    J = jnp.concatenate(rows_J, axis=0)
    aref = jnp.concatenate(rows_aref, axis=0)
    D = jnp.concatenate(rows_D, axis=0)
    pos = jnp.concatenate(rows_pos, axis=0)
    # MuJoCo creates a row only when dist < includemargin; rows outside the
    # zone must produce no force even when approaching fast. Friction rows
    # share their contact's activity (their pos was stored as 0; gate them
    # via the normal row's pos in the solver cone loop — here the scalar
    # mask uses each row's own pos, with friction rows' pos replicated).
    row_active = pos < 0.0
    # replicate normal-row activity onto friction rows
    for (start, cd, K) in cones:
        ndim = min(cd, 3)
        if ndim > 1:
            n_act = row_active[start:start + K]
            for t in range(1, ndim):
                row_active = row_active.at[
                    start + t * K: start + (t + 1) * K].set(n_act)
    return dict(J=J, aref=aref, D=D, pos=pos, cones=tuple(cones),
                sels=tuple(sels), row_active=row_active,
                mu=(jnp.stack(mu_list) if mu_list else
                    jnp.zeros((0,), dtype=dtype)))


def solve(m: Model, d: Data, iterations: int | None = None) -> Data:
    """Constraint solve: qacc, qfrc_constraint from the smooth solution."""
    meta = efc_meta(m)
    if meta.nrows == 0:
        return d.replace(qacc=d.qacc_smooth,
                         qfrc_constraint=jnp.zeros_like(d.qvel))
    efc = make_efc(m, d, meta)
    # Fixed iteration counts (static shapes; no early-exit on TPU). With the
    # exact cone Hessian, 6 iterations reach MuJoCo-level accuracy for
    # typical in-simulation contact states; raise for pathological tests.
    niter = iterations if iterations is not None else min(
        m.opt.solver_iterations, 6)
    from flybody_tpu.physics.solver import solve_newton
    x, f = solve_newton(d.qM, d.qacc_smooth, efc, meta, iterations=niter,
                        ls_iterations=min(m.opt.ls_iterations, 6))
    # float32 safety: if the solve degenerated, fall back to the smooth
    # solution — the episode then blows up physically and is terminated by
    # the task's |qacc| threshold (reference behavior, base.py:214-217)
    ok = jnp.all(jnp.isfinite(x))
    x = jnp.where(ok, x, d.qacc_smooth)
    f = jnp.where(ok, f, 0.0)
    qfrc = efc["J"].T @ f
    # pad efc_force into the fixed-size slot (selected rows only)
    ef = jnp.zeros((m.nefc,), dtype=x.dtype)
    n = min(meta.nrows, m.nefc)
    ef = ef.at[:n].set(f[:n])
    # scatter per-contact frame forces back to slots (for sensors/obs)
    cfrc = jnp.zeros((m.ncon_max, 3), dtype=x.dtype)
    for sel, start, ndim, K in efc["sels"]:
        cols = [f[start + t * K: start + (t + 1) * K] for t in range(ndim)]
        cols += [jnp.zeros((K,), dtype=x.dtype)] * (3 - ndim)
        cfrc = cfrc.at[sel].set(jnp.stack(cols, axis=-1))
    return d.replace(qacc=x, qfrc_constraint=qfrc, efc_force=ef,
                     contact_force=cfrc)
