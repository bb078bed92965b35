"""Constraints: joint limits + contacts, batched island assembly.

MuJoCo's soft-constraint model, TPU-shaped:

* Row counts are static. Contacts are grouped by (static) condim; within
  each group a top-K "active island" is selected by penetration depth per
  env, so the contact Jacobian is a fixed (K, dim, nv, B) tensor regardless
  of how many candidate pairs the model has. Joint-limit rows are kept
  implicit (single nonzero per row) — they never enter a dense Jacobian.

* The solver (physics/solver.py) works in the DUAL: forces f minimize
      0.5 f' (J M^-1 J' + R) f - f' (aref - J qacc_smooth)
  over the product of friction cones, via accelerated projected gradient
  (APGD) with the matvec evaluated matrix-free through the sparse tree
  factorization — no per-iteration factorization, no (nv, nv) Hessian.
  The fixed point satisfies M(x - a_smooth) = J' f with f = proj(-D jar),
  identical optimality conditions to MuJoCo's Newton solver (and to the
  round-1 primal Newton engine, which was oracle-validated).

References for behavior parity: MuJoCo computation docs (soft constraint
model); reference model solref/solimp at vnl_ray fruitfly.xml defaults.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model

# Default per-condim cap on simultaneously active contacts (static island
# size); overridable per model via put_model(con_sel=...).
MAX_ACTIVE = {1: 32, 3: 32, 4: 16, 6: 16}


def _impedance(solimp, pos):
    """MuJoCo solimp sigmoid: impedance d(pos) in (0, 1).

    solimp: tuple of 5 (..., B) arrays or (..., 5); pos (..., B)."""
    dmin, dmax, width, mid, power = solimp
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    mid = jnp.clip(mid, 1e-6, 1 - 1e-6)
    power = jnp.maximum(power, 1.0)
    y_lo = (x / mid) ** power * mid
    y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
    y = jnp.where(x < mid, y_lo, y_hi)
    imp = dmin + y * (dmax - dmin)
    return jnp.clip(imp, 1e-5, 1.0 - 1e-5)


def _kbi(solref, solimp, pos, tsmin=0.0):
    """Stiffness/damping/impedance from solref/solimp (MuJoCo formulas).

    solref: tuple of 2, solimp: tuple of 5 broadcastable arrays.
    tsmin: the refsafe floor 2*opt.timestep — MuJoCo (default-enabled
    mjDSBL_REFSAFE off) clamps timeconst to >= 2 dt for stability; the
    reference fly's contact solref (2e-4, 1) at walk timestep 2e-4 hits
    this clamp, scaling k by 1/4 and b by 1/2 vs the raw formula."""
    imp = _impedance(solimp, pos)
    dmax = jnp.clip(solimp[1], 1e-5, 1.0 - 1e-5)
    timeconst, dampratio = solref
    timeconst = jnp.maximum(timeconst, tsmin)
    b_std = 2.0 / (dmax * jnp.maximum(timeconst, 1e-12))
    k_std = imp / (dmax * dmax * jnp.maximum(timeconst, 1e-12) ** 2
                   * jnp.maximum(dampratio, 1e-12) ** 2)
    direct = timeconst <= 0
    b = jnp.where(direct, -dampratio, b_std)
    k = jnp.where(direct, -timeconst * imp, k_std)
    return k, b, imp


@dataclasses.dataclass(frozen=True, eq=False)
class EfcMeta:
    """Static layout of selected constraint rows."""
    limit_ids: np.ndarray      # limited scalar joint ids
    limit_qadr: np.ndarray
    limit_dadr: np.ndarray
    groups: tuple              # ((condim, K) ...) FULL contact-row layout
    analytic_groups: tuple     # prefix of `groups` fed by the analytic
    #                            candidate-slot narrowphase; the final
    #                            (3, ccd_budget) group (when present) is
    #                            fed by the gated ccd stage instead
    nrows: int                 # total rows incl. limits (for efc_force)


_META_CACHE: dict = {}


def efc_meta(m: Model) -> EfcMeta:
    key = T.static_key(m.con_dim, m.jnt_limited, m.jnt_type,
                       m.jnt_qposadr, m.jnt_dofadr,
                       dict(m.con_sel) if m.con_sel else {},
                       np.array([m.nccd, m.ccd_budget]),
                       np.array([list(c[2:]) for c in m.ccd_classes])
                       if m.ccd_classes else None)
    if key in _META_CACHE:
        return _META_CACHE[key]
    jl = np.asarray(m.jnt_limited, dtype=bool)
    jt = np.asarray(m.jnt_type)
    ids = np.nonzero(jl & ((jt == T.HINGE) | (jt == T.SLIDE)))[0]
    con_dim = np.asarray(m.con_dim)
    groups = []
    sel = dict(m.con_sel) if m.con_sel else {}
    for cd in sorted(set(con_dim.tolist())):
        n = int((con_dim == cd).sum())
        cap = sel.get(int(cd), MAX_ACTIVE.get(int(cd), 16))
        groups.append((int(cd), min(n, cap)))
    analytic = tuple(groups)
    for (_, _, _, _, budget) in m.ccd_classes:
        groups.append((3, int(budget)))
    nrows = len(ids) + sum(min(cd, 3) * k for cd, k in groups)
    meta = EfcMeta(
        limit_ids=ids,
        limit_qadr=np.asarray(m.jnt_qposadr)[ids],
        limit_dadr=np.asarray(m.jnt_dofadr)[ids],
        groups=tuple(groups), analytic_groups=analytic, nrows=nrows)
    _META_CACHE[key] = meta
    return meta


@dataclasses.dataclass
class Limits:
    """Implicit limit rows: J row = sign * e_dadr."""
    dadr: np.ndarray           # static (nl,)
    sign: jnp.ndarray          # (nl, B)
    aref: jnp.ndarray          # (nl, B)
    R: jnp.ndarray             # (nl, B) regularizer (1/D)
    active: jnp.ndarray        # (nl, B)
    diag: jnp.ndarray          # (nl, B) approx diag(A + R) (invweight + R)
    pos: jnp.ndarray           # (nl, B) margin-adjusted limit distance
    k: jnp.ndarray             # (nl, B) solref/solimp stiffness
    b: jnp.ndarray             # (nl, B) solref/solimp damping


@dataclasses.dataclass
class ConGroup:
    """One condim group's selected contact island."""
    condim: int
    K: int
    sel: jnp.ndarray           # (K, B) slot indices into contact arrays
    jac: jnp.ndarray           # (K, dim, nv, B)
    aref: jnp.ndarray          # (K, dim, B)
    R: jnp.ndarray             # (K, dim, B) regularizer per row
    mu: jnp.ndarray            # (K, B) sliding friction
    active: jnp.ndarray        # (K, B)
    diag: jnp.ndarray          # (K, B) approx diag(A + R) of the normal row


jax.tree_util.register_dataclass(
    Limits,
    data_fields=["sign", "aref", "R", "active", "diag", "pos", "k", "b"],
    meta_fields=["dadr"])
jax.tree_util.register_dataclass(
    ConGroup,
    data_fields=["sel", "jac", "aref", "R", "mu", "active", "diag"],
    meta_fields=["condim", "K"])


def _limit_rows(m: Model, d: Data, meta: EfcMeta) -> Limits | None:
    if len(meta.limit_ids) == 0:
        return None
    ids, qadr, dadr = meta.limit_ids, meta.limit_qadr, meta.limit_dadr
    q = d.qpos[qadr]                           # (nl, B)
    lo = m.jnt_range[ids, 0][:, None]
    hi = m.jnt_range[ids, 1][:, None]
    dist_lo = q - lo
    dist_hi = hi - q
    lower = dist_lo < dist_hi
    dist = jnp.where(lower, dist_lo, dist_hi)
    sign = jnp.where(lower, 1.0, -1.0).astype(q.dtype)
    pos = dist - m.jnt_margin[ids][:, None]
    solref = tuple(m.jnt_solref[ids, i][:, None] for i in range(2))
    solimp = tuple(m.jnt_solimp[ids, i][:, None] for i in range(5))
    k, b, imp = _kbi(solref, solimp, pos, tsmin=2.0 * m.opt.timestep)
    vel = sign * d.qvel[dadr]
    aref = -b * vel - k * pos
    invweight = m.dof_invweight0[dadr][:, None]
    R = jnp.maximum((1.0 - imp) / imp * invweight, 1e-12)
    return Limits(dadr=dadr, sign=sign, aref=aref, R=R,
                  active=(pos < 0.0).astype(q.dtype),
                  diag=invweight + R, pos=pos, k=k, b=b)


def _contact_groups(m: Model, d: Data, meta: EfcMeta) -> list[ConGroup]:
    """Constraint rows from the SELECTED contacts (collision() already did
    top-K island selection and solref/solimp evaluation): pure static row
    slicing + Jacobian assembly; the only per-env index use is the one-hot
    body-membership contraction, which maps onto the MXU."""
    if m.ncon_max == 0 and m.nccd == 0:
        return []
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    con = d.contact
    maskd = jnp.asarray(np.asarray(m.body_dof_mask), dtype)   # (nbody, nv)

    root_of_dof = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    comroot = d.subtree_com[root_of_dof]       # (nv, 3, B)
    ang = d.cdof[:, :3]                        # (nv, 3, B)
    lin = d.cdof[:, 3:]
    base = lin - bq.cross(ang, comroot)        # (nv, 3, B): k-independent

    out = []
    off = 0
    for cd, K in meta.groups:
        sl = slice(off, off + K)
        off += K
        sel = con.sel[sl]
        pos_c = con.dist[sl] - con.margin[sl]  # (K, B)
        mu = con.mu[sl]
        invw = con.invw[sl]
        R_n = con.R[sl]
        k_ = con.k[sl]
        b_ = con.b[sl]
        cpos = con.pos[sl]
        cframe = con.frame[sl]

        # body-membership difference via one-hot contraction (MXU matmul
        # against the static (nbody, nv) dof-support table)
        iota = jnp.arange(m.nbody, dtype=jnp.int32)[None, :, None]
        ohd = ((con.b2[sl][:, None, :] == iota).astype(dtype)
               - (con.b1[sl][:, None, :] == iota).astype(dtype))
        mdiff = jnp.einsum("kbB,bv->kvB", ohd, maskd)         # (K, nv, B)

        ndim = min(cd, 3)
        # point jacobian rows: jacp[k, v] = base_v + ang_v x p_k
        jacp = (base[None] + bq.cross(
            jnp.broadcast_to(ang[None], (K,) + ang.shape),
            jnp.broadcast_to(cpos[:, None], (K, m.nv, 3, B))))
        jacp = jacp * mdiff[:, :, None, :]     # (K, nv, 3, B)
        # project onto frame rows: J (K, dim, nv, B)
        jac = jnp.einsum("kdcB,kvcB->kdvB", cframe[:, :ndim], jacp)

        vel = jnp.einsum("kdvB,vB->kdB", jac, d.qvel)
        aref_n = -b_ * vel[:, 0] - k_ * pos_c
        if ndim > 1:
            R_f = R_n / jnp.maximum(m.opt.impratio, 1e-12)
            aref_f = -b_[:, None] * vel[:, 1:ndim]
            aref = jnp.concatenate([aref_n[:, None], aref_f], axis=1)
            R = jnp.concatenate(
                [R_n[:, None],
                 jnp.broadcast_to(R_f[:, None], (K, ndim - 1, B))], axis=1)
        else:
            aref = aref_n[:, None]
            R = R_n[:, None]
        out.append(ConGroup(
            condim=cd, K=K, sel=sel, jac=jac, aref=aref, R=R, mu=mu,
            active=(pos_c < 0.0).astype(dtype),
            diag=invw + R_n))
    return out


def make_efc(m: Model, d: Data, meta: EfcMeta | None = None):
    """Assemble selected constraint rows -> (Limits | None, [ConGroup])."""
    meta = meta or efc_meta(m)
    return _limit_rows(m, d, meta), _contact_groups(m, d, meta)


def solve(m: Model, d: Data, iterations: int | None = None,
          efc=None, fresh: bool = True) -> Data:
    """Constraint solve: qacc, qfrc_constraint from the smooth solution.

    ``efc`` may be a prebuilt (Limits, [ConGroup]) pair (forward() builds
    it once per substep and shares it with adhesion transmission).
    ``fresh`` (static) is False on selection-persistent update substeps
    (Model.col_refresh schedule): the fused solver then reuses the
    stored row selection (Data.sol_lim_sel/sol_cone_sel) and raw warm
    forces (Data.sol_f) instead of re-running top_k + sel matching."""
    meta = efc_meta(m)
    if len(meta.limit_ids) == 0 and m.ncon_max == 0 and m.nccd == 0:
        return d.replace(qacc=d.qacc_smooth,
                         qfrc_constraint=jnp.zeros_like(d.qvel))
    if m.opt.contact_solver == "fused":
        from flybody_tpu.physics import solver_fused
        return solver_fused.solve_fused(m, d, iterations=iterations,
                                        fresh=fresh)
    lim, groups = efc if efc is not None else make_efc(m, d, meta)
    # fixed iteration count (static shapes, no early exit on TPU); the
    # per-method defaults reflect measured warm-started convergence
    # (dense ADMM reaches <1% qacc error in ~20 iterations; matrix-free
    # APGD needs ~64 — tests pass explicit higher counts for strict
    # oracle comparisons).
    if m.opt.contact_solver in ("admm", "admm_kernel"):
        from flybody_tpu.physics import solver_dense
        niter = iterations if iterations is not None else min(
            m.opt.solver_iterations, 20)
        f_lim, f_groups = solver_dense.solve_dual_dense(
            m, d, lim, groups, iterations=niter,
            noslip_iterations=m.opt.noslip_iterations,
            use_kernel=m.opt.contact_solver == "admm_kernel")
    else:
        from flybody_tpu.physics import solver
        niter = iterations if iterations is not None else min(
            m.opt.solver_iterations, 16)
        f_lim, f_groups = solver.solve_dual(
            m, d, lim, groups, iterations=niter,
            noslip_iterations=m.opt.noslip_iterations)

    # qfrc_constraint = J^T f
    qfrc = jnp.zeros_like(d.qvel)
    if lim is not None:
        qfrc = qfrc.at[lim.dadr].add(lim.sign * f_lim)
    for g, f in zip(groups, f_groups):
        qfrc = qfrc + jnp.einsum("kdvB,kdB->vB", g.jac, f)
    from flybody_tpu.physics import smooth as S
    qacc = d.qacc_smooth + S.solve_m(m, d, qfrc)

    # float32 safety: degenerate solve -> fall back to the smooth solution
    ok = jnp.all(jnp.isfinite(qacc), axis=0)   # (B,)
    qacc = jnp.where(ok, qacc, d.qacc_smooth)
    qfrc = jnp.where(ok, qfrc, 0.0)

    # compact selected-force bookkeeping (warm start + force consumers)
    if groups:
        warm_sel = jnp.concatenate([g.sel for g in groups], axis=0)
        pads = []
        for g, f in zip(groups, f_groups):
            ndim = f.shape[1]
            pads.append(jnp.concatenate(
                [f, jnp.zeros((g.K, 3 - ndim, f.shape[-1]), f.dtype)],
                axis=1) * ok)
        warm_f = jnp.concatenate(pads, axis=0)
    else:
        warm_sel, warm_f = d.warm_sel, d.warm_f
    warm_lim = (f_lim * ok) if lim is not None else d.warm_lim
    return d.replace(qacc=qacc, qfrc_constraint=qfrc,
                     warm_sel=warm_sel.astype(jnp.int32), warm_f=warm_f,
                     warm_lim=warm_lim)


def selected_force_mask(sel: jnp.ndarray, slots: np.ndarray) -> jnp.ndarray:
    """(Ksum, B) 0/1 mask: selected slot id is in the static `slots` set."""
    hit = sel[:, None, :] == jnp.asarray(slots, jnp.int32)[None, :, None]
    return jnp.any(hit, axis=1)
