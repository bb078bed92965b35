"""Dense-dual ADMM constraint solver.

Same dual QP as physics/solver.py:

    min_{f in K}  0.5 f' (A + R) f  -  f' b,   A = J M^-1 J', b = aref - J a0

but A is ASSEMBLED once per substep instead of applied matrix-free:

  * X = M^-1 J'   via the sparse tree factor (one batched multi-rhs solve)
  * A = J X       one (rows, nv) x (nv, rows) GEMM per env -> MXU
  * Jacobi scaling s = 1/sqrt(diag(A) + R), uniform per friction cone so
    the scaled feasible set is still a product of cones
  * ADMM on the scaled problem: the f-step factors (A_s + rho I) ONCE
    (blocked batched Cholesky, ops/linalg) and each iteration is two
    triangular solves + a cone projection.

Why: warm-started APGD needs ~64 matrix-free iterations for <1% qacc
error on the full-contact fly (each iteration re-streaming the (rows,
nv, B) Jacobian through the tree solve), while ADMM with a cached dense
factor reaches the same accuracy in ~15-25 iterations whose cost is
(rows^2 B) MACs on the MXU. Total work is dominated by the ONE assembly
+ factorization. On TPU this trades HBM-bandwidth-bound sparse sweeps
for compute-bound dense GEMMs — the profitable direction (PERF.md).

Scaled ADMM with unit-diagonal A_s: a fixed rho works across states
(grid-searched on the full-contact fly: rho=10, over-relaxation
alpha=1.9 reach <1% qacc error in 20 iterations; no per-env spectral
estimation needed — the APGD power iteration disappears).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.ops import linalg as LA
from flybody_tpu.ops import tree_ldl as TL
from flybody_tpu.physics.types import Data, Model


LIMIT_ACTIVE = 32   # top-K selected limit rows in the dense system


class _LimSel:
    """Per-env top-K selection of limit rows (by margin-adjusted limit
    distance, most-violating first). The reference fly has 102 limited
    joints but ~15 near their range at any state; carrying all of them
    into the dense system would triple its bandwidth for rows that are
    inactive by construction. Selection/scatter are one-hot contractions
    (no per-env dynamic gathers of nv-sized arrays)."""

    def __init__(self, lim, K: int):
        nl = lim.sign.shape[0]
        self.nl = nl
        self.K = min(K, nl)
        dtype = lim.sign.dtype
        _, top = jax.lax.top_k(-lim.pos.T, self.K)    # (B, K)
        self.idx = top.T                              # (K, B)
        self.oh = jax.nn.one_hot(self.idx, nl, axis=1,
                                 dtype=dtype)         # (K, nl, B)
        self.sign = jnp.einsum("klB,lB->kB", self.oh, lim.sign)
        self.aref = jnp.einsum("klB,lB->kB", self.oh, lim.aref)
        self.R = jnp.einsum("klB,lB->kB", self.oh, lim.R)
        self.active = jnp.einsum("klB,lB->kB", self.oh, lim.active)
        dadr = jnp.asarray(np.asarray(lim.dadr), jnp.int32)[self.idx]
        self.dadr_sel = dadr                          # (K, B)

    def rows_j(self, nv: int):
        ohv = jax.nn.one_hot(self.dadr_sel, nv, axis=1,
                             dtype=self.sign.dtype)   # (K, nv, B)
        return ohv * self.sign[:, None, :]

    def scatter_forces(self, f_sel):
        """(K, B) selected forces -> (nl, B) full limit-force vector."""
        return jnp.einsum("klB,kB->lB", self.oh, f_sel)


def _gather_rows(lim, ls, groups, d):
    """Build flat (rows, nv, B) J and (rows, B) aref/R/active."""
    nv, B = d.qvel.shape
    Js, arefs, Rs, actives = [], [], [], []
    if ls is not None:
        Js.append(ls.rows_j(nv))
        arefs.append(ls.aref)
        Rs.append(ls.R)
        actives.append(ls.active)
    for g in groups:
        ndim = min(g.condim, 3)
        Js.append(g.jac.reshape(g.K * ndim, nv, B))
        arefs.append(g.aref.reshape(g.K * ndim, B))
        Rs.append(g.R.reshape(g.K * ndim, B))
        actives.append(jnp.repeat(g.active, ndim, axis=0))
    return (jnp.concatenate(Js, axis=0), jnp.concatenate(arefs, axis=0),
            jnp.concatenate(Rs, axis=0), jnp.concatenate(actives, axis=0))


def _proj_groups(ls, groups, f_flat):
    """Project the flat scaled force vector onto the feasible set.

    Row scaling is uniform within each cone, so the elliptic projection
    formulas from solver.py apply unchanged in the scaled space."""
    out = []
    off = 0
    if ls is not None:
        fl = f_flat[:ls.K]
        out.append(jnp.maximum(fl, 0.0) * ls.active)
        off = ls.K
    for g in groups:
        ndim = min(g.condim, 3)
        f = f_flat[off:off + g.K * ndim].reshape(g.K, ndim, -1)
        off += g.K * ndim
        if ndim == 1:
            out.append((jnp.maximum(f, 0.0)
                        * g.active[:, None]).reshape(g.K, -1))
            continue
        fn = f[:, 0]
        ft = f[:, 1:]
        t = jnp.sqrt(jnp.sum(ft * ft, axis=1)) + 1e-20
        mu = g.mu
        inside = t <= mu * fn
        zero = mu * t <= -fn
        fn_m = (fn + mu * t) / (1.0 + mu * mu)
        scale_t = mu * fn_m / t
        fn_new = jnp.where(inside, fn, jnp.where(zero, 0.0, fn_m))
        ft_new = jnp.where(inside[:, None], ft,
                           jnp.where(zero[:, None], 0.0,
                                     ft * scale_t[:, None]))
        proj = jnp.concatenate([fn_new[:, None], ft_new], axis=1)
        out.append((proj * g.active[:, None]).reshape(g.K * ndim, -1))
    return jnp.concatenate(out, axis=0)


def _warm_flat(ls, groups, d, dtype):
    """Flat warm-start forces matched from the previous step's selected
    slots (same membership contraction as solver.py)."""
    parts = []
    if ls is not None:
        parts.append(jnp.einsum("klB,lB->kB", ls.oh,
                                d.warm_lim.astype(dtype)))
    for g in groups:
        ndim = min(g.condim, 3)
        hit = (g.sel[:, None, :] == d.warm_sel[None, :, :]).astype(dtype)
        prev = jnp.einsum("kjB,jdB->kdB", hit, d.warm_f)[:, :ndim]
        parts.append(prev.reshape(g.K * ndim, -1))
    return jnp.concatenate(parts, axis=0)


def solve_dual_dense(m: Model, d: Data, lim, groups,
                     iterations: int = 20, noslip_iterations: int = 0,
                     rho: float = 10.0, alpha: float = 1.9,
                     use_kernel: bool = False):
    """Returns (f_lim (nl, B) | None, [f_group (K, dim, B)]) like
    solver.solve_dual, computed by dense ADMM (over-relaxation alpha).

    use_kernel: run the iteration loop in the fused Pallas kernel
    (ops/admm_kernel.py) with the INVERTED scaled operator resident in
    VMEM — one HBM read of the operator for all iterations instead of
    one per iteration. Requires the flat row layout to be
    [nonneg rows | condim-3 cones] (asserted) and rows <= 256."""
    dtype = d.qpos.dtype
    nv, B = d.qvel.shape

    ls = _LimSel(lim, LIMIT_ACTIVE) if lim is not None else None
    J, aref, Rreg, active = _gather_rows(lim, ls, groups, d)
    rows = J.shape[0]

    # ---- assemble A = J M^-1 J' (one multi-rhs tree solve + one GEMM)
    Jt = jnp.moveaxis(J, 0, 1)                    # (nv, rows, B)
    X = TL.solve(m.tree, d.qLD, d.qLDiagInv, Jt)  # (nv, rows, B)
    A = jnp.einsum("rvB,vsB->Brs", J, X)          # (B, rows, rows)

    b = aref - jnp.einsum("rvB,vB->rB", J, d.qacc_smooth)

    # ---- per-cone Jacobi scaling (uniform inside each cone)
    diagA = jnp.einsum("Brr->Br", A).T + Rreg     # (rows, B)
    # replicate the normal row's diag across each cone's rows
    off = 0
    dlist = []
    if ls is not None:
        dlist.append(diagA[:ls.K])
        off = ls.K
    for g in groups:
        ndim = min(g.condim, 3)
        dn = diagA[off:off + g.K * ndim].reshape(g.K, ndim, B)[:, 0]
        dlist.append(jnp.repeat(dn, ndim, axis=0))
        off += g.K * ndim
    dcone = jnp.concatenate(dlist, axis=0)        # (rows, B)
    s = 1.0 / jnp.sqrt(jnp.maximum(dcone, 1e-12))

    # scaled operator: As = S (A + diag(Rreg)) S, unit-ish diagonal
    SA = A * s.T[:, :, None] * s.T[:, None, :]
    SA = SA.at[:, jnp.arange(rows), jnp.arange(rows)].add(
        (Rreg * s * s).T)
    bs = b * s

    rho_a = jnp.asarray(rho, dtype)
    alpha_a = jnp.asarray(alpha, dtype)
    Mf = SA + jnp.zeros_like(SA).at[
        :, jnp.arange(rows), jnp.arange(rows)].add(rho_a)
    fac = LA.cho_factor(Mf)

    z0 = _warm_flat(ls, groups, d, dtype) / jnp.maximum(s, 1e-30)

    if use_kernel:
        # flat layout must be [nonneg rows | condim-3 cones]
        kl = (ls.K if ls is not None else 0)
        kc = 0
        seen_cone = False
        mus = []
        for g in groups:
            ndim = min(g.condim, 3)
            if ndim == 1:
                assert not seen_cone, "condim-1 group after a cone group"
                kl += g.K
            else:
                assert ndim == 3, "admm kernel supports condim 1/3 only"
                seen_cone = True
                kc += g.K
                mus.append(g.mu)
        if kc == 0 or rows > 256:
            use_kernel = False     # kernel VMEM budget / layout limits
    if use_kernel:
        from flybody_tpu.ops import admm_kernel as AK
        mu = jnp.concatenate(mus, axis=0)
        # inverted scaled operator (rows solves against the identity);
        # cond(Mf) <= ~(1 + lam_max/rho) — safe to invert explicitly
        eye = jnp.broadcast_to(jnp.eye(rows, dtype=dtype), Mf.shape)
        W = jnp.moveaxis(LA.cho_solve(fac, eye), 0, -1)  # (rows, rows, B)
        z = AK.admm_iterate(
            W.astype(jnp.float32), bs.astype(jnp.float32),
            z0.astype(jnp.float32), mu.astype(jnp.float32),
            active.astype(jnp.float32),
            kl=kl, kc=kc, iterations=iterations, rho=float(rho),
            alpha=float(alpha)).astype(dtype)
    else:
        def lin_solve(rhs):                       # rhs (rows, B)
            return LA.cho_solve(fac, rhs.T).T

        z = _proj_groups(ls, groups, z0)
        u = jnp.zeros_like(z)

        def body(carry, _):
            z, u = carry
            f = lin_solve(bs + rho_a * (z - u))
            fr = alpha_a * f + (1.0 - alpha_a) * z   # over-relaxation
            z_new = _proj_groups(ls, groups, fr + u)
            u_new = u + fr - z_new
            return (z_new, u_new), None

        (z, u), _ = jax.lax.scan(body, (z, u), None, length=iterations)
    f_flat = z * s                                # unscale

    # ---- noslip post-pass: tangentials with R = 0, normals frozen,
    # projected gradient on the dense operator (cheap (B,R,R) matvecs)
    has_friction = any(min(g.condim, 3) > 1 for g in groups)
    if noslip_iterations > 0 and has_friction:
        nl = ls.K if ls is not None else 0

        def split(ff):
            out = []
            off2 = nl
            for g in groups:
                ndim = min(g.condim, 3)
                out.append(ff[off2:off2 + g.K * ndim].reshape(g.K, ndim,
                                                              -1))
                off2 += g.K * ndim
            return out

        fn_frozen = [f[:, 0] for f in split(f_flat)]

        def ns_body(ff, _):
            grad = jnp.einsum("Brs,sB->rB", A, ff) - b
            step = ff - (s * s) * grad            # Jacobi-scaled step
            parts = split(step)
            cur = split(ff)
            out = [ff[:nl]] if nl else []
            for g, p, c, fn in zip(groups, parts, cur, fn_frozen):
                ndim = min(g.condim, 3)
                if ndim == 1:
                    out.append(c.reshape(g.K, -1))
                    continue
                ft = p[:, 1:]
                t = jnp.sqrt(jnp.sum(ft * ft, axis=1)) + 1e-20
                cap = jnp.maximum(g.mu * fn, 0.0)
                ft = ft * jnp.minimum(1.0, cap / t)[:, None]
                new = jnp.concatenate([fn[:, None], ft], axis=1)
                out.append((new * g.active[:, None]).reshape(g.K * ndim,
                                                             -1))
            return jnp.concatenate(out, axis=0), None

        f_flat, _ = jax.lax.scan(ns_body, f_flat, None,
                                 length=2 * noslip_iterations)

    # ---- unflatten
    off = 0
    f_lim = None
    if ls is not None:
        f_lim = ls.scatter_forces(f_flat[:ls.K])
        off = ls.K
    f_groups = []
    for g in groups:
        ndim = min(g.condim, 3)
        f_groups.append(f_flat[off:off + g.K * ndim].reshape(g.K, ndim,
                                                             B))
        off += g.K * ndim
    return f_lim, f_groups
