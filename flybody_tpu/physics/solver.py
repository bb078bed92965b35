"""Primal Newton constraint solver with exact elliptic-cone Hessian.

Minimizes the MuJoCo primal objective
    phi(x) = 0.5 (x-a)' M (x-a) + sum_c env_c(J_c x - aref_c)
where env_c is the Moreau envelope of the cone-constrained quadratic
(force = projection of y = -D jar onto the friction cone). Gradient
-J'f(jar) and the exact projection Jacobian give true second-order steps;
a bracketed safeguarded-Newton linesearch guarantees monotone descent.

All shapes static: K selected contacts per condim group + limit rows.
Per-iteration cost: one (nv,nv) Cholesky + a few (rows,nv) GEMMs —
batched over envs these map onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cone_force_blocks(y, mu):
    """Projection of y=(yn, t1, t2) onto the friction cone + Jacobian.

    y: (K, 3) in force space; mu: (K,). Returns f (K, 3) and dP (K, 3, 3)
    (symmetric PSD projection Jacobian).
    """
    yn = y[:, 0]
    yt_vec = y[:, 1:]
    yt = jnp.sqrt(jnp.sum(yt_vec ** 2, axis=-1) + 1e-20)
    that = yt_vec / yt[:, None]
    mu2 = 1.0 + mu * mu

    top = (yn + mu * yt) <= 0.0
    bottom = mu * yn >= yt

    fn_mid = (yn + mu * yt) / mu2
    f_mid = jnp.concatenate(
        [fn_mid[:, None], (mu * fn_mid)[:, None] * that], axis=-1)
    f = jnp.where(top[:, None], 0.0,
                  jnp.where(bottom[:, None], y, f_mid))

    # dP blocks
    eye3 = jnp.eye(3, dtype=y.dtype)
    K = y.shape[0]
    # middle-zone Jacobian
    tt = that[:, :, None] * that[:, None, :]              # (K, 2, 2)
    eye2 = jnp.eye(2, dtype=y.dtype)
    d_fn = jnp.concatenate([jnp.ones((K, 1), y.dtype),
                            mu[:, None] * that], axis=-1) / mu2[:, None]
    d_ft_n = (mu / mu2)[:, None] * that                    # (K, 2)
    d_ft_t = ((mu * mu / mu2)[:, None, None] * tt
              + (mu * fn_mid / yt)[:, None, None] * (eye2 - tt))
    mid = jnp.zeros((K, 3, 3), y.dtype)
    mid = mid.at[:, 0, :].set(d_fn)
    mid = mid.at[:, 1:, 0].set(d_ft_n)
    mid = mid.at[:, 1:, 1:].set(d_ft_t)

    dP = jnp.where(top[:, None, None], 0.0,
                   jnp.where(bottom[:, None, None], eye3, mid))
    return f, dP


def make_cost_fns(meta, efc):
    """Build force/curvature evaluators over the static row layout.

    Returns:
      force(jar) -> (f, wdiag, blocks): per-row force, diagonal curvature
        weights for uncoupled rows, and per-cone-group (K,3,3) curvature
        blocks (D * dP) keyed by group index.
    """
    D = efc["D"]
    cones = efc["cones"]
    mu_all = efc["mu"]
    row_active = efc["row_active"].astype(D.dtype)

    def force(jar):
        y = -D * jar
        f = jnp.where(jar < 0, y, 0.0) * row_active
        w = jnp.where(jar < 0, D, 0.0) * row_active
        blocks = []
        mu_idx = 0
        for (start, cd, K) in cones:
            if cd == 1:
                blocks.append(None)
                continue
            ndim = min(cd, 3)
            rows = [jar[start + t * K: start + (t + 1) * K]
                    for t in range(ndim)]
            jar_c = jnp.stack(rows, axis=-1)               # (K, ndim)
            Dn = D[start:start + K]
            y_c = -Dn[:, None] * jar_c
            mu = mu_all[mu_idx]
            mu_idx += 1
            act = row_active[start:start + K]              # (K,)
            f_c, dP = _cone_force_blocks(y_c, mu)
            f_c = f_c * act[:, None]
            B = (Dn * act)[:, None, None] * dP             # (K, 3, 3)
            for t in range(ndim):
                f = f.at[start + t * K: start + (t + 1) * K].set(f_c[:, t])
                w = w.at[start + t * K: start + (t + 1) * K].set(0.0)
            blocks.append(B)
        return f, w, blocks

    return force


def solve_newton(M, a_smooth, efc, meta, iterations: int = 8,
                 ls_iterations: int = 8):
    """Newton solve; returns (x = qacc, f = efc forces at x)."""
    J, aref = efc["J"], efc["aref"]
    cones = efc["cones"]
    force = make_cost_fns(meta, efc)
    dtype = a_smooth.dtype
    eye = jnp.eye(M.shape[0], dtype=dtype)

    def cone_quad(blocks, v):
        """sum_c v_c' B_c v_c for a row-space vector v (e.g. Jp)."""
        total = jnp.zeros((), dtype)
        for (start, cd, K), B in zip(cones, blocks):
            if B is None:
                continue
            ndim = min(cd, 3)
            v_c = jnp.stack([v[start + t * K: start + (t + 1) * K]
                             for t in range(ndim)], axis=-1)
            total = total + jnp.einsum("ki,kij,kj->", v_c, B, v_c)
        return total

    def cone_JBJ(blocks, Jmat):
        """sum_c J_c' B_c J_c (nv, nv)."""
        total = jnp.zeros_like(M)
        for (start, cd, K), B in zip(cones, blocks):
            if B is None:
                continue
            ndim = min(cd, 3)
            Jc = jnp.stack([Jmat[start + t * K: start + (t + 1) * K]
                            for t in range(ndim)], axis=1)   # (K, ndim, nv)
            total = total + jnp.einsum("kiv,kij,kjw->vw", Jc, B, Jc)
        return total

    def newton_iter(x, _):
        jar = J @ x - aref
        f, w, blocks = force(jar)
        grad = M @ (x - a_smooth) - J.T @ f
        H = M + (J.T * w) @ J + cone_JBJ(blocks, J)
        # relative diagonal regularization: duplicate contact rows make H
        # rank-deficient; a 1e-5 (f32) relative bump keeps the Jacobi-scaled
        # factorization strictly PD with negligible force error
        rel = 1e-5 if H.dtype == jnp.float32 else 1e-12
        H = H + jnp.diag(rel * jnp.diag(H) + 1e-12)
        from flybody_tpu.ops import linalg as LA
        p = -LA.cho_solve(LA.cho_factor(H), grad)
        # trust region: near-deficient Hessian directions (duplicate
        # contact rows, float32) can yield astronomically long steps; cap
        # the step so the linesearch explores a sane interval. The cap is
        # far above physical accelerations (CGS qacc ~ 1e6) but far below
        # float32 overflow when squared.
        pmax = jnp.max(jnp.abs(p))
        cap = jnp.asarray(1e8, dtype)
        p = p * jnp.minimum(1.0, cap / jnp.maximum(pmax, 1e-12))
        Jp = J @ p
        pMp = p @ (M @ p)
        pM_xa = p @ (M @ (x - a_smooth))

        def dphi_ddphi(alpha):
            jar_a = jar + alpha * Jp
            f_a, w_a, blocks_a = force(jar_a)
            dphi = pM_xa + alpha * pMp - Jp @ f_a
            ddphi = pMp + jnp.sum(w_a * Jp * Jp) + cone_quad(blocks_a, Jp)
            return dphi, ddphi

        # bracket [lo, hi]: dphi(0) < 0 (descent dir); expand hi until
        # dphi(hi) >= 0 (or give up after 6 doublings).
        def expand(carry, _):
            hi, done = carry
            dp, _dd = dphi_ddphi(hi)
            done2 = done | (dp >= 0)
            hi2 = jnp.where(done2, hi, hi * 2.0)
            return (hi2, done2), None

        (hi, _), _ = jax.lax.scan(expand, (jnp.asarray(1.0, dtype),
                                           jnp.asarray(False)), None,
                                  length=3)

        def ls_step(carry, _):
            lo, hi_, alpha = carry
            dp, dd = dphi_ddphi(alpha)
            lo2 = jnp.where(dp < 0, alpha, lo)
            hi2 = jnp.where(dp < 0, hi_, alpha)
            cand = alpha - dp / jnp.maximum(dd, 1e-12)
            inside = (cand > lo2) & (cand < hi2)
            alpha2 = jnp.where(inside, cand, 0.5 * (lo2 + hi2))
            return (lo2, hi2, alpha2), None

        (lo, hi2, alpha), _ = jax.lax.scan(
            ls_step, (jnp.asarray(0.0, dtype), hi, 0.5 * hi), None,
            length=ls_iterations)
        return x + alpha * p, None

    x, _ = jax.lax.scan(newton_iter, a_smooth, None, length=iterations)
    jar = J @ x - aref
    f, _, _ = force(jar)
    return x, f
