"""Pallas kernels for the fused flat-row dual contact solver.

Two kernels built around the factorization A = J M^-1 J^T = Yd^T Yd with
Yd = D^{-1/2} L^{-T} J^T computed from the sparse kinematic-tree LDL^T
factor (ops/tree_ldl):

* ``upsolve_yd`` — the multi-RHS triangular up-solve L^{-T} J^T plus the
  D^{-1/2} scaling and the dual rhs b = aref - J qacc_smooth, with the
  per-env (nv, R) workspace resident in VMEM. The XLA formulation of the
  same sweep streams the (nv, R, B) workspace through HBM once per tree
  level (~2.3 GB/substep at R=112, B=4096); here it is ONE read of J and
  ONE write of Yd.

* ``apgd_iterate`` — the entire APGD loop (Jacobi/cone-uniform scaling,
  per-env power-iteration Lipschitz estimate, momentum with adaptive
  restart, elliptic cone projections, noslip tangential post-pass) with
  Yd resident in VMEM. HBM traffic is ONE read of Yd per substep instead
  of two per iteration.

Row layout (static): [ Kl nonneg rows (limits + condim-1 contacts, padded)
| Kc cone NORMAL rows | Kc cone TANGENT-1 rows | Kc cone TANGENT-2 rows ].
Segment-major cone storage keeps every in-kernel slice contiguous (no
sublane reshapes in the iteration loop).

Both kernels have pure-jnp reference twins (used on non-TPU backends and
by the parity tests).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flat_up(tree):
    """Concatenate the tree's up-sweep triplets (leaves-first order)."""
    out = []
    for ii, ee, jj in tree.solve_up:
        out += [(int(i), int(e), int(j)) for i, e, j in zip(ii, ee, jj)]
    return tuple(out)


def _flat_down(tree):
    """Concatenate the tree's down-sweep triplets (root-first order)."""
    out = []
    for ii, ee, jj in tree.solve_down:
        out += [(int(i), int(e), int(j)) for i, e, j in zip(ii, ee, jj)]
    return tuple(out)


# --------------------------------------------------------------------------
# Kernel A: Yd = D^{-1/2} L^{-T} J^T  and  b = aref - J qacc_smooth
# --------------------------------------------------------------------------


def _upsolve_kernel(jt_ref, ld_ref, dinv_ref, qs_ref, qvel_ref,
                    kcoef_ref, bcoef_ref, posr_ref, yd_ref, b_ref, *, up):
    x = jt_ref[...]                                   # (nv, Rb, LANE)
    # dual rhs b = aref - J qacc_smooth with the uniform row form
    # aref = -bcoef * (J qvel) - kcoef * pos  (tangent rows: kcoef = 0)
    velj = jnp.sum(x * qvel_ref[...][:, None, :], axis=0)
    aj = jnp.sum(x * qs_ref[...][:, None, :], axis=0)
    b_ref[...] = (-bcoef_ref[...] * velj - kcoef_ref[...] * posr_ref[...]
                  - aj)
    yd_ref[...] = x
    ld = ld_ref[...]                                  # (nM, LANE)
    for i, e, j in up:
        yd_ref[j] = yd_ref[j] - ld[e][None, :] * yd_ref[i]
    yd_ref[...] = yd_ref[...] * jnp.sqrt(dinv_ref[...])[:, None, :]


def upsolve_yd(tree, jt, ld, dinv, qacc_smooth, qvel, kcoef, bcoef, posr,
               interpret: bool | None = None, block_r: int = 32):
    """jt (nv, R, B), ld (nM, B), dinv/qacc_smooth/qvel (nv, B),
    kcoef/bcoef/posr (R, B) -> (yd (nv, R, B), b (R, B)) with
    b = -bcoef (J qvel) - kcoef posr - J qacc_smooth.
    R, B padded internally."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nv, R, B = jt.shape
    nM = ld.shape[0]
    Bp = max(_round_up(B, LANE), LANE)
    Rp = max(_round_up(R, block_r), block_r)
    if Bp != B or Rp != R:
        jt = jnp.pad(jt, ((0, 0), (0, Rp - R), (0, Bp - B)))
        kcoef = jnp.pad(kcoef, ((0, Rp - R), (0, Bp - B)))
        bcoef = jnp.pad(bcoef, ((0, Rp - R), (0, Bp - B)))
        posr = jnp.pad(posr, ((0, Rp - R), (0, Bp - B)))
        ld = jnp.pad(ld, ((0, 0), (0, Bp - B)))
        # padded lanes: Dinv/qs zero is fine (rows are discarded)
        dinv = jnp.pad(dinv, ((0, 0), (0, Bp - B)))
        qacc_smooth = jnp.pad(qacc_smooth, ((0, 0), (0, Bp - B)))
        qvel = jnp.pad(qvel, ((0, 0), (0, Bp - B)))

    kernel = functools.partial(_upsolve_kernel, up=_flat_up(tree))
    vec = lambda: pl.BlockSpec((nv, LANE), lambda ib, ir: (0, ib),
                               memory_space=pltpu.VMEM)
    rvec = lambda: pl.BlockSpec((block_r, LANE), lambda ib, ir: (ir, ib),
                                memory_space=pltpu.VMEM)
    yd, b = pl.pallas_call(
        kernel,
        grid=(Bp // LANE, Rp // block_r),
        in_specs=[
            pl.BlockSpec((nv, block_r, LANE), lambda ib, ir: (0, ir, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nM, LANE), lambda ib, ir: (0, ib),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
            rvec(), rvec(), rvec(),
        ],
        out_specs=(
            pl.BlockSpec((nv, block_r, LANE), lambda ib, ir: (0, ir, ib),
                         memory_space=pltpu.VMEM),
            rvec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nv, Rp, Bp), jt.dtype),
            jax.ShapeDtypeStruct((Rp, Bp), jt.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jt, ld, dinv, qacc_smooth, qvel, kcoef, bcoef, posr)
    return yd[:, :R, :B], b[:R, :B]


def upsolve_yd_reference(tree, jt, ld, dinv, qacc_smooth, qvel, kcoef,
                         bcoef, posr):
    """Pure-jnp twin of upsolve_yd (same math, HBM-streaming)."""
    velj = jnp.einsum("vrB,vB->rB", jt, qvel)
    aj = jnp.einsum("vrB,vB->rB", jt, qacc_smooth)
    b = -bcoef * velj - kcoef * posr - aj
    x = jt
    for ii, ee, jj in tree.solve_up:
        x = x.at[jj].add(-ld[ee][:, None] * x[ii])
    yd = x * jnp.sqrt(dinv)[:, None, :]
    return yd, b


# --------------------------------------------------------------------------
# Kernel A2: J rows built IN-KERNEL (jt never materialized in HBM)
# --------------------------------------------------------------------------


def build_jt_reference(d6, u6, b1, b2, lim_sign, lim_dadr, maskd):
    """Dense J^T from the compact row form (pure jnp twin).

    J[r, v] = (sum_c d6[v,c] u6[r,c]) * (maskd[b2_r, v] - maskd[b1_r, v])
              + lim_sign[r] * [v == lim_dadr[r]]
    d6 (nv, 6, B); u6 (R, 6, B); b1/b2/lim_dadr (R, B) int32;
    lim_sign (R, B); maskd (nbody, nv) -> jt (nv, R, B)."""
    nbody, nv = maskd.shape
    dtype = d6.dtype
    iota_b = jnp.arange(nbody, dtype=jnp.int32)[None, :, None]
    ohd = ((b2[:, None, :] == iota_b).astype(dtype)
           - (b1[:, None, :] == iota_b).astype(dtype))      # (R, nbody, B)
    mdiff = jnp.einsum("rbB,bv->vrB", ohd, maskd.astype(dtype))
    dots = jnp.einsum("vcB,rcB->vrB", d6, u6)
    iota_v = jnp.arange(nv, dtype=jnp.int32)[:, None, None]
    lim = (iota_v == lim_dadr[None]).astype(dtype) * lim_sign[None]
    return dots * mdiff + lim


def _upsolve_build_kernel(d6_ref, u6_ref, b1_ref, b2_ref, ls_ref, ld_adr_ref,
                          maskd_ref, ld_ref, dinv_ref, qs_ref, qvel_ref,
                          kcoef_ref, bcoef_ref, posr_ref, yd_ref, b_ref,
                          *, up, nbody, nv):
    dtype = d6_ref.dtype
    b1 = b1_ref[...]
    b2 = b2_ref[...]
    # one-hot body difference directly in (nbody, Rb, L) layout
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (nbody, 1, 1), 0)
    ohd = ((b2[None] == iota_b).astype(dtype)
           - (b1[None] == iota_b).astype(dtype))           # (nbody, Rb, L)
    maskd = maskd_ref[...].astype(dtype)                    # (nbody, nv)
    mdiff = jax.lax.dot_general(
        maskd, ohd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)   # (nv, Rb, L)
    d6 = d6_ref[...]                                        # (nv, 6, L)
    u6 = u6_ref[...]                                        # (Rb, 6, L)
    # Mosaic lowers integer middle-dim indexing of 3D arrays to a >2D
    # gather (unsupported); explicit unit slices keep it a strided copy
    dots = None
    for c in range(6):
        d6c = jax.lax.slice_in_dim(d6, c, c + 1, axis=1)    # (nv, 1, L)
        u6c = jnp.reshape(
            jax.lax.slice_in_dim(u6, c, c + 1, axis=1),
            (1, u6.shape[0], u6.shape[2]))                  # (1, Rb, L)
        term = d6c * u6c                                    # (nv, Rb, L)
        dots = term if dots is None else dots + term
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
    lim = ((iota_v == ld_adr_ref[...][None]).astype(dtype)
           * ls_ref[...][None])
    x = dots * mdiff + lim                                  # jt block
    velj = jnp.sum(x * qvel_ref[...][:, None, :], axis=0)
    aj = jnp.sum(x * qs_ref[...][:, None, :], axis=0)
    b_ref[...] = (-bcoef_ref[...] * velj - kcoef_ref[...] * posr_ref[...]
                  - aj)
    yd_ref[...] = x
    ld = ld_ref[...]
    for i, e, j in up:
        yd_ref[j] = yd_ref[j] - ld[e][None, :] * yd_ref[i]
    yd_ref[...] = yd_ref[...] * jnp.sqrt(dinv_ref[...])[:, None, :]


def upsolve_build_yd(tree, d6, u6, b1, b2, lim_sign, lim_dadr, maskd,
                     ld, dinv, qacc_smooth, qvel, kcoef, bcoef, posr,
                     interpret: bool | None = None, block_r: int = 32):
    """Fused J build + triangular up-solve: J^T is constructed from the
    compact per-row form inside VMEM and never written to HBM (the
    (nv, R, B) jt tensor of the unfused path is ~190 MB/substep of HBM
    traffic at B=4096). Same outputs as upsolve_yd."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nv = d6.shape[0]
    R, _, B = u6.shape
    nbody = maskd.shape[0]
    nM = ld.shape[0]
    if interpret:
        jt = build_jt_reference(d6, u6, b1, b2, lim_sign, lim_dadr,
                                jnp.asarray(maskd, d6.dtype))
        return upsolve_yd_reference(tree, jt, ld, dinv, qacc_smooth,
                                    qvel, kcoef, bcoef, posr)

    Bp = max(_round_up(B, LANE), LANE)
    Rp = max(_round_up(R, block_r), block_r)
    padr = lambda x: jnp.pad(x, ((0, Rp - R),) + ((0, 0),) * (x.ndim - 2)
                             + ((0, Bp - B),))
    padb = lambda x: jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, Bp - B),))
    u6 = padr(u6)
    b1 = padr(b1)
    b2 = padr(b2)
    # padded rows: b1 == b2 == 0 -> mdiff 0; lim_dadr -1 -> no hit
    lim_sign = padr(lim_sign)
    lim_dadr = jnp.pad(lim_dadr, ((0, Rp - R), (0, Bp - B)),
                       constant_values=-1)
    kcoef = padr(kcoef)
    bcoef = padr(bcoef)
    posr = padr(posr)
    d6 = padb(d6)
    ld = padb(ld)
    dinv = padb(dinv)
    qacc_smooth = padb(qacc_smooth)
    qvel = padb(qvel)
    maskd_a = jnp.asarray(maskd, d6.dtype)

    kernel = functools.partial(_upsolve_build_kernel, up=_flat_up(tree),
                               nbody=nbody, nv=nv)
    vec = lambda: pl.BlockSpec((nv, LANE), lambda ib, ir: (0, ib),
                               memory_space=pltpu.VMEM)
    rvec = lambda: pl.BlockSpec((block_r, LANE), lambda ib, ir: (ir, ib),
                                memory_space=pltpu.VMEM)
    yd, b = pl.pallas_call(
        kernel,
        grid=(Bp // LANE, Rp // block_r),
        in_specs=[
            pl.BlockSpec((nv, 6, LANE), lambda ib, ir: (0, 0, ib),
                         memory_space=pltpu.VMEM),            # d6
            pl.BlockSpec((block_r, 6, LANE), lambda ib, ir: (ir, 0, ib),
                         memory_space=pltpu.VMEM),            # u6
            rvec(), rvec(), rvec(), rvec(),                   # b1 b2 ls ladr
            pl.BlockSpec((nbody, nv), lambda ib, ir: (0, 0),
                         memory_space=pltpu.VMEM),            # maskd
            pl.BlockSpec((nM, LANE), lambda ib, ir: (0, ib),
                         memory_space=pltpu.VMEM),            # ld
            vec(), vec(), vec(),                              # dinv qs qvel
            rvec(), rvec(), rvec(),                           # k b posr
        ],
        out_specs=(
            pl.BlockSpec((nv, block_r, LANE), lambda ib, ir: (0, ir, ib),
                         memory_space=pltpu.VMEM),
            rvec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nv, Rp, Bp), d6.dtype),
            jax.ShapeDtypeStruct((Rp, Bp), d6.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d6, u6, b1, b2, lim_sign, lim_dadr, maskd_a, ld, dinv,
      qacc_smooth, qvel, kcoef, bcoef, posr)
    return yd[:, :R, :B], b[:R, :B]


# --------------------------------------------------------------------------
# Kernel B: fused APGD + noslip on A = Yd^T Yd (+R), everything in VMEM
# --------------------------------------------------------------------------


def _apgd_math(yd, b, rreg, act, mu, f0, v0, *, kl, kc, iterations,
               noslip_iterations, power_iters):
    """Shared kernel/reference math. yd (nv, R, L), vectors (R, L) or
    (kc, L); v0 = warm power-iteration start (previous substep's
    eigenvector; physics/types.py Data.apgd_v). Returns
    (f (R, L), ystar (nv, L), v (R, L))."""
    dtype = yd.dtype
    n0, n1, n2 = kl, kl + kc, kl + 2 * kc

    def mv_y(f):                     # Yd f -> (nv, L)
        return jnp.sum(yd * f[None, :, :], axis=1)

    def mv_a(f):                     # Yd^T Yd f -> (R, L)
        return jnp.sum(yd * mv_y(f)[:, None, :], axis=0)

    diag_a = jnp.sum(yd * yd, axis=0)                 # (R, L)
    # cone-uniform Jacobi scaling (normal row's diag across the cone)
    dn = diag_a[n0:n1] + rreg[n0:n1]
    dcone = jnp.concatenate([diag_a[:kl] + rreg[:kl], dn, dn, dn], axis=0)
    s = 1.0 / jnp.sqrt(jnp.maximum(dcone, 1e-12))
    # scaled operator: As z = s (A + R) (s z); bs = s b
    bs = s * b
    s2r = s * s * rreg

    def mv_as(z):
        return s * mv_a(s * z) + s2r * z

    def proj(z, tangent_only=False, fn_frozen=None):
        head = z[:kl] if tangent_only else jnp.maximum(z[:kl], 0.0)
        fn = fn_frozen if tangent_only else z[n0:n1]
        t1 = z[n1:n2]
        t2 = z[n2:]
        t = jnp.sqrt(t1 * t1 + t2 * t2) + 1e-20
        if tangent_only:
            cap = jnp.maximum(mu * fn, 0.0)
            sc = jnp.minimum(1.0, cap / t)
            fn_new = fn
        else:
            inside = t <= mu * fn
            zero = mu * t <= -fn
            fn_m = (fn + mu * t) / (1.0 + mu * mu)
            fn_new = jnp.where(inside, fn, jnp.where(zero, 0.0, fn_m))
            sc = jnp.where(inside, 1.0,
                           jnp.where(zero, 0.0, mu * fn_m / t))
        return jnp.concatenate([head, fn_new, t1 * sc, t2 * sc],
                               axis=0) * act

    # ---- Lipschitz of As over active rows (power iteration, warm-
    # started from the previous substep's eigenvector) ----
    # blend with the active indicator: guarantees overlap with every
    # active row's eigencomponent (a NEW contact's stiff mode is near-
    # orthogonal to the carried vector; starting from v0 alone would
    # underestimate L and destabilize APGD)
    nrm0 = jnp.sqrt(jnp.sum(v0 * v0, axis=0, keepdims=True)) + 1e-30
    v = (v0 / nrm0 + act / jnp.sqrt(
        jnp.maximum(jnp.sum(act, axis=0, keepdims=True), 1.0))) * act
    L = jnp.ones_like(b[:1])
    for _ in range(power_iters):
        nrm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)) + 1e-30
        v = mv_as(v / nrm) * act
        L = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)) + 1e-30
    inv_l = 1.0 / jnp.maximum(1.5 * L, 1.0)
    v_out = v / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-30)

    z0 = proj(f0 / jnp.maximum(s, 1e-30))

    def body(_, carry):
        z, zp, kk = carry
        beta = kk / (kk + 3.0)
        y = z + beta * (z - zp)
        g = mv_as(y) - bs
        z_new = proj(y - inv_l * g)
        restart = jnp.sum(g * (z_new - z), axis=0, keepdims=True) > 0
        kk_new = jnp.where(restart, 0.0, kk + 1.0)
        return (z_new, z, kk_new)

    kk0 = jnp.zeros_like(b[:1])
    z, _, _ = jax.lax.fori_loop(0, iterations, body, (z0, z0, kk0))

    # ---- noslip: tangentials with R = 0, normals frozen ----
    if noslip_iterations > 0 and kc > 0:
        fn_frozen = z[n0:n1]
        pns = 1.0 / jnp.maximum(dcone * s * s, 1e-30)  # ~1 in scaled space

        def ns_body(_, z):
            g = s * mv_a(s * z) - bs                  # no R
            step = z - inv_l * pns * g
            head = jnp.concatenate([z[:kl], fn_frozen], axis=0)
            step = jnp.concatenate([head, step[n1:]], axis=0)
            return proj(step, tangent_only=True, fn_frozen=fn_frozen)

        z = jax.lax.fori_loop(0, 2 * noslip_iterations, ns_body, z)

    f = (s * z).astype(dtype)
    return f, mv_y(f), v_out.astype(dtype)


def _apgd_kernel(yd_ref, b_ref, rreg_ref, act_ref, mu_ref, f0_ref, v0_ref,
                 f_out, ystar_out, v_out, **kw):
    f, ystar, v = _apgd_math(yd_ref[...], b_ref[...], rreg_ref[...],
                             act_ref[...], mu_ref[...], f0_ref[...],
                             v0_ref[...], **kw)
    f_out[...] = f
    ystar_out[...] = ystar
    v_out[...] = v


def apgd_iterate(yd, b, rreg, active, mu, f0, v0=None, *, kl: int, kc: int,
                 iterations: int, noslip_iterations: int = 0,
                 power_iters: int = 4, interpret: bool | None = None):
    """Fused APGD on A = Yd^T Yd + diag(rreg).

    yd (nv, R, B); b/rreg/active/f0/v0 (R, B); mu (kc, B). Row layout
    [kl nonneg | kc normals | kc tangent1 | kc tangent2], R = kl + 3 kc.
    v0 warm-starts the Lipschitz power iteration (pass None for a cold
    active-indicator start). Returns (f (R, B), ystar = Yd f (nv, B),
    v (R, B) — the converged power vector for the next substep)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nv, R, B = yd.shape
    assert R == kl + 3 * kc
    if v0 is None:
        v0 = active
    Bp = max(_round_up(B, LANE), LANE)
    if Bp != B:
        pad = ((0, 0), (0, Bp - B))
        yd = jnp.pad(yd, ((0, 0), (0, 0), (0, Bp - B)))
        b = jnp.pad(b, pad)
        rreg = jnp.pad(rreg, pad, constant_values=1.0)
        active = jnp.pad(active, pad)
        mu = jnp.pad(mu, ((0, 0), (0, Bp - B)))
        f0 = jnp.pad(f0, pad)
        v0 = jnp.pad(v0, pad)

    kernel = functools.partial(
        _apgd_kernel, kl=kl, kc=kc, iterations=iterations,
        noslip_iterations=noslip_iterations, power_iters=power_iters)
    rvec = lambda: pl.BlockSpec((R, LANE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    f, ystar, v = pl.pallas_call(
        kernel,
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nv, R, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            rvec(), rvec(), rvec(),
            pl.BlockSpec((max(kc, 1), LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            rvec(), rvec(),
        ],
        out_specs=(
            rvec(),
            pl.BlockSpec((nv, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            rvec(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, Bp), yd.dtype),
            jax.ShapeDtypeStruct((nv, Bp), yd.dtype),
            jax.ShapeDtypeStruct((R, Bp), yd.dtype),
        ),
        # the (nv, R, LANE) resident Yd block plus the matvec temporaries
        # exceed the 16M default scoped-vmem budget; v5e has 128M physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yd, b, rreg, active, jnp.broadcast_to(mu, (max(kc, 1), Bp)), f0, v0)
    return f[:, :B], ystar[:, :B], v[:, :B]


def apgd_iterate_reference(yd, b, rreg, active, mu, f0, v0=None, *,
                           kl: int, kc: int, iterations: int,
                           noslip_iterations: int = 0,
                           power_iters: int = 4):
    """Pure-jnp twin of apgd_iterate (used on non-TPU backends)."""
    if v0 is None:
        v0 = active
    return _apgd_math(yd, b, rreg, active, mu, f0, v0, kl=kl, kc=kc,
                      iterations=iterations,
                      noslip_iterations=noslip_iterations,
                      power_iters=power_iters)


# --------------------------------------------------------------------------
# Kernel C: the WHOLE dual solve in one pallas_call. J build + triangular
# up-solve + APGD (+ noslip) + the two output tree sweeps, with Yd living
# only in VMEM scratch: the (nv, R, B) Yd tensor (~260 MB/substep at
# B=4096, R=152) never touches HBM, where the two-kernel path wrote it
# once and read it once per substep.
# --------------------------------------------------------------------------


def _solve_rows_kernel(d6_ref, u6_ref, b1_ref, b2_ref, ls_ref, ld_adr_ref,
                       maskd_ref, ld_ref, dinv_ref, qs_ref, qvel_ref,
                       kcoef_ref, bcoef_ref, posr_ref, rreg_ref, act_ref,
                       mu_ref, f0_ref, v0_ref,
                       f_out, v_out, qfrc_out, dqacc_out, yd_ref,
                       *, up, down, nbody, nv, kl, kc, iterations,
                       noslip_iterations, power_iters):
    dtype = d6_ref.dtype
    b1 = b1_ref[...]
    b2 = b2_ref[...]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (nbody, 1, 1), 0)
    ohd = ((b2[None] == iota_b).astype(dtype)
           - (b1[None] == iota_b).astype(dtype))            # (nbody, R, L)
    maskd = maskd_ref[...].astype(dtype)                    # (nbody, nv)
    mdiff = jax.lax.dot_general(
        maskd, ohd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)   # (nv, R, L)
    d6 = d6_ref[...]                                        # (nv, 6, L)
    u6 = u6_ref[...]                                        # (R, 6, L)
    dots = None
    for c in range(6):
        d6c = jax.lax.slice_in_dim(d6, c, c + 1, axis=1)    # (nv, 1, L)
        u6c = jnp.reshape(
            jax.lax.slice_in_dim(u6, c, c + 1, axis=1),
            (1, u6.shape[0], u6.shape[2]))                  # (1, R, L)
        term = d6c * u6c
        dots = term if dots is None else dots + term
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
    lim = ((iota_v == ld_adr_ref[...][None]).astype(dtype)
           * ls_ref[...][None])
    x = dots * mdiff + lim                                  # J^T (nv, R, L)
    velj = jnp.sum(x * qvel_ref[...][:, None, :], axis=0)
    aj = jnp.sum(x * qs_ref[...][:, None, :], axis=0)
    bvec = (-bcoef_ref[...] * velj - kcoef_ref[...] * posr_ref[...] - aj)
    yd_ref[...] = x
    ld = ld_ref[...]                                        # (nM, L)
    for i, e, j in up:
        yd_ref[j] = yd_ref[j] - ld[e][None, :] * yd_ref[i]
    dinv = dinv_ref[...]                                    # (nv, L)
    yd_ref[...] = yd_ref[...] * jnp.sqrt(dinv)[:, None, :]

    f, ystar, v = _apgd_math(yd_ref[...], bvec, rreg_ref[...],
                             act_ref[...], mu_ref[...], f0_ref[...],
                             v0_ref[...], kl=kl, kc=kc,
                             iterations=iterations,
                             noslip_iterations=noslip_iterations,
                             power_iters=power_iters)
    f_out[...] = f
    v_out[...] = v
    # qfrc_constraint = L^T D^{1/2} ystar (mul_lt reads the ORIGINAL
    # vector, so `base` stays a value); dqacc = L^{-1} D^{-1/2} ystar
    # (sequential root-first; the ref carries the updated values)
    base = ystar / jnp.sqrt(jnp.maximum(dinv, 1e-30))       # (nv, L)
    qfrc_out[...] = base
    for i, e, j in up:
        qfrc_out[j] = qfrc_out[j] + ld[e] * base[i]
    dqacc_out[...] = ystar * jnp.sqrt(dinv)
    for i, e, j in down:
        dqacc_out[i] = dqacc_out[i] - ld[e] * dqacc_out[j]


def solve_rows(tree, d6, u6, b1, b2, lim_sign, lim_dadr, maskd,
               ld, dinv, qacc_smooth, qvel, kcoef, bcoef, posr,
               rreg, active, mu, f0, v0=None, *, kl: int, kc: int,
               iterations: int, noslip_iterations: int = 0,
               power_iters: int = 4, interpret: bool | None = None):
    """One-call dual solve: (f (R, B), v (R, B), qfrc (nv, B),
    dqacc (nv, B)) with qacc = qacc_smooth + dqacc.

    Same row form as upsolve_build_yd + apgd_iterate chained, plus the
    two output tree sweeps (tree_ldl.mul_lt / solve_down) done in-kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nv = d6.shape[0]
    R, _, B = u6.shape
    if v0 is None:
        v0 = active
    if interpret:
        from flybody_tpu.ops import tree_ldl as TL
        jt = build_jt_reference(d6, u6, b1, b2, lim_sign, lim_dadr,
                                jnp.asarray(maskd, d6.dtype))
        yd, bvec = upsolve_yd_reference(tree, jt, ld, dinv, qacc_smooth,
                                        qvel, kcoef, bcoef, posr)
        f, ystar, v = _apgd_math(yd, bvec, rreg, active, mu, f0, v0,
                                 kl=kl, kc=kc, iterations=iterations,
                                 noslip_iterations=noslip_iterations,
                                 power_iters=power_iters)
        sqrt_d = 1.0 / jnp.sqrt(jnp.maximum(dinv, 1e-30))
        qfrc = TL.mul_lt(tree, ld, ystar * sqrt_d)
        dqacc = TL.solve_down(tree, ld, ystar * jnp.sqrt(dinv))
        return f, v, qfrc, dqacc

    nbody = maskd.shape[0]
    nM = ld.shape[0]
    Bp = max(_round_up(B, LANE), LANE)
    if Bp != B:
        padb = lambda x: jnp.pad(
            x, ((0, 0),) * (x.ndim - 1) + ((0, Bp - B),))
        d6, u6, ld, dinv, qacc_smooth, qvel = map(
            padb, (d6, u6, ld, dinv, qacc_smooth, qvel))
        b1, b2, lim_sign, kcoef, bcoef, posr, f0, v0 = map(
            padb, (b1, b2, lim_sign, kcoef, bcoef, posr, f0, v0))
        mu = padb(mu)
        lim_dadr = jnp.pad(lim_dadr, ((0, 0), (0, Bp - B)),
                           constant_values=-1)
        rreg = jnp.pad(rreg, ((0, 0), (0, Bp - B)), constant_values=1.0)
        active = padb(active)
    maskd_a = jnp.asarray(maskd, d6.dtype)

    kernel = functools.partial(
        _solve_rows_kernel, up=_flat_up(tree), down=_flat_down(tree),
        nbody=nbody, nv=nv, kl=kl, kc=kc, iterations=iterations,
        noslip_iterations=noslip_iterations, power_iters=power_iters)
    vec = lambda: pl.BlockSpec((nv, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    rvec = lambda: pl.BlockSpec((R, LANE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    f, v, qfrc, dqacc = pl.pallas_call(
        kernel,
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nv, 6, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),            # d6
            pl.BlockSpec((R, 6, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),            # u6
            rvec(), rvec(), rvec(), rvec(),                   # b1 b2 ls ladr
            pl.BlockSpec((nbody, nv), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # maskd
            pl.BlockSpec((nM, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # ld
            vec(), vec(), vec(),                              # dinv qs qvel
            rvec(), rvec(), rvec(),                           # k b posr
            rvec(), rvec(),                                   # rreg act
            pl.BlockSpec((max(kc, 1), LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # mu
            rvec(), rvec(),                                   # f0 v0
        ],
        out_specs=(
            rvec(),
            rvec(),
            pl.BlockSpec((nv, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, Bp), d6.dtype),
            jax.ShapeDtypeStruct((R, Bp), d6.dtype),
            jax.ShapeDtypeStruct((nv, Bp), d6.dtype),
            jax.ShapeDtypeStruct((nv, Bp), d6.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((nv, R, LANE), d6.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d6, u6, b1, b2, lim_sign, lim_dadr, maskd_a, ld, dinv,
      qacc_smooth, qvel, kcoef, bcoef, posr, rreg, active,
      jnp.broadcast_to(mu, (max(kc, 1), Bp)), f0, v0)
    return f[:, :B], v[:, :B], qfrc[:, :B], dqacc[:, :B]
