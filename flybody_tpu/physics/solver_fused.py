"""Fused flat-row dual contact solver (production path).

Same soft-constraint dual QP as physics/solver.py — identical optimality
conditions to MuJoCo's Newton solver — re-architected for TPU speed of
light:

1. SOLVER-ACTIVE ROW SELECTION. The contact set selected by collision()
   is conservative (it also feeds adhesion, touch sensors, and contact
   observables). The solver re-selects a tighter active set: top
   ``fused_sel[0]`` limit rows by margin-adjusted limit distance, all
   condim-1 rows, and the top ``fused_sel[1]`` friction cones across ALL
   cone groups by effective penetration. Row counts are the solver's
   whole cost model (VPU flops scale with R = nonneg + 3 cones), and the
   measured simultaneous-penetration counts of the fly are far below the
   conservative per-group budgets.

2. FLAT TRANSPOSED JACOBIAN Jt (nv, R, B) built directly for the
   selected rows from the 6D row form J[r, v] = mdiff[r, v] *
   (frame_r . base_v + (p_r x frame_r) . ang_v) — the per-group
   (K, dim, nv, B) Jacobians of the reference path are never
   materialized.

3. The ENTIRE dual solve is ONE Pallas kernel
   (ops/solver_kernels.solve_rows): J build from the compact row form,
   the triangular up-solve Yd = D^{-1/2} L^{-T} Jt, the APGD loop
   (+ noslip pass), and the two output tree sweeps
   (qfrc_constraint = L^T D^{1/2} ystar, dqacc = L^{-1} D^{-1/2} ystar)
   all run with Yd resident in VMEM scratch. The dual matrix
   A = J M^-1 J^T = Yd^T Yd is never formed, and the (nv, R, B) Yd
   tensor (~260 MB/substep at B=4096) never touches HBM — the earlier
   two-kernel path wrote and re-read it once per substep.

4. Within a col_refresh window (fresh=False) the solver's row selection
   persists (Data.sol_lim_sel / sol_cone_sel) and APGD warm-starts from
   the raw previous-substep forces (Data.sol_f): no per-substep top_k,
   no warm-start sel-matching einsums, 2 power iterations instead of 3.

Reference semantics: MuJoCo soft-constraint model (same as solver.py /
solver_dense.py; reference model at vnl_ray fruitfly.xml defaults).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.ops import solver_kernels as SK
from flybody_tpu.physics.types import Data, Model


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_layout(m: Model, meta) -> dict:
    """Static row layout of the fused solver for this model.

    Returns dict with: n_lim (selected limit rows), c1 (row index ranges
    of condim-1 contact rows in the Contact arrays), cone (row ranges of
    cone contacts), s_cone (total cone candidates), k_cone (selected),
    kl (nonneg segment incl. padding), kc, R.
    """
    sel = m.fused_sel if m.fused_sel is not None else (24, 24)
    n_lim = min(int(sel[0]), len(meta.limit_ids))
    c1_ranges, cone_ranges = [], []
    off = 0
    for cd, K in meta.groups:
        if cd == 1:
            c1_ranges.append((off, off + K))
        else:
            cone_ranges.append((off, off + K))
        off += K
    k1 = sum(b - a for a, b in c1_ranges)
    s_cone = sum(b - a for a, b in cone_ranges)
    k_cone = min(int(sel[1]), s_cone)
    kl = _round_up(n_lim + k1, 8)
    kc = _round_up(k_cone, 8) if k_cone else 0
    return dict(n_lim=n_lim, c1=tuple(c1_ranges), cone=tuple(cone_ranges),
                k1=k1, s_cone=s_cone, k_cone=k_cone, kl=kl, kc=kc,
                R=kl + 3 * kc)


def _dof_basis(m: Model, d: Data):
    """D6 (nv, 6, B): [base (3), ang (3)] with base = lin - ang x comroot,
    so that J[r, v] = u6_r . D6_v on the dof-support mask."""
    root_of_dof = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    comroot = d.subtree_com[root_of_dof]
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]
    base = lin - bq.cross(ang, comroot)
    return jnp.concatenate([base, ang], axis=-2)       # (nv, 6, B)


def _mdiff(m: Model, b1, b2, dtype):
    """(nv, K, B) dof-support difference masks via one-hot MXU
    contraction. b1/b2 (K, B) int32."""
    maskd = jnp.asarray(np.asarray(m.body_dof_mask), dtype)   # (nbody, nv)
    iota = jnp.arange(m.nbody, dtype=jnp.int32)[None, :, None]
    ohd = ((b2[:, None, :] == iota).astype(dtype)
           - (b1[:, None, :] == iota).astype(dtype))          # (K, nbody, B)
    return jnp.einsum("kbB,bv->vkB", ohd, maskd)


def solve_fused(m: Model, d: Data, iterations: int | None = None,
                _stage: str = "full", fresh: bool = True) -> Data:
    """Drop-in replacement for constraint.solve (contact_solver='fused').

    ``_stage`` is a profiling knob (tools/profile_fused.py): "assembly"
    stops after row assembly, "yd" after the upsolve kernel, "apgd"
    after the iteration kernel; "full" (default) is production.

    ``fresh`` (static) is False on selection-persistent update substeps
    (Model.col_refresh block schedule, envs/core.py): the contact lane
    set is unchanged since the previous substep, so the solver's own
    row selection persists too — limit/cone top_k is skipped (stored
    indices Data.sol_lim_sel / sol_cone_sel are reused; rankings lag by
    at most col_refresh-1 substeps, the same persistence assumption as
    the lane set itself, while row ACTIVITY is still evaluated at the
    current state), APGD warm-starts from the raw previous forces
    Data.sol_f (row order is unchanged — no sel-matching einsums), and
    the warm Lipschitz power iteration drops to 2 iterations."""
    from flybody_tpu.physics import constraint as C

    meta = C.efc_meta(m)
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    nv = m.nv
    lay = fused_layout(m, meta)
    n_lim, k1, k_cone = lay["n_lim"], lay["k1"], lay["k_cone"]
    kl, kc, R = lay["kl"], lay["kc"], lay["R"]

    if R == 0:
        return d.replace(qacc=d.qacc_smooth,
                         qfrc_constraint=jnp.zeros_like(d.qvel))

    niter = iterations if iterations is not None else min(
        m.opt.solver_iterations, 20)

    con = d.contact
    D6 = _dof_basis(m, d)

    # compact per-row form consumed by the fused build+upsolve kernel:
    # J[r, v] = u6_r . D6_v on the (b1, b2) dof-support difference, plus
    # the limit rows' sign * e_dadr direct form. jt itself is never
    # materialized (ops/solver_kernels.upsolve_build_yd).
    u6_rows, b1_rows, b2_rows, ls_rows, la_rows = [], [], [], [], []
    k_rows, b_rows, pos_rows, r_rows, act_rows = [], [], [], [], []

    def _zero_rows(n):
        u6_rows.append(jnp.zeros((n, 6, B), dtype))
        b1_rows.append(jnp.zeros((n, B), jnp.int32))
        b2_rows.append(jnp.zeros((n, B), jnp.int32))
        ls_rows.append(jnp.zeros((n, B), dtype))
        la_rows.append(jnp.full((n, B), -1, jnp.int32))

    # ---- limit rows (top-n_lim by margin-adjusted distance) ----------
    lim = C._limit_rows(m, d, meta)
    oh_lim = None
    idx_lim = None
    if n_lim:
        nl = lim.sign.shape[0]
        if n_lim < nl:
            if fresh or d.sol_lim_sel.shape[0] != n_lim:
                _, top = jax.lax.top_k(-lim.pos.T, n_lim)  # (B, n_lim)
                idx = top.T
            else:
                idx = d.sol_lim_sel
        else:
            idx = jnp.broadcast_to(
                jnp.arange(nl, dtype=jnp.int32)[:, None], (nl, B))
        idx_lim = idx
        oh_lim = (idx[:, None, :] == jnp.arange(nl)[None, :, None]
                  ).astype(dtype)                          # (n_lim, nl, B)
        dadr = jnp.asarray(np.asarray(lim.dadr), jnp.int32)
        # single stacked payload: one pass over the one-hot instead of 8
        # (some columns are batch-broadcast (nl, 1) constants)
        pay_l = jnp.stack([
            jnp.broadcast_to(x, (nl, B)) for x in (
                lim.sign, dadr.astype(dtype)[:, None],
                lim.k, lim.b, lim.pos, lim.R, lim.active,
                d.warm_lim.astype(dtype))
        ], axis=1)                                         # (nl, 8, B)
        sel_l8 = jnp.einsum("klB,lcB->kcB", oh_lim, pay_l)
        sign_s = sel_l8[:, 0]
        dadr_s = jnp.round(sel_l8[:, 1]).astype(jnp.int32)  # (n_lim, B)
        u6_rows.append(jnp.zeros((n_lim, 6, B), dtype))
        b1_rows.append(jnp.zeros((n_lim, B), jnp.int32))
        b2_rows.append(jnp.zeros((n_lim, B), jnp.int32))
        ls_rows.append(sign_s)
        la_rows.append(dadr_s)
        k_rows.append(sel_l8[:, 2])
        b_rows.append(sel_l8[:, 3])
        pos_rows.append(sel_l8[:, 4])
        r_rows.append(sel_l8[:, 5])
        act_rows.append(sel_l8[:, 6])

    # ---- contact row ingredients -------------------------------------
    def con_slice(ranges, field):
        return jnp.concatenate([field[a:b] for a, b in ranges], axis=0) \
            if ranges else None

    def u6_of(frame_d, pos):
        """[frame row (3), p x frame row (3)] -> (..., 6, B)."""
        return jnp.concatenate([frame_d, bq.cross(pos, frame_d)], axis=-2)

    # condim-1 rows: all of them
    if k1:
        rng = lay["c1"]
        pos1 = con_slice(rng, con.pos)                     # (k1, 3, B)
        fr1 = con_slice(rng, con.frame)[:, 0]              # (k1, 3, B)
        b1_1 = con_slice(rng, con.b1)
        b2_1 = con_slice(rng, con.b2)
        u61 = u6_of(fr1, pos1)                             # (k1, 6, B)
        u6_rows.append(u61)
        b1_rows.append(b1_1)
        b2_rows.append(b2_1)
        ls_rows.append(jnp.zeros((k1, B), dtype))
        la_rows.append(jnp.full((k1, B), -1, jnp.int32))
        pos_c1 = con_slice(rng, con.dist) - con_slice(rng, con.margin)
        k_rows.append(con_slice(rng, con.k))
        b_rows.append(con_slice(rng, con.b))
        pos_rows.append(pos_c1)
        r_rows.append(con_slice(rng, con.R))
        act_rows.append((pos_c1 < 0.0).astype(dtype))
        sel_c1 = con_slice(rng, con.sel)

    # pad the nonneg segment to kl rows
    pad_nn = kl - n_lim - k1
    if pad_nn:
        _zero_rows(pad_nn)
        zz = jnp.zeros((pad_nn, B), dtype)
        for lst, v in ((k_rows, zz), (b_rows, zz), (pos_rows, zz),
                       (r_rows, jnp.ones((pad_nn, B), dtype)),
                       (act_rows, zz)):
            lst.append(v)

    # ---- cone selection (top-k_cone by effective penetration) --------
    mu_sel = jnp.zeros((max(kc, 1), B), dtype)
    sel_cone = None
    idx_cone = None
    if kc:
        rng = lay["cone"]
        s_cone = lay["s_cone"]
        eff = con_slice(rng, con.dist) - con_slice(rng, con.margin)
        if k_cone < s_cone:
            if fresh or d.sol_cone_sel.shape[0] != k_cone:
                _, top = jax.lax.top_k(-eff.T, k_cone)
                idx = top.T                                # (k_cone, B)
            else:
                idx = d.sol_cone_sel
            idx_cone = idx
            oh = (idx[:, None, :]
                  == jnp.arange(s_cone)[None, :, None]).astype(dtype)
            payload = jnp.concatenate([
                con_slice(rng, con.pos),                   # 0:3
                con_slice(rng, con.frame).reshape(s_cone, 9, B),  # 3:12
                con_slice(rng, con.k)[:, None],            # 12
                con_slice(rng, con.b)[:, None],            # 13
                con_slice(rng, con.R)[:, None],            # 14
                con_slice(rng, con.mu)[:, None],           # 15
                eff[:, None],                              # 16
                con_slice(rng, con.b1).astype(dtype)[:, None],   # 17
                con_slice(rng, con.b2).astype(dtype)[:, None],   # 18
                con_slice(rng, con.sel).astype(dtype)[:, None],  # 19
            ], axis=1)
            pay = jnp.einsum("ksB,scB->kcB", oh, payload)  # (k_cone, 20, B)
        else:
            pay = jnp.concatenate([
                con_slice(rng, con.pos),
                con_slice(rng, con.frame).reshape(s_cone, 9, B),
                con_slice(rng, con.k)[:, None],
                con_slice(rng, con.b)[:, None],
                con_slice(rng, con.R)[:, None],
                con_slice(rng, con.mu)[:, None],
                eff[:, None],
                con_slice(rng, con.b1).astype(dtype)[:, None],
                con_slice(rng, con.b2).astype(dtype)[:, None],
                con_slice(rng, con.sel).astype(dtype)[:, None],
            ], axis=1)
        if kc > k_cone:   # pad cones (inactive)
            pad = jnp.zeros((kc - k_cone, pay.shape[1], B), dtype)
            pay = jnp.concatenate([pay, pad.at[:, 16].set(1.0)
                                   .at[:, 19].set(-1.0)], axis=0)
        posc = pay[:, 0:3]
        frame = pay[:, 3:12].reshape(kc, 3, 3, B)
        k_c, b_c, r_c, mu_c = pay[:, 12], pay[:, 13], pay[:, 14], pay[:, 15]
        pos_cc = pay[:, 16]
        b1_c = jnp.round(pay[:, 17]).astype(jnp.int32)
        b2_c = jnp.round(pay[:, 18]).astype(jnp.int32)
        sel_cone = jnp.round(pay[:, 19]).astype(jnp.int32)
        act_c = (pos_cc < 0.0).astype(dtype)

        u6c = u6_of(frame, posc[:, None])                  # (kc, 3, 6, B)
        # segment-major cone rows: [normals | tangent1 | tangent2]
        for j in range(3):
            u6_rows.append(u6c[:, j])
            b1_rows.append(b1_c)
            b2_rows.append(b2_c)
            ls_rows.append(jnp.zeros((kc, B), dtype))
            la_rows.append(jnp.full((kc, B), -1, jnp.int32))

        zero = jnp.zeros_like(k_c)
        r_t = r_c / jnp.maximum(m.opt.impratio, 1e-12)
        k_rows += [k_c, zero, zero]
        b_rows += [b_c, b_c, b_c]
        pos_rows += [pos_cc, zero, zero]
        r_rows += [r_c, r_t, r_t]
        act_rows += [act_c, act_c, act_c]
        mu_sel = mu_c

    u6_all = jnp.concatenate(u6_rows, axis=0)              # (R, 6, B)
    b1_all = jnp.concatenate(b1_rows, axis=0)
    b2_all = jnp.concatenate(b2_rows, axis=0)
    ls_all = jnp.concatenate(ls_rows, axis=0)
    la_all = jnp.concatenate(la_rows, axis=0)
    kcoef = jnp.concatenate(k_rows, axis=0)
    bcoef = jnp.concatenate(b_rows, axis=0)
    posr = jnp.concatenate(pos_rows, axis=0)
    rreg = jnp.concatenate(r_rows, axis=0)
    active = jnp.concatenate(act_rows, axis=0)

    # ---- warm start ---------------------------------------------------
    k_warm = k1 + kc
    if not fresh and d.sol_f.shape[0] == R:
        # row order unchanged within the refresh window: the previous
        # substep's raw forces ARE this substep's warm start
        f0 = d.sol_f.astype(dtype)
    else:
        f0_parts = []
        if n_lim:
            f0_parts.append(sel_l8[:, 7])
        if k1:
            hit = (sel_c1[:, None, :] == d.warm_sel[None, :k_warm, :]
                   ).astype(dtype)
            f0_parts.append(jnp.einsum("kjB,jB->kB", hit,
                                       d.warm_f[:k_warm, 0].astype(dtype)))
        if pad_nn:
            f0_parts.append(jnp.zeros((pad_nn, B), dtype))
        if kc:
            hit = (sel_cone[:, None, :] == d.warm_sel[None, :k_warm, :]
                   ).astype(dtype)
            fprev = jnp.einsum("kjB,jdB->kdB", hit,
                               d.warm_f[:k_warm].astype(dtype))
            f0_parts += [fprev[:, 0], fprev[:, 1], fprev[:, 2]]
        f0 = jnp.concatenate(f0_parts, axis=0)

    # ---- kernels -------------------------------------------------------
    if _stage == "assembly":
        probe = (jnp.sum(u6_all, axis=(0, 1)) + jnp.sum(kcoef, axis=0)
                 + jnp.sum(f0, axis=0) + jnp.sum(active, axis=0))
        return d.replace(qacc=d.qacc_smooth + 0.0 * probe[None, :])
    maskd = np.asarray(m.body_dof_mask).astype(np.float32)
    # warm Lipschitz: previous substep's power vector (Data.apgd_v) lets
    # 2-3 warm power iterations replace 4 cold ones (~fewer VMEM passes
    # over Yd per substep)
    warm_v = d.apgd_v.astype(dtype) if d.apgd_v.shape[0] == R else None
    kw = dict(kl=kl, kc=kc, iterations=int(niter),
              noslip_iterations=int(m.opt.noslip_iterations),
              power_iters=(4 if warm_v is None else (3 if fresh else 2)))
    if _stage in ("yd", "apgd"):
        # two-kernel profiling path (tools/profile_fused.py stage split)
        use_ref = jax.default_backend() != "tpu"
        yd, bvec = SK.upsolve_build_yd(
            m.tree, D6, u6_all, b1_all, b2_all, ls_all, la_all, maskd,
            d.qLD, d.qLDiagInv, d.qacc_smooth, d.qvel, kcoef, bcoef, posr)
        if _stage == "yd":
            probe = jnp.sum(yd, axis=(0, 1)) + jnp.sum(bvec, axis=0)
            return d.replace(qacc=d.qacc_smooth + 0.0 * probe[None, :])
        apgd = (SK.apgd_iterate_reference if use_ref else SK.apgd_iterate)
        f, ystar, v_new = apgd(yd, bvec, rreg, active, mu_sel, f0,
                               warm_v, **kw)
        probe = jnp.sum(f, axis=0) + jnp.sum(ystar, axis=0)
        return d.replace(qacc=d.qacc_smooth + 0.0 * probe[None, :])

    # ---- production: ONE kernel (build + up-solve + APGD + output
    # sweeps, Yd never leaves VMEM) --------------------------------------
    f, v_new, qfrc, dqacc = SK.solve_rows(
        m.tree, D6, u6_all, b1_all, b2_all, ls_all, la_all, maskd,
        d.qLD, d.qLDiagInv, d.qacc_smooth, d.qvel, kcoef, bcoef, posr,
        rreg, active, mu_sel, f0, warm_v, **kw)
    qacc = d.qacc_smooth + dqacc

    ok = jnp.all(jnp.isfinite(qacc), axis=0)
    qacc = jnp.where(ok, qacc, d.qacc_smooth)
    qfrc = jnp.where(ok, qfrc, 0.0)

    # ---- warm bookkeeping (compact selected forces) --------------------
    ksum = d.warm_sel.shape[0]
    sel_parts, f3_parts = [], []
    if k1:
        sel_parts.append(sel_c1)
        f1 = f[n_lim:n_lim + k1]
        f3_parts.append(jnp.stack(
            [f1, jnp.zeros_like(f1), jnp.zeros_like(f1)], axis=1))
    if kc:
        sel_parts.append(sel_cone)
        f3_parts.append(jnp.stack(
            [f[kl:kl + kc], f[kl + kc:kl + 2 * kc], f[kl + 2 * kc:]],
            axis=1))
    if sel_parts:
        warm_sel = jnp.concatenate(sel_parts, axis=0)
        warm_f = jnp.concatenate(f3_parts, axis=0) * ok
        npad = ksum - warm_sel.shape[0]
        if npad > 0:
            warm_sel = jnp.concatenate(
                [warm_sel, jnp.full((npad, B), -1, jnp.int32)], axis=0)
            warm_f = jnp.concatenate(
                [warm_f, jnp.zeros((npad, 3, B), dtype)], axis=0)
    else:
        warm_sel, warm_f = d.warm_sel, d.warm_f
    if n_lim:
        warm_lim = jnp.einsum("klB,kB->lB", oh_lim, f[:n_lim] * ok)
    else:
        warm_lim = d.warm_lim
    apgd_v = (v_new.astype(d.apgd_v.dtype)
              if d.apgd_v.shape[0] == R else d.apgd_v)
    # persist the row selection + raw forces for the window's update
    # substeps (consumed when fresh=False)
    if (idx_lim is None
            or idx_lim.shape[0] != d.sol_lim_sel.shape[0]):
        idx_lim = d.sol_lim_sel
    if idx_cone is None or idx_cone.shape[0] != d.sol_cone_sel.shape[0]:
        idx_cone = (jnp.broadcast_to(
            jnp.arange(k_cone, dtype=jnp.int32)[:, None], (k_cone, B))
            if kc and d.sol_cone_sel.shape[0] == k_cone
            else d.sol_cone_sel)
    sol_f = ((f * ok).astype(d.sol_f.dtype)
             if d.sol_f.shape[0] == R else d.sol_f)
    return d.replace(qacc=qacc, qfrc_constraint=qfrc,
                     warm_sel=warm_sel.astype(jnp.int32), warm_f=warm_f,
                     warm_lim=warm_lim, apgd_v=apgd_v,
                     sol_lim_sel=idx_lim.astype(jnp.int32),
                     sol_cone_sel=idx_cone.astype(jnp.int32), sol_f=sol_f)
