"""Sparse kinematic-tree LDL^T factorization, batched over trailing envs.

The joint-space inertia matrix M of a kinematic tree is sparse: M[i, j] is
nonzero only when dof j is an ancestor of dof i (or i == j). For the fly
(nv=105) that is 586 nonzeros vs 5565 dense — and the elimination requires
~4.4k multiply-adds vs 386k for a dense Cholesky. The reference delegates
this to MuJoCo's mj_factorM/mj_solveM (C, per-env); here the factorization
is re-expressed as a *level-parallel* schedule over the tree:

* dofs are grouped by subtree height; all dofs in a level eliminate
  simultaneously (their subtrees are disjoint or sequenced by the level
  order), turning the factorization into ~tree-depth rounds of fixed
  gathers / scatter-adds over a compressed (nM, B) value array;
* every instruction is elementwise over the trailing batch dim B, so at
  B = thousands each scalar operation of the classical algorithm becomes a
  full-width VPU op with zero padding waste (TPU lanes = env batch).

Convention: M = L^T D L with L unit-lower ("row i holds entries at its
ancestor columns j"), MuJoCo's qLD convention. Solves:
    M^{-1} b = L^{-1} D^{-1} L^{-T} b.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=False)
class TreeMeta:
    # eq=False: identity hash/eq so TreeMeta can ride in Model's static
    # pytree aux data (models are built once per process).
    """Static sparse layout + elimination schedule for one tree."""

    nv: int
    nM: int
    # entry e -> (row dof i, col dof j<=i); CSR-ish grouped by i
    entry_i: np.ndarray        # (nM,)
    entry_j: np.ndarray        # (nM,)
    diag_entry: np.ndarray     # (nv,) entry index of (i, i)
    # factor schedule: per level, static index arrays
    levels: tuple              # tuple of dicts (see build_tree_meta)
    # solve schedules
    solve_up: tuple            # leaves->root levels: (i_arr, e_arr, j_arr)
    solve_down: tuple          # root->leaves levels: same triplets
    anc_lists: tuple           # per dof: ancestor dofs (incl self), root last


def build_tree_meta(dof_parentid: np.ndarray) -> TreeMeta:
    dp = np.asarray(dof_parentid)
    nv = len(dp)

    anc = []  # ancestors excluding self, nearest first
    for i in range(nv):
        lst = []
        j = dp[i]
        while j >= 0:
            lst.append(int(j))
            j = dp[j]
        anc.append(lst)

    # entry table: for each i, columns j in ancestors+self, ascending j
    entry_i, entry_j = [], []
    eidx = {}
    for i in range(nv):
        cols = sorted(anc[i]) + [i]
        for j in cols:
            eidx[(i, j)] = len(entry_i)
            entry_i.append(i)
            entry_j.append(j)
    nM = len(entry_i)
    diag_entry = np.array([eidx[(i, i)] for i in range(nv)], dtype=np.int32)

    # subtree height per dof: 0 for dofs with no dof-children
    children = [[] for _ in range(nv)]
    for i in range(nv):
        if dp[i] >= 0:
            children[dp[i]].append(i)
    height = np.zeros(nv, dtype=np.int32)
    for i in range(nv - 1, -1, -1):  # children have larger indices
        for c in children[i]:
            height[i] = max(height[i], height[c] + 1)

    # factor schedule
    levels = []
    for h in range(int(height.max()) + 1 if nv else 0):
        dofs = np.nonzero(height == h)[0]
        if len(dofs) == 0:
            continue
        diag_e = diag_entry[dofs]
        # off-diagonal row entries (i, j) j != i for i in dofs
        row_e, row_of = [], []
        for k, i in enumerate(dofs):
            for j in sorted(anc[i]):
                row_e.append(eidx[(i, j)])
                row_of.append(k)
        # Schur updates: for i, for each ancestor pair (a, b) with b <= a:
        #   M[a, b] -= (M[i, a] / D[i]) * M[i, b]
        # upd_a_pos indexes into this level's Li row array (already divided
        # by D[i]); upd_b indexes raw row entries.
        row_pos = {int(e): k for k, e in enumerate(row_e)}
        upd_t, upd_a_pos, upd_b = [], [], []
        for i in dofs:
            cols = sorted(anc[i])
            for x, a_ in enumerate(cols):
                for b_ in cols[: x + 1]:
                    upd_t.append(eidx[(a_, b_)] if a_ >= b_ else
                                 eidx[(b_, a_)])
                    upd_a_pos.append(row_pos[eidx[(i, a_)]])
                    upd_b.append(eidx[(i, b_)])
        levels.append(dict(
            dofs=np.asarray(dofs, np.int32),
            diag_e=np.asarray(diag_e, np.int32),
            row_e=np.asarray(row_e, np.int32),
            row_of=np.asarray(row_of, np.int32),
            upd_t=np.asarray(upd_t, np.int32),
            upd_a_pos=np.asarray(upd_a_pos, np.int32),
            upd_b=np.asarray(upd_b, np.int32),
        ))

    # solve schedules: triplets (i, e, j) = x[j] -= L[e] * x[i] (up) or
    # x[i] -= L[e] * x[j] (down), grouped by the *processed* dof's level
    up_levels, down_levels = [], []
    for h in range(int(height.max()) + 1 if nv else 0):
        dofs = np.nonzero(height == h)[0]
        if len(dofs) == 0:
            continue
        ii, ee, jj = [], [], []
        for i in dofs:
            for j in anc[i]:
                ii.append(i); ee.append(eidx[(i, j)]); jj.append(j)
        up_levels.append((np.asarray(ii, np.int32), np.asarray(ee, np.int32),
                          np.asarray(jj, np.int32)))
    # down: process dofs by depth (root first)
    depth = np.zeros(nv, dtype=np.int32)
    for i in range(nv):
        depth[i] = 0 if dp[i] < 0 else depth[dp[i]] + 1
    for dlev in range(int(depth.max()) + 1 if nv else 0):
        dofs = np.nonzero(depth == dlev)[0]
        if len(dofs) == 0:
            continue
        ii, ee, jj = [], [], []
        for i in dofs:
            for j in anc[i]:
                ii.append(i); ee.append(eidx[(i, j)]); jj.append(j)
        if ii:
            down_levels.append((np.asarray(ii, np.int32),
                                np.asarray(ee, np.int32),
                                np.asarray(jj, np.int32)))

    return TreeMeta(
        nv=nv, nM=nM,
        entry_i=np.asarray(entry_i, np.int32),
        entry_j=np.asarray(entry_j, np.int32),
        diag_entry=diag_entry, levels=tuple(levels),
        solve_up=tuple(up_levels), solve_down=tuple(down_levels),
        anc_lists=tuple(tuple(a) for a in anc),
    )


def dense_to_sparse(meta: TreeMeta, M: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv, B) dense (lower entries used) -> (nM, B) compressed."""
    return M[meta.entry_i, meta.entry_j]


def sparse_to_dense(meta: TreeMeta, Ms: jnp.ndarray) -> jnp.ndarray:
    """(nM, B) -> symmetric dense (nv, nv, B)."""
    B = Ms.shape[-1]
    out = jnp.zeros((meta.nv, meta.nv, B), Ms.dtype)
    out = out.at[meta.entry_i, meta.entry_j].set(Ms)
    out = out.at[meta.entry_j, meta.entry_i].set(Ms)
    return out


def factor(meta: TreeMeta, Ms: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LDL^T factorization of compressed M (nM, ...B).

    Returns (LD, Dinv): LD (nM, ...B) holds L off-diagonals at off-diagonal
    entries and D at diagonal entries; Dinv (nv, ...B) = 1 / D.
    """
    buf = Ms
    for lev in meta.levels:
        Di = buf[lev["diag_e"]]                    # (nlev, ...B)
        if len(lev["row_e"]):
            rows = buf[lev["row_e"]]               # (nrows, ...B)
            Li = rows / Di[lev["row_of"]]
            # Schur updates into ancestor entries (duplicates accumulate)
            if len(lev["upd_t"]):
                upd = -Li[lev["upd_a_pos"]] * buf[lev["upd_b"]]
                buf = buf.at[lev["upd_t"]].add(upd)
            buf = buf.at[lev["row_e"]].set(Li)
    Dinv = 1.0 / buf[meta.diag_entry]
    return buf, Dinv


def solve(meta: TreeMeta, LD: jnp.ndarray, Dinv: jnp.ndarray,
          b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b. b: (nv, ...B) or (nv, R, ...B) (extra dims between)."""
    x = b
    extra = x.ndim - LD[meta.diag_entry].ndim
    ld = LD.reshape(LD.shape[:1] + (1,) * extra + LD.shape[1:]) if extra \
        else LD

    # x <- L^{-T} x : push descendant values into ancestors (leaves first)
    for ii, ee, jj in meta.solve_up:
        x = x.at[jj].add(-ld[ee] * x[ii])
    # x <- D^{-1} x
    dinv = Dinv.reshape(Dinv.shape[:1] + (1,) * extra + Dinv.shape[1:]) \
        if extra else Dinv
    x = x * dinv
    # x <- L^{-1} x : subtract ancestor values (root first)
    for ii, ee, jj in meta.solve_down:
        x = x.at[ii].add(-ld[ee] * x[jj])
    return x


def solve_down(meta: TreeMeta, LD: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """x <- L^{-1} x (root-first sweep only). x (nv, ...B)."""
    extra = x.ndim - LD.ndim
    ld = LD.reshape(LD.shape[:1] + (1,) * extra + LD.shape[1:]) if extra \
        else LD
    for ii, ee, jj in meta.solve_down:
        x = x.at[ii].add(-ld[ee] * x[jj])
    return x


def mul_lt(meta: TreeMeta, LD: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """L^T @ x with unit-diagonal L from the factor. x (nv, ...B).

    (L^T x)[j] = x[j] + sum over off-diag entries (i, e, j) of L[e] x[i]."""
    extra = x.ndim - LD.ndim
    ld = LD.reshape(LD.shape[:1] + (1,) * extra + LD.shape[1:]) if extra \
        else LD
    out = x
    for ii, ee, jj in meta.solve_up:
        out = out.at[jj].add(ld[ee] * x[ii])
    return out


def matmul(meta: TreeMeta, Ms: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """M @ v with compressed symmetric M. v: (nv, ...B) -> (nv, ...B)."""
    extra = v.ndim - (Ms.ndim - 1) - 1
    ms = Ms.reshape(Ms.shape[:1] + (1,) * extra + Ms.shape[1:]) if extra \
        else Ms
    prod = ms * v[meta.entry_j]
    out = jnp.zeros_like(v).at[meta.entry_i].add(prod)
    off = meta.entry_i != meta.entry_j
    oi = meta.entry_i[off]
    oj = meta.entry_j[off]
    out = out.at[oj].add(ms[off] * v[oi])
    return out
