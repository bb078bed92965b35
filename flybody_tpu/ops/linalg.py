"""Batched dense linear algebra as pure-jnp blocked kernels.

XLA's TPU cholesky/triangular_solve custom-calls process vmapped batches
poorly (measured ~20 ms per call at B=1024 for n=105 — they dominate the
physics step). These blocked implementations keep everything in ordinary
XLA ops: diagonal-block factorization is a short scan of rank-1 updates,
panel solves are short substitution scans, and the trailing update is one
batched GEMM per panel that lands on the MXU. ~10-40x faster for the
(B, ~100, ~100) shapes the engine uses.

All functions take (..., n, n) / (..., n) arrays with any leading batch
dims and are differentiable (built from standard primitives).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unblocked_cholesky(A):
    """Cholesky of (..., r, r) via r-step outer-product scan (r small)."""
    r = A.shape[-1]
    L = jnp.zeros_like(A)

    def body(carry, j):
        S, L = carry
        d = jnp.sqrt(jnp.maximum(S[..., j, j], 1e-30))
        col = S[..., :, j] / d[..., None]
        # zero entries above the diagonal
        mask = (jnp.arange(r) >= j).astype(A.dtype)
        col = col * mask
        L = L.at[..., :, j].set(col)
        S = S - col[..., :, None] * col[..., None, :]
        return (S, L), None

    (A, L), _ = jax.lax.scan(body, (A, L), jnp.arange(r))
    return L


def _solve_tri_small(L, B, lower=True):
    """Solve L X = B for (..., r, r) triangular L, (..., r, m) B, via
    r-step substitution."""
    r = L.shape[-1]
    X = jnp.zeros_like(B)
    idx = jnp.arange(r) if lower else jnp.arange(r)[::-1]

    def body(X, j):
        # x_j = (b_j - L[j, :] @ X) / L[j, j]
        lj = L[..., j, :]                        # (..., r)
        acc = jnp.einsum("...k,...km->...m", lj, X)
        xj = (B[..., j, :] - acc) / L[..., j, j][..., None]
        X = X.at[..., j, :].set(xj)
        return X, None

    X, _ = jax.lax.scan(body, X, idx)
    return X


@functools.partial(jax.jit, static_argnames=("block",))
def cholesky(A: jnp.ndarray, block: int = 32) -> jnp.ndarray:
    """Lower Cholesky factor of SPD (..., n, n), blocked right-looking."""
    n = A.shape[-1]
    if n <= block:
        return _unblocked_cholesky(A)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        # pad with identity to keep SPD
        eye = jnp.zeros(A.shape[:-2] + (pad, pad), A.dtype) \
            + jnp.eye(pad, dtype=A.dtype)
        top = jnp.concatenate(
            [A, jnp.zeros(A.shape[:-2] + (n, pad), A.dtype)], axis=-1)
        bot = jnp.concatenate(
            [jnp.zeros(A.shape[:-2] + (pad, n), A.dtype), eye], axis=-1)
        A = jnp.concatenate([top, bot], axis=-2)
    N = nb * block
    L = jnp.zeros_like(A)
    S = A
    for k in range(nb):
        a, b = k * block, (k + 1) * block
        Lkk = _unblocked_cholesky(S[..., a:b, a:b])
        L = L.at[..., a:b, a:b].set(Lkk)
        if b < N:
            # panel: solve Lkk X^T = S[b:, a:b]^T  =>  X = S[b:, a:b] Lkk^-T
            panel = _solve_tri_small(
                Lkk, jnp.swapaxes(S[..., b:, a:b], -1, -2))
            P = jnp.swapaxes(panel, -1, -2)      # (..., N-b, block)
            L = L.at[..., b:, a:b].set(P)
            # trailing update (MXU GEMM)
            S = S.at[..., b:, b:].add(
                -jnp.einsum("...ik,...jk->...ij", P, P))
    return L[..., :n, :n] if pad else L


@functools.partial(jax.jit, static_argnames=("block",))
def solve_lower(L: jnp.ndarray, b: jnp.ndarray,
                block: int = 32) -> jnp.ndarray:
    """Solve L x = b with lower-triangular L; b is (..., n) or (..., n, m)."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    n = L.shape[-1]
    nb = -(-n // block)
    x = jnp.zeros_like(b)
    for k in range(nb):
        a, e = k * block, min((k + 1) * block, n)
        rhs = b[..., a:e, :] - jnp.einsum(
            "...ij,...jm->...im", L[..., a:e, :a], x[..., :a, :]) \
            if a else b[..., a:e, :]
        blk = _solve_tri_small(L[..., a:e, a:e], rhs)
        x = x.at[..., a:e, :].set(blk)
    return x[..., 0] if vec else x


@functools.partial(jax.jit, static_argnames=("block",))
def solve_upper_t(L: jnp.ndarray, b: jnp.ndarray,
                  block: int = 32) -> jnp.ndarray:
    """Solve L^T x = b with lower-triangular L (back substitution)."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    n = L.shape[-1]
    nb = -(-n // block)
    x = jnp.zeros_like(b)
    for k in reversed(range(nb)):
        a, e = k * block, min((k + 1) * block, n)
        rhs = b[..., a:e, :] - jnp.einsum(
            "...ji,...jm->...im", L[..., e:, a:e], x[..., e:, :]) \
            if e < n else b[..., a:e, :]
        # solve Lkk^T xk = rhs: reverse-order substitution on Lkk^T
        Lkk_t = jnp.swapaxes(L[..., a:e, a:e], -1, -2)
        blk = _solve_tri_upper_small(Lkk_t, rhs)
        x = x.at[..., a:e, :].set(blk)
    return x[..., 0] if vec else x


def _solve_tri_upper_small(U, B):
    """Solve U X = B for small upper-triangular U via back substitution."""
    r = U.shape[-1]
    X = jnp.zeros_like(B)

    def body(X, j):
        uj = U[..., j, :]
        acc = jnp.einsum("...k,...km->...m", uj, X)
        xj = (B[..., j, :] - acc) / U[..., j, j][..., None]
        X = X.at[..., j, :].set(xj)
        return X, None

    X, _ = jax.lax.scan(body, X, jnp.arange(r)[::-1])
    return X


def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given lower Cholesky factor L of A."""
    return solve_upper_t(L, solve_lower(L, b))
