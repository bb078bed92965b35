"""Oracle tests for the sparse kinematic-tree LDL^T (ops/tree_ldl)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flybody_tpu.ops import tree_ldl as TL


def _random_tree_spd(rng, dof_parentid, B):
    """Random SPD matrices with the tree sparsity pattern, (nv, nv, B)."""
    nv = len(dof_parentid)
    meta = TL.build_tree_meta(np.asarray(dof_parentid))
    M = np.zeros((nv, nv, B))
    vals = rng.standard_normal((meta.nM, B))
    M[meta.entry_i, meta.entry_j] = vals
    M[meta.entry_j, meta.entry_i] = vals
    # make SPD while preserving pattern: diagonal dominance
    absum = np.abs(M).sum(axis=1)
    for i in range(nv):
        M[i, i] = absum[i] + 1.0
    return meta, M


@pytest.mark.parametrize("dp", [
    [-1, 0, 1, 2, 0, 4, -1, 6],                      # two small trees
    [-1, 0, 1, 2, 3, 4, 5, 5, 5, 2, 9, 10, 0, 12],   # chains + branching
])
def test_factor_solve_matches_numpy(dp):
    rng = np.random.default_rng(0)
    B = 7
    meta, M = _random_tree_spd(rng, dp, B)
    Ms = TL.dense_to_sparse(meta, jnp.asarray(M))
    LD, Dinv = TL.factor(meta, Ms)
    b = jnp.asarray(rng.standard_normal((meta.nv, B)))
    x = TL.solve(meta, LD, Dinv, b)
    for k in range(B):
        ref = np.linalg.solve(M[..., k], np.asarray(b)[..., k])
        np.testing.assert_allclose(np.asarray(x)[..., k], ref, rtol=1e-8,
                                   atol=1e-10)


def test_multi_rhs_and_matmul():
    rng = np.random.default_rng(1)
    dp = [-1, 0, 1, 2, 3, 4, 5, 5, 5, 2, 9, 10, 0, 12]
    B, R = 5, 4
    meta, M = _random_tree_spd(rng, dp, B)
    Ms = TL.dense_to_sparse(meta, jnp.asarray(M))
    LD, Dinv = TL.factor(meta, Ms)
    b = jnp.asarray(rng.standard_normal((meta.nv, R, B)))
    x = TL.solve(meta, LD, Dinv, b)
    for k in range(B):
        for r in range(R):
            ref = np.linalg.solve(M[..., k], np.asarray(b)[:, r, k])
            np.testing.assert_allclose(np.asarray(x)[:, r, k], ref,
                                       rtol=1e-8, atol=1e-10)
    # matmul oracle
    v = jnp.asarray(rng.standard_normal((meta.nv, B)))
    mv = TL.matmul(meta, Ms, v)
    for k in range(B):
        np.testing.assert_allclose(np.asarray(mv)[..., k],
                                   M[..., k] @ np.asarray(v)[..., k],
                                   rtol=1e-9, atol=1e-10)


def test_fly_tree_shape():
    """Factor the actual fly tree pattern (cheap smoke, no mujoco)."""
    rng = np.random.default_rng(2)
    # synthetic 30-dof tree: 6-dof "free root" chain + 4 limbs of 6
    dp = [-1, 0, 1, 2, 3, 4]
    for limb in range(4):
        base = len(dp)
        dp.append(5)
        for k in range(5):
            dp.append(base + k)
    meta, M = _random_tree_spd(rng, np.asarray(dp), 3)
    Ms = TL.dense_to_sparse(meta, jnp.asarray(M))
    LD, Dinv = TL.factor(meta, Ms)
    b = jnp.asarray(rng.standard_normal((meta.nv, 3)))
    x = TL.solve(meta, LD, Dinv, b)
    ref = np.linalg.solve(M[..., 0], np.asarray(b)[..., 0])
    np.testing.assert_allclose(np.asarray(x)[..., 0], ref, rtol=1e-8,
                               atol=1e-10)
