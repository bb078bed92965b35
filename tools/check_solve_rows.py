"""TPU numeric check: the one-call solve_rows kernel vs the two-kernel
chain (upsolve_build_yd + apgd_iterate + XLA tree sweeps) on random
compact-row data shaped like the production walk_on_ball layout."""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flybody_tpu.ops import solver_kernels as SK
from flybody_tpu.ops import tree_ldl as TL


def main():
    B = int(os.environ.get("B", 256))
    rng = np.random.RandomState(0)
    # fly-like tree: 105 dofs; parent chain with some branching
    parent = np.full(105, -1, np.int32)
    for i in range(1, 105):
        parent[i] = i - 1 if i % 7 else max(0, i - 7)
    tree = TL.build_tree_meta(parent)
    nv, nbody = 105, 69
    kl, kc = 32, 40
    R = kl + 3 * kc
    # SPD factor from a random tree matrix
    M = np.eye(nv) * 3.0
    for i in range(nv):
        j = parent[i]
        if j >= 0:
            M[i, j] = M[j, i] = 0.4
    Ms = jnp.asarray(M, jnp.float32)[tree.entry_i, tree.entry_j]
    Ms = jnp.broadcast_to(Ms[:, None], (tree.nM, B))
    ld, dinv = TL.factor(tree, Ms)

    # body -> dof support mask (ancestor-ish structure)
    maskd = (rng.rand(nbody, nv) < 0.25).astype(np.float32)
    f32 = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32)
    d6 = f32(nv, 6, B)
    u6 = f32(R, 6, B)
    b1 = jnp.asarray(rng.randint(0, nbody, (R, B)), jnp.int32)
    b2 = jnp.asarray(rng.randint(0, nbody, (R, B)), jnp.int32)
    ls = f32(R, B) * (jnp.arange(R)[:, None] < 24)
    la = jnp.asarray(
        np.where(np.arange(R)[:, None] < 24,
                 rng.randint(0, nv, (R, B)), -1), jnp.int32)
    qs = f32(nv, B)
    qv = f32(nv, B)
    kco = jnp.abs(f32(R, B))
    bco = jnp.abs(f32(R, B))
    por = f32(R, B)
    rreg = jnp.abs(f32(R, B)) * 0.1 + 0.01
    act = (rng.rand(R, B) > 0.4).astype(np.float32)
    act = jnp.asarray(np.where(np.arange(R)[:, None] % 9 == 0, 0, act),
                      jnp.float32)
    mu = jnp.abs(f32(kc, B)) * 0.5 + 0.3
    f0 = jnp.zeros((R, B), jnp.float32)
    kw = dict(kl=kl, kc=kc, iterations=20, noslip_iterations=3,
              power_iters=4)

    @jax.jit
    def one_call():
        return SK.solve_rows(tree, d6, u6, b1, b2, ls, la, maskd, ld,
                             dinv, qs, qv, kco, bco, por, rreg, act, mu,
                             f0, None, **kw)

    @jax.jit
    def two_call():
        yd, bvec = SK.upsolve_build_yd(tree, d6, u6, b1, b2, ls, la,
                                       maskd, ld, dinv, qs, qv, kco,
                                       bco, por)
        f, ystar, v = SK.apgd_iterate(yd, bvec, rreg, act, mu, f0, None,
                                      **kw)
        sq = 1.0 / jnp.sqrt(jnp.maximum(dinv, 1e-30))
        qfrc = TL.mul_lt(tree, ld, ystar * sq)
        dq = TL.solve_down(tree, ld, ystar * jnp.sqrt(dinv))
        return f, v, qfrc, dq

    f1, v1, qf1, dq1 = map(np.asarray, one_call())
    f2, v2, qf2, dq2 = map(np.asarray, two_call())
    for name, a, b in (("f", f1, f2), ("v", v1, v2), ("qfrc", qf1, qf2),
                       ("dqacc", dq1, dq2)):
        rel = (np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))
        print(f"{name:6s} rel {rel:.3e}", flush=True)
        assert rel < 1e-4, (name, rel)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
