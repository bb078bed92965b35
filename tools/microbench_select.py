"""Microbench: per-env candidate selection + payload fetch strategies.

Scenario (ccd class2-like): n=737 candidates, N=16 selected per env,
B=4096; payload = geom pos (3) + mat (9) per side from a (77, c, B)
geom-state array, plus a (n, 23) static param table.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main():
    B = int(os.environ.get("B", 4096))
    n, N, G = 737, 16, 77
    key = jax.random.PRNGKey(0)
    eff = jax.random.normal(key, (n, B), jnp.float32)
    gpos = jax.random.normal(key, (G, 3, B), jnp.float32)
    gmat = jax.random.normal(key, (G, 3, 3, B), jnp.float32)
    g1 = np.random.randint(0, G, (n,)).astype(np.int32)
    tab = jax.random.normal(key, (n, 23), jnp.float32)

    # --- selection -----------------------------------------------------
    def sel_topk(eff):
        _, top = jax.lax.top_k(-eff.T, N)
        return top.T

    def sel_approx(eff):
        _, top = jax.lax.approx_max_k(-eff.T, N, recall_target=0.99)
        return top.T

    def sel_argmin_iter(eff):
        e = eff
        outs = []
        for _ in range(N):
            i = jnp.argmin(e, axis=0)
            outs.append(i)
            e = e.at[i, jnp.arange(e.shape[1])].set(jnp.inf)
        return jnp.stack(outs, axis=0)

    idx = timeit("top_k (B,737) K=16", jax.jit(sel_topk), eff)
    try:
        timeit("approx_max_k 0.99", jax.jit(sel_approx), eff)
    except Exception as e:  # noqa: BLE001
        print(f"approx_max_k failed: {e}")
    timeit("iterative argmin x16", jax.jit(sel_argmin_iter), eff)

    idx = jax.device_get(idx)
    idx = jnp.asarray(idx)

    # --- payload fetch: geom state -------------------------------------
    g1j = jnp.asarray(g1)

    def fetch_take(idx):
        gg = g1j[idx]                                  # (N, B)
        p = jnp.take_along_axis(gpos, gg[:, None, :], axis=0)
        R = jnp.take_along_axis(gmat, gg[:, None, None, :], axis=0)
        return p, R

    def fetch_onehot_geom(idx):
        gg = g1j[idx]                                  # (N, B)
        iota = jnp.arange(G, dtype=jnp.int32)[None, :, None]
        oh = (gg[:, None, :] == iota).astype(jnp.float32)   # (N, G, B)
        p = jnp.einsum("kgB,gcB->kcB", oh, gpos)
        R = jnp.einsum("kgB,gcB->kcB", oh, gmat.reshape(G, 9, B))
        return p, R.reshape(N, 3, 3, B)

    timeit("take_along_axis geom (N,12,B)", jax.jit(fetch_take), idx)
    timeit("one-hot-geom einsum (N,77,B)", jax.jit(fetch_onehot_geom), idx)

    # --- payload fetch: static table ------------------------------------
    def tab_take(idx):
        return jnp.take(tab, idx, axis=0)              # (N, B, 23)

    def tab_onehot(idx):
        iota = jnp.arange(n, dtype=jnp.int32)[None, :, None]
        oh = (idx[:, None, :] == iota).astype(jnp.float32)  # (N, n, B)
        return jnp.einsum("knB,nc->kcB", oh, tab)

    def tab_onehot_bf16(idx):
        iota = jnp.arange(n, dtype=jnp.int32)[None, :, None]
        oh = (idx[:, None, :] == iota).astype(jnp.bfloat16)
        return jnp.einsum("knB,nc->kcB", oh, tab.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    timeit("take static table (N,B,23)", jax.jit(tab_take), idx)
    timeit("one-hot table f32 (N,737,B)", jax.jit(tab_onehot), idx)
    timeit("one-hot table bf16", jax.jit(tab_onehot_bf16), idx)

    # --- gather of per-candidate B-arrays (for warm-u alternatives) ----
    warm = jax.random.normal(key, (n, 3, B), jnp.float32)

    def warm_take(idx):
        return jnp.take_along_axis(warm, idx[:, None, :], axis=0)

    timeit("take warm (n,3,B)->(N,3,B)", jax.jit(warm_take), idx)


if __name__ == "__main__":
    main()
