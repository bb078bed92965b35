"""Break down _ccd_stage cost: gate+topk vs gathers vs PGD vs warm match."""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import ccd as ccd_mod
from flybody_tpu.physics import kinematics as K


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    rng = jax.random.PRNGKey(0)
    states = jax.jit(env.reset)(jax.random.split(rng, B))
    d = jax.jit(functools.partial(K.kinematics, m))(states.data)
    fetch(d.qpos)
    dtype = d.qpos.dtype

    g1_all = np.asarray(m.ccd_geom1)
    g2_all = np.asarray(m.ccd_geom2)

    from flybody_tpu.physics import collision as col

    def gates_topk(dd):
        outs = []
        for (ax1, ax2, start, n, N) in m.ccd_classes:
            seg = slice(start, start + n)
            db = col.ccd_gate(m, dd, start, n, dtype)
            eff = db - m.ccd_includemargin[seg].astype(dtype)[:, None]
            _, top = jax.lax.top_k(-eff.T, N)
            outs.append(top.T)
        return outs

    idxs = timeit("gate+topk (all classes)", jax.jit(gates_topk), d)

    def gathers(dd, idxs):
        outs = []
        for (ax1, ax2, start, n, N), idx in zip(m.ccd_classes, idxs):
            seg = slice(start, start + n)
            gg1 = jnp.asarray(g1_all[seg], jnp.int32)[idx]
            gg2 = jnp.asarray(g2_all[seg], jnp.int32)[idx]
            p1 = jnp.take_along_axis(dd.geom_xpos, gg1[:, None, :], axis=0)
            p2 = jnp.take_along_axis(dd.geom_xpos, gg2[:, None, :], axis=0)
            R1 = jnp.take_along_axis(dd.geom_xmat, gg1[:, None, None, :],
                                     axis=0)
            R2 = jnp.take_along_axis(dd.geom_xmat, gg2[:, None, None, :],
                                     axis=0)
            ts = m.ccd_core[seg].astype(dtype)[idx]
            outs.append((p1, p2, R1, R2, ts))
        return outs

    gath = timeit("gathers (geom data + table)",
                  jax.jit(functools.partial(gathers, d)), idxs)

    def pgd_all(gath):
        outs = []
        for (ax1, ax2, start, n, N), (p1, p2, R1, R2, ts) in zip(
                m.ccd_classes, gath):
            mv = lambda sl: jnp.moveaxis(ts[..., sl], -1, 1)
            prm1 = (mv(slice(0, 3)), mv(slice(3, 4)), mv(slice(4, 5)), ax1)
            prm2 = (mv(slice(5, 8)), mv(slice(8, 9)), mv(slice(9, 10)), ax2)
            outs.append(ccd_mod.narrowphase(p1, R1, prm1, p2, R2, prm2,
                                            iters=m.ccd_iters))
        return outs

    timeit("narrowphase PGD (all classes)", jax.jit(pgd_all), gath)

    def warm_match(dd, idxs):
        outs = []
        off = 0
        for (ax1, ax2, start, n, N), idx in zip(m.ccd_classes, idxs):
            sel = (m.ncon_max + start + idx).astype(jnp.int32)
            old_id = dd.ccd_warm_id[off:off + N]
            old_u = dd.ccd_warm_u[off:off + N].astype(dtype)
            hit = (sel[:, None, :] == old_id[None, :, :]).astype(dtype)
            outs.append(jnp.einsum("koB,ocB->kcB", hit, old_u))
            off += N
        return outs

    timeit("warm matching", jax.jit(functools.partial(warm_match, d)), idxs)


if __name__ == "__main__":
    main()
