"""Sub-stage timing of collision() at bench batch size.

Breaks the collision stage (the current substep hot spot) into:
  narrowphase   — analytic closed-form pairs over all candidate slots
  analytic_sel  — per-condim-group top-K + one-hot compaction
  ccd_gate      — center-line support-gap gates + top-K lane pick
  ccd_compact   — lane compaction one-hot contractions (table + frames)
  ccd_pgd       — exact-convex PGD narrowphase on the selected lanes
  collision     — the full production stage

NOTE: on the axon-tunneled TPU, jax.block_until_ready returns before
execution completes; every timing fences with a scalar fetch.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_prof_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import ccd as ccd_mod


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
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    rng = jax.random.PRNGKey(0)
    states = jax.jit(env.reset)(jax.random.split(rng, B))
    d = states.data
    fetch(d.qpos)
    print(f"B={B} ncon_max={m.ncon_max} nccd={m.nccd} "
          f"ccd_budget={m.ccd_budget} classes={m.ccd_classes}", flush=True)

    dtype = d.qpos.dtype

    timeit("narrowphase(analytic)", jax.jit(
        functools.partial(col._narrowphase, m)), d)

    # analytic selection only: ccd_budget=0 variant of collision
    m_noccd = m.replace(ccd_budget=0, ccd_classes=())
    timeit("collision[no ccd]", jax.jit(
        functools.partial(col.collision, m_noccd)), d)

    # ccd sections: skip entirely on models without ccd classes (e.g.
    # a no-ccd variant) so the tool degrades to analytic-only profiling
    if m.ccd_classes:
        # ccd gates + top-k only
        def gates(d):
            outs = []
            for (ax1, ax2, start, n, N) in m.ccd_classes:
                db = col.ccd_gate(m, d, start, n, dtype)
                eff = db - m.ccd_includemargin[start:start + n].astype(
                    dtype)[:, None]
                _, top = jax.lax.top_k(-eff.T, N)
                outs.append(top)
            return outs
        timeit("ccd gate+topk", jax.jit(gates), d)

        timeit("ccd stage (full)", jax.jit(
            functools.partial(col._ccd_stage, m, dtype=dtype)), d)

        # pgd alone on fixed lanes (first class worth of lanes). The
        # prm tensors are passed as jit ARGUMENTS (not closure
        # constants) so XLA cannot constant-fold the lane setup; still
        # a cold-start probe with u0=None — in-situ PGD inside
        # _ccd_stage additionally pays lane compaction + warm-start
        # matching, so compare against 'ccd stage (full)' accordingly.
        (ax1, ax2, start, n, N) = m.ccd_classes[0]
        g1 = np.asarray(m.ccd_geom1)[start:start + N]
        g2 = np.asarray(m.ccd_geom2)[start:start + N]
        core = m.ccd_core[start:start + N].astype(dtype)
        p1, R1 = d.geom_xpos[g1], d.geom_xmat[g1]
        p2, R2 = d.geom_xpos[g2], d.geom_xmat[g2]
        mb = lambda x: jnp.broadcast_to(x[..., None], x.shape + (B,))
        core1 = (mb(core[:, 0:3]), mb(core[:, 3:4]), mb(core[:, 4:5]))
        core2 = (mb(core[:, 5:8]), mb(core[:, 8:9]), mb(core[:, 9:10]))
        timeit(f"ccd pgd x{N} lanes cls0 (cold)", jax.jit(
            lambda p1, R1, p2, R2, c1, c2: ccd_mod.narrowphase(
                p1, R1, (*c1, ax1), p2, R2, (*c2, ax2),
                iters=m.ccd_iters)),
            p1, R1, p2, R2, core1, core2)

    timeit("collision (full)", jax.jit(
        functools.partial(col.collision, m)), d)


if __name__ == "__main__":
    main()
