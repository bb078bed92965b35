"""Sub-stage timing of the two hot stages (collision, constraint solve).

Few jits (compiles through the axon tunnel cost ~35 s each). A trivial
jitted op calibrates the per-call dispatch overhead.
"""

import os
import time

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import solver as SOL


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d = states.data
    fetch(d.qpos)
    meta = C.efc_meta(m)
    print(f"B={B} ncon_max={m.ncon_max} nccd={m.nccd} "
          f"ccd_budget={m.ccd_budget} groups={meta.groups} "
          f"nlimit={len(meta.limit_ids)}", flush=True)

    timeit("calib (x+1)", jax.jit(lambda x: x + 1.0), d.qpos)
    timeit("narrowphase_analytic",
           jax.jit(lambda dd: col._narrowphase(m, dd)), d)
    timeit("ccd_stage",
           jax.jit(lambda dd: col._ccd_stage(m, dd, dd.qpos.dtype)), d)
    d = timeit("collision_full", jax.jit(lambda dd: col.collision(m, dd)), d)
    efc = timeit("make_efc", jax.jit(lambda dd: C.make_efc(m, dd, meta)), d)

    lim, groups = efc
    for g in groups:
        print(f"  group condim={g.condim} K={g.K} jac={g.jac.shape}",
              flush=True)

    timeit("solve_dual it16 ns3",
           jax.jit(lambda dd: SOL.solve_dual(m, dd, lim, groups,
                                             iterations=16,
                                             noslip_iterations=3)), d)
    timeit("solve_dual it16 ns0",
           jax.jit(lambda dd: SOL.solve_dual(m, dd, lim, groups,
                                             iterations=16,
                                             noslip_iterations=0)), d)
    timeit("solve_dual it4 ns0",
           jax.jit(lambda dd: SOL.solve_dual(m, dd, lim, groups,
                                             iterations=4,
                                             noslip_iterations=0)), d)
    timeit("C.solve (full)",
           jax.jit(lambda dd: C.solve(m, dd)), d)


if __name__ == "__main__":
    main()
