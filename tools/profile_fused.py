"""Fixed-cost breakdown of the fused contact solver.

The iteration sweep (tools/profile_prod.py) shows the APGD loop costs
~0.1 ms/iteration while the SOLVER stage totals ~5.6 ms/substep — the
cost is the fixed part. This tool times solve_fused truncated at each
internal stage (solver_fused._stage knob): row ASSEMBLY (limit rows +
top-k selections + one-hot payload compactions + u6/warm build), the
upsolve YD kernel, the APGD kernel, and the full path (post tree sweeps
+ warm bookkeeping).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import solver_fused as SF


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    fetch(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    fetch(d0)
    # advance to the solver's input state
    pre = jax.jit(lambda d: F.fwd_acceleration(
        m, F.fwd_actuation(m, F.fwd_velocity(m, F.fwd_position(m, d)))))
    d1 = pre(d0)
    fetch(d1)

    calib = timeit("calib (x+1)", jax.jit(lambda x: x + 1.0), d1.qpos)
    for st in ("assembly", "yd", "apgd", "full"):
        timeit(f"stage={st}", jax.jit(functools.partial(
            SF.solve_fused, m, _stage=st)), d1)
    timeit("stage=full iters=0", jax.jit(functools.partial(
        SF.solve_fused, m, iterations=0)), d1)


if __name__ == "__main__":
    main()
