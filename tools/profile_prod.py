"""Subtractive profiling of the PRODUCTION substep schedule.

Times one jitted control step (col_refresh block schedule: 1 full
selection + r-1 geometry updates, fused solver) and variants with one
stage stubbed; per-call tunnel overhead cancels in the differences and
XLA fusion context is preserved. This is the profile that matches
bench.py, unlike tools/profile_minus.py (oracle path).
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import sensors as sens


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    fetch(d0)
    r = int(m.col_refresh)
    n_sub = env.n_substeps
    print(f"B={B} col_refresh={r} n_substeps={n_sub} "
          f"fused_sel={m.fused_sel} ccd_budget={m.ccd_budget}", flush=True)

    def substep(d, col_update, skip=()):
        d = F.fwd_position(m, d, col_update=col_update) \
            if not (col_update and "update" in skip) else \
            _fwd_position_noupdate(d)
        d = F.fwd_velocity(m, d)
        d = F.fwd_actuation(m, d)
        d = F.fwd_acceleration(m, d)
        if "solver" not in skip:
            d = C.solve(m, d)
        else:
            d = d.replace(qacc=d.qacc_smooth,
                          qfrc_constraint=jnp.zeros_like(d.qvel))
        if "sensors" not in skip:
            d = sens.sensor(m, d)
        d = F.euler(m, d)
        return d

    def _fwd_position_noupdate(d):
        from flybody_tpu.physics import kinematics as K
        from flybody_tpu.physics import smooth as S
        d = K.kinematics(m, d)
        d = K.com_pos(m, d)
        d = K.tendon(m, d)
        d = S.crb(m, d)
        d = S.transmission(m, d)
        return d

    def control_step(d, skip=()):
        def cheap(dd, _):
            return substep(dd, True, skip), None

        d = substep(d, False, skip)
        d, _ = jax.lax.scan(cheap, d, None, length=n_sub - 1)
        return d.qpos, d.qvel, d.qacc, d.sensordata

    base = timeit(jax.jit(lambda d: control_step(d)), d0)
    print(f"full control step ({n_sub} substeps)  {base*1e3:8.2f} ms   "
          f"-> {B/base:,.0f} env-steps/s", flush=True)
    for sk in ("solver", "update", "sensors"):
        t = timeit(jax.jit(lambda d, s=(sk,): control_step(d, s)), d0)
        print(f"minus {sk:10s} {t*1e3:8.2f} ms   "
              f"(stage total {(base-t)*1e3:7.2f} ms)", flush=True)

    # solver iteration scaling (production niter=20): cost per iteration
    import functools
    from flybody_tpu.physics import solver_fused as SF
    d1 = jax.jit(lambda d: substep(d, False))(d0)
    fetch(d1)
    for it in (20, 10, 4):
        f = jax.jit(functools.partial(SF.solve_fused, m, iterations=it))
        t = timeit(f, d1)
        print(f"solve_fused iters={it:3d}  {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
