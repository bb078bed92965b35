"""Per-stage timing of the NON-solver, NON-collision substep stages.

Each stage is timed as a two-length lax.scan over the stage alone
(N2-N1 differencing cancels per-call dispatch), on production
walk_on_ball state at B. Standalone stages lose cross-stage fusion, so
treat results as relative magnitudes, not exact in-context costs.
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
from flybody_tpu.physics import actuation as A
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics import passive as P
from flybody_tpu.physics import sensors as sens
from flybody_tpu.physics import smooth as S

N1, N2 = 8, 40


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(name, fn, d0, reps=2):
    def mk(n):
        def loop(d):
            def body(dd, _):
                return fn(dd), None
            d, _ = jax.lax.scan(body, d, None, length=n)
            return d
        return jax.jit(loop)

    times = []
    try:
        for n in (N1, N2):
            jl = mk(n)
            out = jl(d0)
            fetch(out)
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jl(d0)
                fetch(out)
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        print(f"{name:24s} {(times[1]-times[0])/(N2-N1)*1e3:8.3f} ms",
              flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    # settle into a contact-rich state
    d0 = jax.jit(lambda d: F.step(m, d))(d0)
    fetch(d0)
    print(f"B={B}", flush=True)

    stages = [
        ("kinematics", lambda d: K.kinematics(m, d)),
        ("com_pos", lambda d: K.com_pos(m, d)),
        ("tendon", lambda d: K.tendon(m, d)),
        ("crb+factor", lambda d: S.crb(m, d)),
        ("transmission", lambda d: S.transmission(m, d)),
        ("com_vel", lambda d: S.com_vel(m, d)),
        ("passive", lambda d: P.passive(m, d)),
        ("rne", lambda d: S.rne(m, d)),
        ("actuation", lambda d: F.fwd_actuation(m, d)),
        ("fwd_accel", lambda d: F.fwd_acceleration(m, d)),
        ("sensors", lambda d: sens.sensor(m, d)),
        ("euler", lambda d: F.euler(m, d)),
        ("collision_update", lambda d: col.collision_update(m, d)),
        ("collision_full", lambda d: col.collision(m, d)),
    ]
    for name, fn in stages:
        bench(name, fn, d0)


if __name__ == "__main__":
    main()
