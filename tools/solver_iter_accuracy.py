"""Production solver iteration count: accuracy vs budget.

Rolls the walk_on_ball env forward (mid actions, production budgets) to
contact-rich states, then compares solve_fused(qacc) at candidate
iteration budgets against a 100-iteration converged solution, in
relative l2 over the batch. Decides the production `niter` (and the
power_iters knob) on measured error, not vibes.
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


def main():
    B = int(os.environ.get("B", 1024))
    warm_steps = int(os.environ.get("WARM", 25))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    lo, hi = env.action_spec()
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    step = jax.jit(env.autoreset_step)
    # randomized per-env actions: decorrelate the batch (walk_on_ball's
    # init is deterministic, so mid actions keep all envs identical)
    key = jax.random.PRNGKey(1)
    for _ in range(warm_steps):
        key, k = jax.random.split(key)
        a = lo + (hi - lo) * jax.random.uniform(
            k, (B, env.action_size))
        states = step(states, a)
    d0 = states.data
    float(jnp.sum(d0.qpos[0]))

    pre = jax.jit(lambda d: F.fwd_acceleration(
        m, F.fwd_actuation(m, F.fwd_velocity(m, F.fwd_position(m, d)))))
    d1 = pre(d0)

    ref = jax.jit(functools.partial(SF.solve_fused, m, iterations=100))(d1)
    qref = ref.qacc
    nref = jnp.sqrt(jnp.sum(qref * qref, axis=0)) + 1e-9
    for it in (4, 6, 8, 10, 14, 20, 32):
        out = jax.jit(functools.partial(SF.solve_fused, m,
                                        iterations=it))(d1)
        diff = out.qacc - qref
        rel = jnp.sqrt(jnp.sum(diff * diff, axis=0)) / nref
        print(f"iters={it:3d}  rel qacc err: median "
              f"{float(jnp.median(rel)):.2e}  p99 "
              f"{float(jnp.percentile(rel, 99)):.2e}  max "
              f"{float(jnp.max(rel)):.2e}", flush=True)


if __name__ == "__main__":
    main()
