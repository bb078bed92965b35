"""North-star benchmark: walk-on-ball env throughput (batched, one chip).

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N / 1e6}

`vs_baseline` is the fraction of the driver's north-star target of 1M
aggregate env-steps/s (BASELINE.json; the reference publishes no numbers —
SURVEY.md §6). One env-step = one control step = 10 physics substeps of the
full fly model (105 dofs, 1137 candidate contact pairs, Newton contact
solver) plus observation/reward evaluation.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the fused env step at B=4096 is a large
# XLA program; caching makes repeated bench runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    from flybody_tpu.fly_envs import walk_on_ball

    env = walk_on_ball()
    rng = jax.random.PRNGKey(0)
    reset = jax.jit(env.reset)
    step = jax.jit(env.autoreset_step)

    states = reset(jax.random.split(rng, num_envs))
    lo, hi = env.action_spec()
    mid = jnp.broadcast_to(jnp.asarray((lo + hi) / 2, jnp.float32),
                           (num_envs, env.action_size))

    # compile + warmup. NOTE: on the axon-tunneled TPU,
    # jax.block_until_ready returns before device execution completes, so
    # every timing fence below fetches a scalar instead.
    states = step(states, mid)
    float(jnp.sum(states.data.qpos[0]))

    t0 = time.perf_counter()
    for _ in range(iters):
        states = step(states, mid)
    float(jnp.sum(states.data.qpos[0]))
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * iters / dt
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 1e6, 4),
    }))


if __name__ == "__main__":
    main()
