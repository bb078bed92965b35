"""Per-env throughput table (PERF.md): measured env-steps/s at
production budgets for every major task family.

Usage:  python tools/bench_envs.py [env ...]   (default: all)
Prints one `| env | B | steps/s |` markdown row per env.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# (factory module:fn, kwargs, batch size)
ENVS = {
    "walk_on_ball": ("flybody_tpu.fly_envs:walk_on_ball", {}, 4096),
    "walk_imitation": ("flybody_tpu.fly_envs:walk_imitation", {}, 4096),
    "flight_imitation": ("flybody_tpu.fly_envs:flight_imitation", {}, 4096),
    "vision_flight":
        ("flybody_tpu.fly_envs:vision_guided_flight", {}, 1024),
    "template_task": ("flybody_tpu.fly_envs:template_task", {}, 4096),
    "rodent_run_gaps": ("flybody_tpu.rodent_envs:rodent_run_gaps",
                        {}, 2048),
    "rodent_escape_bowl": ("flybody_tpu.rodent_envs:rodent_escape_bowl",
                           {}, 2048),
    "rodent_two_touch": ("flybody_tpu.rodent_envs:rodent_two_touch",
                         {}, 2048),
    "rodent_maze_forage": ("flybody_tpu.rodent_envs:rodent_maze_forage",
                           {}, 2048),
    "rodent_walk_imitation":
        ("flybody_tpu.rodent_envs:rodent_walk_imitation", {}, 2048),
}


def bench_env(name, spec, iters=10):
    import importlib
    path, kwargs, B = spec
    B = int(os.environ.get("BENCH_NUM_ENVS", B))
    mod, fn = path.split(":")
    env = getattr(importlib.import_module(mod), fn)(**kwargs)
    rng = jax.random.PRNGKey(0)
    reset = jax.jit(env.reset)
    step = jax.jit(env.autoreset_step)
    states = reset(jax.random.split(rng, B))
    lo, hi = env.action_spec()
    mid = jnp.broadcast_to(jnp.asarray((lo + hi) / 2, jnp.float32),
                           (B, env.action_size))
    states = step(states, mid)
    float(jnp.sum(states.data.qpos[0]))     # fence (axon tunnel)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            states = step(states, mid)
        float(jnp.sum(states.data.qpos[0]))
        best = max(best, B * iters / (time.perf_counter() - t0))
    print(f"| {name} | {B} | {best:,.0f} |", flush=True)
    return best


def main():
    names = sys.argv[1:] or list(ENVS)
    print("| env | B | env-steps/s |", flush=True)
    print("|---|---|---|", flush=True)
    for n in names:
        try:
            bench_env(n, ENVS[n])
        except Exception as e:   # keep the table going
            print(f"| {n} | - | FAILED: {type(e).__name__}: {e} |",
                  flush=True)


if __name__ == "__main__":
    main()
