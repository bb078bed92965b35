"""Control-step-level timing: step vs autoreset vs reset vs substeps."""

import os
import time

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import forward as F


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=5):
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
    keys = jax.random.split(rng, B)
    reset = jax.jit(env.reset)
    states = reset(keys)
    fetch(states)
    print(f"B={B} n_substeps={env.n_substeps}", flush=True)

    lo, hi = env.action_spec()
    mid = jnp.broadcast_to(jnp.asarray((lo + hi) / 2, jnp.float32),
                           (B, env.action_size))

    timeit("reset", reset, keys)
    timeit("step", jax.jit(env.step), states, mid)
    timeit("autoreset_step", jax.jit(env.autoreset_step), states, mid)

    # physics only: 10 substeps scanned
    def ten_substeps(d):
        def sub(dd, _):
            return F.step(m, dd), None
        d, _ = jax.lax.scan(sub, d, None, length=env.n_substeps)
        return d
    timeit("10x substep (scan)", jax.jit(ten_substeps), states.data)

    def one_substep(d):
        return F.step(m, d)
    timeit("1x substep", jax.jit(one_substep), states.data)

    # obs + reward stage alone
    def obs_reward(data, ts):
        obs = env._obs(data, ts, data.sensordata)
        r = jax.vmap(lambda d, t, s: env.task.reward_term_discount(
            m, d, t, s), in_axes=(-1, -1, -1), out_axes=0)(
            data, ts, data.sensordata)
        return obs, r
    timeit("obs+reward (vmapped)", jax.jit(obs_reward), states.data,
           states.task_state)


if __name__ == "__main__":
    main()
