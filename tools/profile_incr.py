"""Incremental fused-pipeline timing: isolates stage costs inside one jit
call (per-call tunnel overhead cancels in differences)."""

import os
import time

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import actuation as A
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics import passive as P
from flybody_tpu.physics import sensors as sens
from flybody_tpu.physics import smooth as S


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=8):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("B", 2048))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    fetch(d0)
    print(f"B={B}", flush=True)

    stages = [
        ("kinematics", lambda d: K.kinematics(m, d)),
        ("com_pos", lambda d: K.com_pos(m, d)),
        ("tendon", lambda d: K.tendon(m, d)),
        ("crb+factor", lambda d: S.crb(m, d)),
        ("collision", lambda d: col.collision(m, d)),
        ("transmission", lambda d: S.transmission(m, d)),
        ("com_vel", lambda d: S.com_vel(m, d)),
        ("passive", lambda d: P.passive(m, d)),
        ("rne", lambda d: S.rne(m, d)),
        ("actuation", lambda d: F.fwd_actuation(m, d)),
        ("acceleration", lambda d: F.fwd_acceleration(m, d)),
        ("constraint", lambda d: C.solve(m, d)),
        ("sensors", lambda d: sens.sensor(m, d)),
        ("euler", lambda d: F.euler(m, d)),
    ]

    prev = 0.0
    for n in range(1, len(stages) + 1):
        def pipeline(d, n=n):
            for _, fn in stages[:n]:
                d = fn(d)
            return d.qpos, d.qvel, d.qacc, d.sensordata
        t = timeit(jax.jit(pipeline), d0)
        print(f"+{stages[n-1][0]:16s} cum {t*1e3:8.2f} ms   "
              f"delta {(t-prev)*1e3:7.2f} ms", flush=True)
        prev = t


if __name__ == "__main__":
    main()
