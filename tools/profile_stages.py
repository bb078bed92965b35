"""Stage-level timing of the physics substep at bench batch size.

NOTE: on the axon-tunneled TPU, jax.block_until_ready returns before
execution completes; every timing here forces a scalar fetch to get real
wall-clock numbers.
"""

import functools
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
    reset = jax.jit(env.reset)
    states = reset(jax.random.split(rng, B))
    d = states.data
    fetch(d.qpos)
    print(f"B={B}", flush=True)

    def vj(fn):
        return jax.jit(functools.partial(fn, m))

    d = timeit("kinematics", vj(K.kinematics), d)
    d = timeit("com_pos", vj(K.com_pos), d)
    d = timeit("tendon", vj(K.tendon), d)
    d = timeit("crb", vj(S.crb), d)
    d = timeit("collision", vj(col.collision), d)
    d = timeit("transmission", vj(S.transmission), d)
    d = timeit("com_vel", vj(S.com_vel), d)
    d = timeit("passive", vj(P.passive), d)
    d = timeit("rne", vj(S.rne), d)
    d = timeit("fwd_actuation", vj(F.fwd_actuation), d)
    d = timeit("fwd_acceleration", vj(F.fwd_acceleration), d)
    d = timeit("constraint.solve", vj(C.solve), d)
    d = timeit("sensors", vj(sens.sensor), d)
    d = timeit("euler", vj(F.euler), d)
    print("---", flush=True)
    timeit("full substep (step)", vj(F.step), d)


if __name__ == "__main__":
    main()
