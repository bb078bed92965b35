"""Subtractive profiling: full substep vs substep with one stage stubbed.

The in-pipeline cost of a stage = full - (full minus stage); per-call
tunnel overhead cancels in the difference and XLA fusion context is
preserved (unlike standalone stage timings, which add a ~4.5ms floor).
"""

import os
import time

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(os.environ.get("B", 4096))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    fetch(d0)
    print(f"B={B} ncon={m.ncon_max} nccd={m.nccd} ccd_budget={m.ccd_budget}",
          flush=True)

    def substep(d, skip=()):
        d = K.kinematics(m, d)
        d = K.com_pos(m, d)
        d = K.tendon(m, d)
        d = S.crb(m, d)
        if "collision" not in skip:
            if "ccd" in skip:
                import dataclasses
                m2 = dataclasses.replace(m, ccd_budget=0)
                d = col.collision(m2, d)
                mm = m2
            else:
                d = col.collision(m, d)
                mm = m
        else:
            mm = m
        d = S.transmission(m, d)
        d = S.com_vel(m, d)
        d = P.passive(m, d)
        d = S.rne(m, d)
        if "collision" not in skip and "constraint" not in skip:
            efc = C.make_efc(mm, d)
        else:
            efc = None
        d = F.fwd_actuation(m, d, efc=efc)
        d = F.fwd_acceleration(m, d)
        if efc is not None and "solver" not in skip:
            d = C.solve(mm, d, efc=efc)
        else:
            d = d.replace(qacc=d.qacc_smooth)
        if "sensors" not in skip:
            d = sens.sensor(m, d)
        d = F.euler(m, d)
        return d.qpos, d.qvel, d.qacc, d.sensordata

    base = timeit(jax.jit(lambda d: substep(d)), d0)
    print(f"full substep                 {base*1e3:8.2f} ms", flush=True)
    for sk in ("ccd", "collision", "solver", "sensors",
               ("collision", "constraint", "sensors")):
        skips = (sk,) if isinstance(sk, str) else sk
        t = timeit(jax.jit(lambda d, s=skips: substep(d, s)), d0)
        name = "+".join(skips)
        print(f"minus {name:36s} {t*1e3:8.2f} ms   "
              f"(stage cost {(base-t)*1e3:7.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
