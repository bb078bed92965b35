"""Time the three contact-solver paths (apgd / admm / admm_kernel) on the
bench state, plus collision sub-stages. Run on TPU at bench batch size."""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import collision as col
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import kinematics as K


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
    print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    B = int(os.environ.get("B", 4096))
    from flybody_tpu.tasks import walk_on_ball as wob
    env = walk_on_ball()
    m = env.model
    rng = jax.random.PRNGKey(0)
    states = jax.jit(env.reset)(jax.random.split(rng, B))
    d = states.data
    d = jax.jit(functools.partial(F.fwd_position, m))(d)
    d = jax.jit(functools.partial(F.fwd_velocity, m))(d)
    d = jax.jit(functools.partial(F.fwd_actuation, m))(d)
    d = jax.jit(functools.partial(F.fwd_acceleration, m))(d)
    fetch(d.qpos)
    meta = C.efc_meta(m)
    print(f"B={B} groups={meta.groups} nrows={meta.nrows}", flush=True)

    # collision sub-stages
    dk = jax.jit(functools.partial(K.kinematics, m))(d)
    timeit("narrowphase(analytic)",
           jax.jit(lambda dd: col._narrowphase(m, dd)), dk)
    timeit("ccd_stage",
           jax.jit(lambda dd: col._ccd_stage(m, dd, dd.qpos.dtype)), dk)
    timeit("collision(total)",
           jax.jit(functools.partial(col.collision, m)), dk)

    timeit("make_efc", jax.jit(lambda dd: C.make_efc(m, dd, meta)), d)

    for name in ("apgd", "admm", "admm_kernel"):
        m2 = m.replace(opt=m.opt.replace(contact_solver=name))
        fn = jax.jit(functools.partial(C.solve, m2))
        try:
            timeit(f"constraint.solve[{name}]", fn, d)
        except Exception as e:  # noqa: BLE001
            print(f"constraint.solve[{name}] FAILED: {type(e).__name__} {e}")

    # accuracy cross-check: qacc vs high-iteration apgd reference
    ref = jax.jit(functools.partial(
        C.solve, m.replace(opt=m.opt.replace(contact_solver="apgd")),
        iterations=256))(d)
    qref = np.asarray(ref.qacc)
    scale = np.abs(qref).max()
    for name in ("apgd", "admm", "admm_kernel"):
        m2 = m.replace(opt=m.opt.replace(contact_solver=name))
        out = jax.jit(functools.partial(C.solve, m2))(d)
        err = np.abs(np.asarray(out.qacc) - qref).max() / scale
        print(f"qacc relerr[{name}] vs apgd-256: {err:.3e}")


if __name__ == "__main__":
    main()
