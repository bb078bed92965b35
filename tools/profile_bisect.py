"""Bisect constraint-solve and sensor costs inside fused pipelines."""

import os
import time

import jax
import jax.numpy as jnp

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import constraint as C
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import sensors as sens
from flybody_tpu.physics import smooth as S


def fetch(x):
    for leaf in jax.tree_util.tree_leaves(x):
        float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
          flush=True)


def main():
    B = int(os.environ.get("B", 2048))
    env = walk_on_ball()
    m = env.model
    states = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    d0 = states.data
    fetch(d0.qpos)
    print(f"B={B}", flush=True)

    def fwd_smooth(d):
        d = F.fwd_position(m, d)
        d = F.fwd_velocity(m, d)
        d = F.fwd_actuation(m, d)
        d = F.fwd_acceleration(m, d)
        return d

    timeit("fwd_smooth (qacc_smooth out)",
           jax.jit(lambda d: fwd_smooth(d).qacc_smooth), d0)

    from flybody_tpu.physics import actuation as A
    from flybody_tpu.physics import collision as col
    from flybody_tpu.physics import kinematics as K
    from flybody_tpu.physics import passive as P

    # inner bisect of fwd_smooth: force real outputs of each sub-stage
    def kin_only(d):
        d = K.kinematics(m, d)
        return d.xpos, d.xquat, d.geom_xpos, d.site_xmat
    timeit("  kinematics only", jax.jit(kin_only), d0)

    def through_compos(d):
        d = K.kinematics(m, d)
        d = K.com_pos(m, d)
        return d.cdof, d.cinert, d.subtree_com
    timeit("  kin+com_pos", jax.jit(through_compos), d0)

    def through_crb(d):
        d = K.kinematics(m, d)
        d = K.com_pos(m, d)
        d = K.tendon(m, d)
        d = S.crb(m, d)
        return d.qLD, d.qLDiagInv
    timeit("  kin+com_pos+crb+factor", jax.jit(through_crb), d0)

    def through_col(d):
        d = K.kinematics(m, d)
        d = col.collision(m, d)
        return d.contact.dist, d.contact.frame
    timeit("  kin+collision", jax.jit(through_col), d0)

    def through_vel(d):
        d = K.kinematics(m, d)
        d = K.com_pos(m, d)
        d = S.com_vel(m, d)
        d = P.passive(m, d)
        d = S.rne(m, d)
        return d.qfrc_passive, d.qfrc_bias
    timeit("  kin+compos+vel+passive+rne", jax.jit(through_vel), d0)

    def efc_only(d):
        d = fwd_smooth(d)
        lim, groups = C.make_efc(m, d)
        outs = [lim.aref, lim.R] + [g.jac for g in groups]
        return outs
    timeit("fwd + make_efc (J out)", jax.jit(efc_only), d0)

    for it in (0, 4, 16):
        def solve_it(d, it=it):
            d = fwd_smooth(d)
            d = C.solve(m, d, iterations=it)
            return d.qacc, d.qfrc_constraint, d.warm_f
        timeit(f"fwd + solve(iters={it})", jax.jit(solve_it), d0)

    def full_fwd(d):
        d = fwd_smooth(d)
        return C.solve(m, d)

    timeit("full forward (qacc out)",
           jax.jit(lambda d: full_fwd(d).qacc), d0)

    def plus_rnepost(d):
        d = full_fwd(d)
        cacc, cfrc_int = sens.rne_postconstraint(m, d)
        return d.qacc, cacc, cfrc_int
    timeit("+ rne_postconstraint", jax.jit(plus_rnepost), d0)

    def plus_cbf(d):
        d = full_fwd(d)
        return d.qacc, sens._contact_body_forces(m, d)
    timeit("+ contact_body_forces only", jax.jit(plus_cbf), d0)

    def plus_sensors(d):
        d = full_fwd(d)
        d = sens.sensor(m, d)
        return d.qacc, d.sensordata
    timeit("+ full sensors", jax.jit(plus_sensors), d0)

    def plus_euler(d):
        d = full_fwd(d)
        d = sens.sensor(m, d)
        d = F.euler(m, d)
        return d.qpos, d.qvel, d.sensordata
    timeit("+ euler (full substep)", jax.jit(plus_euler), d0)


if __name__ == "__main__":
    main()
