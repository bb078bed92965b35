"""Measure gate-hot contact counts over a random-action rollout of any env.

For each analytic condim group and each ccd class, counts per env the
candidates whose effective distance (dist - includemargin, or the ccd
center-line support gap) is below zero at sampled states of a random-action
rollout. The max over (envs x steps) bounds the top-K budget actually
needed; budgets above it are pure bandwidth waste in the solver
(PERF.md "smaller per-class budgets" lever).

Env selection: ENV=walk_on_ball|walk_imitation|flight_imitation|
vision_flight|template|rodent_<name> (default walk_on_ball).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from flybody_tpu.physics import collision as col
from flybody_tpu.physics import kinematics as K


def make_env(name):
    import flybody_tpu.fly_envs as fe
    import flybody_tpu.rodent_envs as re_
    if name == "walk_on_ball":
        return fe.walk_on_ball()
    if name == "walk_imitation":
        return fe.walk_imitation()
    if name == "flight_imitation":
        return fe.flight_imitation()
    if name == "vision_flight":
        return fe.vision_guided_flight()
    if name == "template":
        return fe.template_task()
    if name.startswith("rodent_"):
        return getattr(re_, name)()
    raise SystemExit(f"unknown ENV={name}")


def make_policy(env, ckpt_dir):
    """Mean-policy action fn from a training checkpoint (so budgets are
    measured under the TRAINED gait, not random flailing — VERDICT r3
    weak #4)."""
    from flybody_tpu.agents.actors import canonical_to_real
    from flybody_tpu.agents.networks import batch_concat, make_policy_critic
    from flybody_tpu.io import checkpoint as ckpt

    path = ckpt.latest(ckpt_dir) or ckpt_dir
    params = ckpt.restore_policy_params(path)
    lo, hi = env.action_spec()
    obs_size = sum(int(np.prod(v.shape[1:]) or 1)
                   for v in jax.eval_shape(
                       env.reset,
                       jax.random.split(jax.random.PRNGKey(0), 1)
                   ).obs.values())
    policy, _, _ = make_policy_critic(env.action_size, obs_size)

    @jax.jit
    def act(obs, key):
        flat = jax.vmap(lambda o: batch_concat(o))(obs)
        dist = policy.apply(params, flat)
        return canonical_to_real(dist.mode(), jnp.asarray(lo),
                                 jnp.asarray(hi))
    return act


def main():
    B = int(os.environ.get("B", 256))
    T = int(os.environ.get("T", 200))
    env = make_env(os.environ.get("ENV", "walk_on_ball"))
    policy = None
    if os.environ.get("POLICY_CKPT"):
        policy = make_policy(env, os.environ["POLICY_CKPT"])
    m = env.model
    rng = jax.random.PRNGKey(0)
    states = jax.jit(env.reset)(jax.random.split(rng, B))
    step = jax.jit(env.autoreset_step)
    lo, hi = env.action_spec()

    con_dim = np.asarray(m.con_dim)
    incm = np.asarray(m.con_includemargin)

    @jax.jit
    def gate_counts(d):
        d = K.kinematics(m, d)
        out = {}
        dist_all, _, _ = col._narrowphase(m, d)
        for cd in sorted(set(con_dim.tolist())):
            slots = np.nonzero(con_dim == cd)[0]
            eff = dist_all[slots] - incm[slots][:, None]
            out[f"analytic_condim{cd}"] = jnp.sum(eff < 0.0, axis=0)
            out[f"analytic_condim{cd}_pen"] = jnp.sum(
                dist_all[slots] < 0.0, axis=0)
        # ccd classes: center-line support gap gate (shared production
        # gate — collision.ccd_gate)
        for ci, (ax1, ax2, start, n, N) in enumerate(m.ccd_classes):
            seg = slice(start, start + n)
            db = col.ccd_gate(m, d, start, n, d.qpos.dtype)
            eff = db - m.ccd_includemargin[seg][:, None]
            out[f"ccd_class{ci}_ax{int(ax1)}{int(ax2)}_n{n}_budget{N}"] = \
                jnp.sum(eff < 0.0, axis=0)
            out[f"ccd_class{ci}_pen"] = jnp.sum(db < 0.0, axis=0)
        out["total_cone_pen"] = sum(
            v for k2, v in out.items()
            if k2.endswith("_pen") and "condim1" not in k2)
        # limit rows within margin of violation (solver-active)
        jl = np.asarray(m.jnt_limited, dtype=bool)
        jt = np.asarray(m.jnt_type)
        ids = np.nonzero(jl & ((jt == 3) | (jt == 2)))[0]
        if len(ids):
            qadr = np.asarray(m.jnt_qposadr)[ids]
            q = d.qpos[qadr]
            lo = m.jnt_range[ids, 0][:, None]
            hi = m.jnt_range[ids, 1][:, None]
            dist = jnp.minimum(q - lo, hi - q)
            pos = dist - m.jnt_margin[ids][:, None]
            out["limits_active"] = jnp.sum(pos < 0.0, axis=0)
        return out

    maxes = {}
    t0 = time.time()
    for t in range(T):
        rng, k = jax.random.split(rng)
        if policy is not None:
            a = policy(states.obs, k)
        else:
            a = jax.random.uniform(k, (B, env.action_size),
                                   minval=jnp.asarray(lo),
                                   maxval=jnp.asarray(hi))
        states = step(states, a)
        if t % 5 == 0 or t == T - 1:
            counts = jax.device_get(gate_counts(states.data))
            for k2, v in counts.items():
                cur = maxes.setdefault(k2, [0, 0.0])
                cur[0] = max(cur[0], int(v.max()))
                cur[1] = max(cur[1], float(np.percentile(v, 99)))
    print(f"rollout {T} ctrl steps x {B} envs in {time.time()-t0:.1f}s")
    for k2, (mx, p99) in sorted(maxes.items()):
        print(f"{k2:42s} max={mx:4d}  p99={p99:.1f}")


if __name__ == "__main__":
    main()
