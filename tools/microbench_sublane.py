"""Microbench: layout/scatter/matvec op costs on the tunneled TPU.

Measurement: each op runs inside jit-of-scan at two lengths (N1, N2); the
per-iteration cost is the slope (T2 - T1) / (N2 - N1). This cancels both
the per-call dispatch cost and the ~32ms scalar-fetch cost of the axon
tunnel (see tools/profile_stages.py note), which otherwise swamp
microsecond-scale kernels.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N1, N2 = 64, 512


def bench(name, op, *inputs, reps=2):
    def mk(n):
        def loop(c0, args):
            def body(c, _):
                out = op(c, *args)
                return jnp.mean(out.astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c
        return jax.jit(loop)

    times = []
    for n in (N1, N2):
        jl = mk(n)
        c = float(jl(jnp.float32(0.0), inputs))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            c = float(jl(jnp.float32(c % 1.0), inputs))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    per_iter = (times[1] - times[0]) / (N2 - N1)
    print(f"{name:52s} {per_iter*1e6:10.1f} us", flush=True)


B = 4096
P = 1137
key = jax.random.PRNGKey(0)

a_n3B = jax.random.normal(key, (P, 3, B))
a_3nB = jnp.transpose(a_n3B, (1, 0, 2)) + 0.0
a_flat = a_n3B.reshape(-1, B) + 0.0

bench("elemwise (1137,3,B)", lambda c, x: jnp.sum(
    (x + c) * 2.0 + (x + c) * (x + c) - 3.0 * x, axis=(0, 1)), a_n3B)
bench("elemwise (3,1137,B)", lambda c, x: jnp.sum(
    (x + c) * 2.0 + (x + c) * (x + c) - 3.0 * x, axis=(0, 1)), a_3nB)
bench("elemwise (3411,B)", lambda c, x: jnp.sum(
    (x + c) * 2.0 + (x + c) * (x + c) - 3.0 * x, axis=0), a_flat)

bench("cross (1137,3,B) axis -2", lambda c, x: jnp.sum(
    jnp.cross(x + c, x * 2.0, axis=-2), axis=(0, 1)), a_n3B)
bench("cross (3,1137,B) axis 0", lambda c, x: jnp.sum(
    jnp.cross(x + c, x * 2.0, axis=0), axis=(0, 1)), a_3nB)

bench("dot (1137,3,B) axis -2", lambda c, x: jnp.sum(
    jnp.sum((x + c) * (x * 2.0), axis=-2), axis=0), a_n3B)
bench("dot (3,1137,B) axis 0", lambda c, x: jnp.sum(
    jnp.sum((x + c) * (x * 2.0), axis=0), axis=0), a_3nB)

selB = jnp.asarray(np.random.randint(0, P, (24, B)), jnp.int32)
bench("take_along_axis (1137,3,B) sel (24,B)",
      lambda c, x, s: jnp.sum(jnp.take_along_axis(
          x + c, s[:, None, :], axis=0), axis=(0, 1)), a_n3B, selB)
b24 = jax.random.normal(key, (24, 3, B))
bench("take_along_axis on pre-shifted input (no x+c)",
      lambda c, x, s, y: jnp.sum(jnp.take_along_axis(
          x, jnp.clip(s + jnp.int32(c * 0), 0, P - 1)[:, None, :], axis=0)
          + c, axis=(0, 1)), a_n3B, selB, b24)

npairs = 500
bp = np.random.randint(0, 69, (npairs,))
vp = np.random.randint(0, 105, (npairs,))
src = jax.random.normal(key, (105, 6, B))
oh = np.zeros((69, npairs), np.float32)
oh[bp, np.arange(npairs)] = 1.0
ohj = jnp.asarray(oh)

bench("scatter-add 500 pairs -> (69,6,B)",
      lambda c, x: jnp.sum(jnp.zeros((69, 6, B), x.dtype)
                           .at[bp].add((x + c)[vp]), axis=(0, 1)), src)
bench("one-hot matmul (69,500)@(500,6B)",
      lambda c, x: jnp.sum(
          (ohj @ (x + c)[vp].reshape(npairs, -1)).reshape(69, 6, B),
          axis=(0, 1)), src)

K, dim, nv = 16, 3, 105
jac = jax.random.normal(key, (K, dim, nv, B))
fkd = jax.random.normal(key, (K, dim, B))
wv = jax.random.normal(key, (nv, B))
bench("einsum kdvB,kdB->vB (16,3,105,B)",
      lambda c, j, f: jnp.sum(jnp.einsum("kdvB,kdB->vB", j, f + c), axis=0),
      jac, fkd)
bench("einsum kdvB,vB->kdB (16,3,105,B)",
      lambda c, j, w: jnp.sum(jnp.einsum("kdvB,vB->kdB", j, w + c),
                              axis=(0, 1)), jac, wv)

for R in (38, 56, 72):
    Amat = jax.random.normal(key, (R, R, B))
    fv = jax.random.normal(key, (R, B))
    bench(f"dense A matvec rsB,sB->rB R={R}",
          lambda c, A, f: jnp.sum(jnp.einsum("rsB,sB->rB", A, f + c),
                                  axis=0), Amat, fv)

x0 = jax.random.normal(key, (105, B))
lev_ii = [np.random.randint(0, 105, (50,)) for _ in range(10)]
lev_jj = [np.random.randint(0, 105, (50,)) for _ in range(10)]
levs = [jax.random.normal(key, (50, B)) for _ in range(10)]

def sweep(c, x, *es):
    x = x + c
    for ii, jj, e in zip(lev_ii, lev_jj, es):
        x = x.at[jj].add(-e * x[ii])
    return jnp.sum(x, axis=0)
bench("LDL sweep 10 lvls x 50 entries (105,B)", sweep, x0, *levs)

# gathers with static row indices, 586-entry factor style
e586 = jax.random.normal(key, (586, B))
gi586 = np.random.randint(0, 105, (586,))
bench("gather 586 static rows of (105,B) + mult",
      lambda c, e, x: jnp.sum(e * (x + c)[gi586], axis=0), e586, x0)
