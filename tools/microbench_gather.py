"""Microbench: alternatives for per-env top-K contact selection gathers.

Baseline take_along_axis on batch-trailing arrays is ~750us per field at
(1137 cand, K=24, B=4096). Candidates:
  a) take_along_axis batch-trailing (baseline)
  b) transpose to batch-leading, batched gather, transpose back
  c) one-hot einsum contraction (f32 and bf16 one-hot)
  d) jnp.take on flattened per-env offsets
  e) top_k over packed (dist, payload) to avoid a gather entirely
Slope method (see microbench_sublane.py) cancels dispatch/fetch floors.
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
        c = float(jl(jnp.float32(0.0), inputs))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            c = float(jl(jnp.float32(c % 1.0), inputs))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    per_iter = (times[1] - times[0]) / (N2 - N1)
    print(f"{name:56s} {per_iter*1e6:10.1f} us", flush=True)


B = 4096
key = jax.random.PRNGKey(0)

for ncand, K in ((1089, 8), (48, 16)):
    print(f"--- ncand={ncand} K={K} ---", flush=True)
    x = jax.random.normal(key, (ncand, 3, B))
    sel = jnp.asarray(np.random.randint(0, ncand, (K, B)), jnp.int32)
    selT = sel.T + 0                                  # (B, K)
    xT = jnp.transpose(x, (2, 0, 1)) + 0.0            # (B, ncand, 3)

    bench(f"a) take_along_axis (ncand,3,B)",
          lambda c, x, s: jnp.sum(jnp.take_along_axis(
              x + c, s[:, None, :], axis=0), axis=(0, 1)), x, sel)

    def b_op(c, x, sT):
        xt = jnp.transpose(x + c, (2, 0, 1))          # (B, ncand, 3)
        g = jnp.take_along_axis(xt, sT[:, :, None], axis=1)  # (B, K, 3)
        return jnp.sum(g, axis=(1, 2))
    bench(f"b) transpose + batch-leading gather", b_op, x, selT)

    def b2_op(c, xt, sT):
        g = jnp.take_along_axis(xt + c, sT[:, :, None], axis=1)
        return jnp.sum(g, axis=(1, 2))
    bench(f"b2) batch-leading gather (input already B-major)", b2_op,
          xT, selT)

    def c_op(c, x, s):
        ohg = (s[:, None, :] == jnp.arange(ncand)[None, :, None])
        oh = ohg.astype(x.dtype)                      # (K, ncand, B)
        return jnp.sum(jnp.einsum("ksB,scB->kcB", oh, x + c), axis=(0, 1))
    bench(f"c) one-hot einsum f32", c_op, x, sel)

    def c2_op(c, x, s):
        oh = (s[:, None, :] == jnp.arange(ncand)[None, :, None]
              ).astype(jnp.bfloat16)
        g = jnp.einsum("ksB,scB->kcB", oh,
                       (x + c).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(g, axis=(0, 1))
    bench(f"c2) one-hot einsum bf16", c2_op, x, sel)

    def d_op(c, x, s):
        xf = (x + c).reshape(-1)                      # ncand*3*B
        base = s * (3 * B) + jnp.arange(B)[None, :]   # (K, B)
        idx = (base[:, None, :] + (jnp.arange(3) * B)[None, :, None])
        return jnp.sum(jnp.take(xf, idx.reshape(-1)), axis=0)[None]
    bench(f"d) flat jnp.take", d_op, x, sel)

# top_k itself
for ncand in (1089, 48):
    d = jax.random.normal(key, (ncand, B))
    def tk(c, d, K=8):
        v, i = jax.lax.top_k((d + c).T, K)
        return jnp.sum(v, axis=1)
    bench(f"top_k K=8 over (B,{ncand})", tk, d)

# argmin-iterate alternative for small K: K sequential masked argmins
d48 = jax.random.normal(key, (48, B))
def argmin_iter(c, d, K=16):
    dd = d + c
    out = 0.0
    big = jnp.float32(1e9)
    for _ in range(K):
        i = jnp.argmin(dd, axis=0)                    # (B,)
        v = jnp.min(dd, axis=0)
        out = out + v
        dd = dd + (jnp.arange(d.shape[0])[:, None] == i[None]) * big
    return out
bench("argmin-iterate K=16 over (48,B)", argmin_iter, d48)
