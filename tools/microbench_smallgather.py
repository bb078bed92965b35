"""Microbench: gathering static per-slot tables by per-env indices.

table[sel] where table is a small static (ncand, C) array and sel is
(K, B) — output (K, B, C). Compared against one-hot einsum contraction.
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
    print(f"{name:56s} {(times[1]-times[0])/(N2-N1)*1e6:10.1f} us",
          flush=True)


B = 4096
key = jax.random.PRNGKey(0)

for ncand, K, C in ((1089, 8, 13), (48, 16, 13), (69, 24, 105)):
    table = jax.random.normal(key, (ncand, C))
    sel0 = jnp.asarray(np.random.randint(0, ncand, (K, B)), jnp.int32)

    def g_op(c, t, s):
        s2 = jnp.clip(s + jnp.int32(c * 0), 0, ncand - 1)
        return jnp.sum(t[s2], axis=(0, 2))
    bench(f"table[sel] ({ncand},{C}) sel ({K},B)", g_op, table, sel0)

    def oh_op(c, t, s):
        s2 = jnp.clip(s + jnp.int32(c * 0), 0, ncand - 1)
        oh = (s2[:, None, :] == jnp.arange(ncand)[None, :, None]
              ).astype(t.dtype)
        return jnp.sum(jnp.einsum("ksB,sp->kpB", oh, t), axis=(0, 1))
    bench(f"one-hot einsum ({ncand},{C}) sel ({K},B)", oh_op, table, sel0)

    def to_op(c, t, s):
        s2 = jnp.clip(s.T + jnp.int32(c * 0), 0, ncand - 1)   # (B, K)
        return jnp.sum(t[s2], axis=(0, 1))
    bench(f"table[selT] batch-leading ({ncand},{C})", to_op, table, sel0)
