"""Microbench: per-env payload gather patterns for collision_update.

Gather per-lane geom frames from a per-env payload (ngeom, C, B) with
per-env lane indices (K, B). Candidates:
  1. one-hot einsum  "kgB,gcB->kcB"   (current production pattern)
  2. take_along_axis on axis 0
  3. vmap'd gather over the trailing batch axis
  4. one big one-hot for all lane groups at once
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N1, N2 = 32, 160
B = 4096
NGEOM = 171
C = 12


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
    print(f"{name:52s} {(times[1]-times[0])/(N2-N1)*1e6:10.1f} us",
          flush=True)


key = jax.random.PRNGKey(0)
payload = jax.random.normal(key, (NGEOM, C, B))

for K in (28, 92):
    idx = jnp.asarray(np.random.randint(0, NGEOM, (K, B)), jnp.int32)

    def onehot(c, p, s):
        s2 = jnp.clip(s + jnp.int32(c * 0), 0, NGEOM - 1)
        oh = (s2[:, None, :] == jnp.arange(NGEOM)[None, :, None]
              ).astype(p.dtype)
        return jnp.sum(jnp.einsum("kgB,gcB->kcB", oh, p), axis=(0, 1))

    def tala(c, p, s):
        s2 = jnp.clip(s + jnp.int32(c * 0), 0, NGEOM - 1)
        out = jnp.take_along_axis(p, s2[:, None, :], axis=0)
        return jnp.sum(out, axis=(0, 1))

    def vm(c, p, s):
        s2 = jnp.clip(s + jnp.int32(c * 0), 0, NGEOM - 1)
        out = jax.vmap(lambda pp, ss: pp[ss], in_axes=(-1, -1),
                       out_axes=-1)(p, s2)
        return jnp.sum(out, axis=(0, 1))

    bench(f"one-hot einsum K={K}", onehot, payload, idx)
    bench(f"take_along_axis K={K}", tala, payload, idx)
    bench(f"vmap gather K={K}", vm, payload, idx)
