"""Microbenchmarks: batch-major (B, n, k) vs batch-minor (n, k, B) layouts."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e6:10.1f} us", flush=True)
    return out


B = 4096
key = jax.random.PRNGKey(0)

x1 = jax.random.normal(key, (B, 69, 3))
x2 = jax.random.normal(key, (69, 3, B))
x3 = jax.random.normal(key, (B, 207))

f = jax.jit(lambda x: x * 2.0 + jnp.sin(x))
t("elemwise (B,69,3)", f, x1)
t("elemwise (69,3,B)", f, x2)
t("elemwise (B,207)", f, x3)

t("cross (B,69,3) axis-1", jax.jit(lambda a, b: jnp.cross(a, b, axis=-1)), x1, x1 + 1)
t("cross (69,3,B) axis 1", jax.jit(lambda a, b: jnp.cross(a, b, axis=1)), x2, x2 + 1)

M1 = jax.random.normal(key, (B, 105, 105))
v1 = jax.random.normal(key, (B, 105))
M2 = jnp.transpose(M1, (1, 2, 0))
v2 = jnp.transpose(v1, (1, 0))
t("matvec einsum Bij,Bj->Bi", jax.jit(lambda M, v: jnp.einsum("Bij,Bj->Bi", M, v)), M1, v1)
t("matvec einsum ijB,jB->iB", jax.jit(lambda M, v: jnp.einsum("ijB,jB->iB", M, v)), M2, v2)

parent = np.random.randint(0, 69, (69,))
t("gather (B,69,3)[:,parent]", jax.jit(lambda x: x[:, parent, :]), x1)
t("gather (69,3,B)[parent]", jax.jit(lambda x: x[parent]), x2)

P = jax.random.normal(key, (105, 8, B))
P1 = jnp.transpose(P, (2, 0, 1))
t("rank-8 update ijB (105,8,B)", jax.jit(lambda M, P: M - jnp.einsum("ikB,jkB->ijB", P, P)), M2, P)
t("rank-8 update Bij (B,105,8)", jax.jit(lambda M, P: M - jnp.einsum("Bik,Bjk->Bij", P, P)), M1, P1)

J2 = jax.random.normal(key, (230, 105, B))
t("matmat einsum ijB,jkB->ikB (230x105x105)",
  jax.jit(lambda J, M: jnp.einsum("ijB,jkB->ikB", J, M)), J2, M2, iters=5)
