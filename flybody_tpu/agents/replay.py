"""On-device replay: a uniform-sampling ring buffer in HBM.

TPU-native replacement for the reference's dm-reverb C++ replay server
(reference vnl_ray/agents/ray_distributed_dmpo.py:85-127): transitions live
in device memory as a fixed-capacity ring; insert is a wrapped scatter,
sampling is a uniform gather — both inside jit. Rate-limiter semantics
(samples_per_insert) become a deterministic insert:update schedule in the
training loop (SURVEY.md §5.8).

Sharding: under pjit, shard the capacity axis over the mesh 'env' axis and
each device owns a replay shard fed by its local envs; the learner batch is
assembled by the partitioner via all-gather (SURVEY.md §2.4 Reverb row).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from flybody_tpu.physics.types import pytree


@pytree(meta=())
class ReplayState:
    storage: Any          # pytree with leading dim = capacity
    insert_pos: jax.Array  # int32
    size: jax.Array        # int32


def replay_init(capacity: int, example: Any) -> ReplayState:
    """Allocate storage shaped like `example` with leading dim capacity."""
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x)[0:], x.dtype)
        if jnp.ndim(x) == 0 else
        jnp.zeros((capacity,) + jnp.shape(x)[1:], x.dtype), example)
    return ReplayState(storage=storage,
                       insert_pos=jnp.zeros((), jnp.int32),
                       size=jnp.zeros((), jnp.int32))


def replay_insert(state: ReplayState, batch: Any) -> ReplayState:
    """Insert a batch (leading dim K) at the ring position."""
    k = jax.tree.leaves(batch)[0].shape[0]
    capacity = jax.tree.leaves(state.storage)[0].shape[0]
    idx = (state.insert_pos + jnp.arange(k)) % capacity
    storage = jax.tree.map(lambda s, b: s.at[idx].set(b),
                           state.storage, batch)
    return ReplayState(
        storage=storage,
        insert_pos=(state.insert_pos + k) % capacity,
        size=jnp.minimum(state.size + k, capacity))


def replay_sample(state: ReplayState, key, batch_size: int) -> Any:
    """Uniform sample of `batch_size` items (with replacement)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(state.size, 1))
    return jax.tree.map(lambda s: s[idx], state.storage)
