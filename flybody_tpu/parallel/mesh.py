"""Device-mesh sharding for the fused actor-learner.

The reference scales by adding CPU actor processes over Ray/gRPC
(SURVEY.md §2.5); the TPU-native axis is a device mesh with envs (and the
replay ring) sharded along 'env' and parameters replicated. Gradients
reduce over ICI via the partitioner's allreduce — no explicit collectives
in user code.

    mesh = make_mesh()                       # all local devices
    shardings = loop_shardings(trainer, mesh, loop_state)
    step = jax.jit(trainer.train_iteration,
                   in_shardings=(shardings,), out_shardings=(shardings, None))
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _shard_leading(mesh: Mesh, tree, axis: str):
    """NamedSharding pytree: shard leaf leading dim over `axis`."""
    def one(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(axis, *((None,) * (x.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree.map(one, tree)


def _shard_trailing(mesh: Mesh, tree, axis: str):
    """NamedSharding pytree: shard leaf TRAILING dim over `axis` (the
    physics engine's env-batch axis, physics/types.py)."""
    def one(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P(*((None,) * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())
    return jax.tree.map(one, tree)


def _shard_env_states(mesh: Mesh, env_states, axis: str):
    """EnvState sharding: batch-trailing leaves (data, task_state) shard
    on the last dim; batch-leading leaves (obs, bookkeeping) on the
    first."""
    from flybody_tpu.envs.core import EnvState

    lead = lambda t: _shard_leading(mesh, t, axis)
    tail = lambda t: _shard_trailing(mesh, t, axis)
    return EnvState(
        data=tail(env_states.data), obs=lead(env_states.obs),
        reward=lead(env_states.reward), done=lead(env_states.done),
        discount=lead(env_states.discount),
        step_idx=lead(env_states.step_idx), rng=lead(env_states.rng),
        task_state=tail(env_states.task_state),
        metrics=lead(env_states.metrics))


def _replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: NamedSharding(mesh, P()), tree)


def loop_shardings(mesh: Mesh, loop_state, axis: str = "env"):
    """Sharding pytree for a train.LoopState: envs + replay sharded over
    the mesh, train state (params/optimizers/duals) replicated."""
    import dataclasses

    from flybody_tpu.agents.train import LoopState

    return LoopState(
        train=_replicate(mesh, loop_state.train),
        env_states=_shard_env_states(mesh, loop_state.env_states, axis),
        replay=dataclasses.replace(
            _replicate(mesh, loop_state.replay),
            storage=_shard_leading(mesh, loop_state.replay.storage, axis)),
        rng=NamedSharding(mesh, P()),
        actor_steps=NamedSharding(mesh, P()),
        # rollout tail leaves are (n-1, B, ...): env batch on axis 1
        rollout_tail=jax.tree.map(
            lambda x: NamedSharding(
                mesh, P(None, axis, *((None,) * (x.ndim - 2))))
            if hasattr(x, "ndim") and x.ndim >= 2
            else NamedSharding(mesh, P()), loop_state.rollout_tail),
    )


def shard_loop_state(mesh: Mesh, loop_state, axis: str = "env"):
    """Place an existing LoopState according to loop_shardings."""
    sh = loop_shardings(mesh, loop_state, axis)
    return jax.tree.map(jax.device_put, loop_state, sh)
