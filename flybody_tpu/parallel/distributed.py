"""Multi-host distributed runtime (jax.distributed + global device mesh).

The reference scales by adding Ray actor processes over gRPC — 400 CPU
actors feeding one GPU learner (reference train_dmpo_ray.py:436-533).
The TPU-native scaling axis is SPMD over a MULTI-HOST device mesh: every
host runs the same fused actor-learner program; envs and replay shard
over the global 'env' axis (each host computes its local env shard),
params replicate, and the learner's gradient allreduce rides ICI within
a slice and DCN across slices — all inserted by the partitioner
(SURVEY.md §5.8; jax-ml.github.io/scaling-book recipe).

Usage (per host):

    from flybody_tpu.parallel import distributed as dist
    dist.init(coordinator, num_processes, process_id)   # no-op if single
    mesh = dist.global_mesh()
    loop = dist.shard_loop_state_global(trainer, mesh, rng)
    step = jax.jit(trainer.train_iteration, ...)

CPU dry-run (no TPU pod needed): tools/scaling_dryrun.py launches N
local processes with K virtual CPU devices each and drives one fused
train step over the N*K-device global mesh through this module.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR etc.).
    Returns True when running multi-process. Safe to call single-host
    (no-op)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR", "")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis: str = "env") -> Mesh:
    """1-D mesh over ALL devices of ALL processes (hosts x chips)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_env_slice(num_envs_global: int) -> tuple[int, int]:
    """(num_local_envs, local_start): this process's contiguous env range
    under even sharding of the global env batch."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    assert num_envs_global % n_proc == 0, \
        f"num_envs {num_envs_global} % processes {n_proc} != 0"
    per = num_envs_global // n_proc
    return per, pid * per


def make_global_loop_state(trainer, mesh: Mesh, rng, axis: str = "env"):
    """Build a globally-sharded LoopState: each process initializes only
    its local env/replay shard; jax assembles the global arrays.

    The train state (params/optimizer/duals) is replicated from process 0's
    values (all processes compute the same init from the same seed)."""
    from flybody_tpu.parallel.mesh import loop_shardings

    local_loop = trainer.init(rng)
    shardings = loop_shardings(mesh, local_loop, axis)

    def to_global(x, sh):
        if not hasattr(x, "ndim"):
            return x
        arr = np.asarray(jax.device_get(x))
        if sh.spec == P():
            # replicated: same on every process
            return jax.make_array_from_process_local_data(sh, arr)
        # sharded: this process's block is its local slice; global shape
        # scales the sharded dim by process count
        spec = sh.spec
        gshape = list(arr.shape)
        for dim, name in enumerate(spec):
            if name == axis:
                gshape[dim] = arr.shape[dim] * jax.process_count()
        return jax.make_array_from_process_local_data(
            sh, arr, global_shape=tuple(gshape))

    return jax.tree.map(to_global, local_loop, shardings,
                        is_leaf=lambda x: hasattr(x, "ndim")), shardings


def host_allreduce_metrics(metrics: dict) -> dict:
    """Mean-reduce host-side scalar metrics across processes (the
    reference's counter aggregation; cheap DCN allreduce via a tiny jit)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    mesh = global_mesh()
    keys = sorted(metrics.keys())
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    local = np.tile(local[None], (len(jax.local_devices()), 1))
    sh = NamedSharding(mesh, P("env", None))
    x = jax.make_array_from_process_local_data(sh, local)
    mean = jax.jit(lambda v: v.mean(axis=0),
                   out_shardings=NamedSharding(mesh, P()))(x)
    vals = np.asarray(jax.device_get(mean))
    return dict(zip(keys, map(float, vals)))
