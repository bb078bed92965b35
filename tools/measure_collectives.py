"""Measure the multi-chip communication volume of the fused train step.

Compiles the sharded train_iteration on an N-device mesh (virtual CPU
devices stand in for chips — the partitioner inserts the SAME collectives
it would on a TPU slice) and walks the optimized HLO for collective ops,
reporting per-iteration all-reduce / all-gather / reduce-scatter byte
volumes. Combined with the single-chip step time from bench.py and the
published per-link ICI bandwidth this yields a measured, not asserted,
scaling-efficiency model (SCALING.md).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/measure_collectives.py
"""

import json
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
               "u32": 4, "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _op_bytes(line: str) -> int:
    """Total output bytes of the op defined on this HLO line (sums the
    result shapes between '=' and the op's open paren, handling tuple
    outputs)."""
    rhs = line.split("=", 1)[-1]
    lhs = rhs.split("(", 1)[0]        # "<shapes> <op-name>"
    total = 0
    for m in SHAPE_RE.finditer(lhs):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    num_envs = int(os.environ.get("NUM_ENVS", 64))
    batch = int(os.environ.get("BATCH", 256))

    from flybody_tpu.agents.dmpo import DMPOConfig
    from flybody_tpu.agents.train import DMPOTrainer, TrainerConfig
    from flybody_tpu.fly_envs import walk_on_ball
    from flybody_tpu.parallel.mesh import (loop_shardings, make_mesh,
                                           shard_loop_state)

    env = walk_on_ball()
    cfg = TrainerConfig(num_envs=num_envs, unroll_length=10,
                        replay_capacity=20000, min_replay_size=256,
                        samples_per_insert=4.0,
                        dmpo=DMPOConfig(batch_size=batch, n_step=5))
    tr = DMPOTrainer(env, cfg)
    loop = tr.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    loop = shard_loop_state(mesh, loop)
    sh = loop_shardings(mesh, loop)
    lowered = jax.jit(tr.train_iteration, in_shardings=(sh,),
                      out_shardings=(sh, None)).lower(loop)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    counts = {}
    for line in hlo.splitlines():
        s = line.strip()
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            # match the op as the instruction kind, not inside a name
            if re.search(rf"= *\S+ {op}\(", s) or f" {op}(" in s.split("=")[-1][:40]:
                b = _op_bytes(s)
                k = counts.setdefault(op, [0, 0])
                k[0] += 1
                k[1] += b
                break

    n_dev = jax.device_count()
    print(f"mesh devices: {n_dev}, num_envs={num_envs}, batch={batch}, "
          f"updates/iter={tr.updates_per_iter}")
    total = 0
    for op, (n, b) in sorted(counts.items()):
        print(f"{op:20s} ops={n:4d}  bytes/iter={b/1e6:10.2f} MB")
        total += b
    print(f"{'TOTAL':20s}            bytes/iter={total/1e6:10.2f} MB")

    # simple efficiency model: all-reduce over a ring pays
    # 2(N-1)/N * bytes / per-link-BW; v4 ICI ~ 50 GB/s per direction
    ici_gbps = float(os.environ.get("ICI_GBPS", 50.0))
    t_comm = 2 * (n_dev - 1) / n_dev * total / (ici_gbps * 1e9)
    step_s = float(os.environ.get("STEP_SECONDS", 0.0))
    out = {"devices": n_dev, "collective_bytes_per_iter": total,
           "est_comm_seconds_per_iter": t_comm}
    if step_s > 0:
        out["est_scaling_efficiency"] = step_s / (step_s + t_comm)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
