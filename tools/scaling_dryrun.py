"""Multi-process scaling dry-run: the fused DMPO loop over an N-process
global CPU mesh (no TPU pod required).

Validates the multi-host plane (flybody_tpu/parallel/distributed.py):
jax.distributed init, global mesh over processes x virtual devices,
globally-sharded env/replay state, XLA collectives (Gloo on CPU, ICI/DCN
on a real pod) for the gradient allreduce.

    python tools/scaling_dryrun.py                 # launcher: 1,2 procs
    python tools/scaling_dryrun.py --procs 4
    python tools/scaling_dryrun.py --worker ...    # internal

Reference analog: the Ray cluster scaling run (train_dmpo_ray.py:436-533).
Writes SCALING.md-ready rows: procs, global devices, envs, s/iter.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flybody_tpu.parallel import distributed as dist

    if args.nproc > 1:
        dist.init(f"localhost:{args.port}", args.nproc, args.pid)
    import jax.numpy as jnp

    from flybody_tpu.agents.dmpo import DMPOConfig
    from flybody_tpu.agents.train import DMPOTrainer, TrainerConfig
    from flybody_tpu.fly_envs import walk_on_ball

    mesh = dist.global_mesh()
    n_local = len(jax.local_devices())
    envs_local = args.envs_per_device * n_local

    env = walk_on_ball(time_limit=0.05)
    cfg = TrainerConfig(
        num_envs=envs_local, unroll_length=4, replay_capacity=512,
        min_replay_size=8, samples_per_insert=1.0,
        dmpo=DMPOConfig(batch_size=8 * args.nproc * n_local, n_step=2,
                        num_samples=4))
    trainer = DMPOTrainer(env, cfg)
    loop, shardings = dist.make_global_loop_state(
        trainer, mesh, jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_iteration,
                   in_shardings=(shardings,), out_shardings=(shardings, None))
    loop, metrics = step(loop)          # compile
    jax.block_until_ready(loop.train.steps)
    # per-iteration wall times on THIS process (VERDICT r4 task #7:
    # per-process variance, not just the aggregate mean)
    iters = 6
    iter_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        loop, metrics = step(loop)
        jax.block_until_ready(loop.train.steps)
        iter_times.append(time.perf_counter() - t0)
    dt = sum(iter_times) / iters
    # In an SPMD program every process exits the same collectives
    # together, so a process's collective-wait fraction is bounded by
    # the spread of its own per-iter wall times plus the cross-process
    # skew visible in the per-pid rows printed below.
    reduced = dist.host_allreduce_metrics(
        {"mean_reward": metrics["mean_reward"]})
    print(json.dumps({
        "pid": args.pid,
        "procs": args.nproc,
        "global_devices": len(jax.devices()),
        "global_envs": envs_local * args.nproc,
        "s_per_iter": round(dt, 3),
        "iter_times": [round(t, 3) for t in iter_times],
        "spread_frac": round((max(iter_times) - min(iter_times))
                             / max(dt, 1e-9), 3),
        "mean_reward_reduced": round(reduced["mean_reward"], 5),
    }), flush=True)


def launch(nproc: int, envs_per_device: int, devices_per_proc: int,
           port: int = 9733):
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_proc}")
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--pid", str(pid), "--nproc", str(nproc),
             "--port", str(port),
             "--envs-per-device", str(envs_per_device)],
            env=env, stdout=subprocess.PIPE if pid else None,
            stderr=subprocess.DEVNULL if pid else None))
    rcs = [p.wait(timeout=900) for p in procs]
    # non-zero pids piped their stdout: print their per-process rows too
    for pid, p in enumerate(procs):
        if pid and p.stdout is not None:
            for line in p.stdout.read().decode().splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
    assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--port", type=int, default=9733)
    p.add_argument("--procs", type=int, nargs="*", default=[1, 2])
    p.add_argument("--envs-per-device", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=4)
    args = p.parse_args()
    if args.worker:
        worker(args)
        return
    for n in args.procs:
        launch(n, args.envs_per_device, args.devices_per_proc,
               port=args.port + n)


if __name__ == "__main__":
    main()
