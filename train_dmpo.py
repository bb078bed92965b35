"""DMPO training entry point (reference train_dmpo_ray.py, TPU-native).

One SPMD program replaces the reference's Ray cluster: envs + replay shard
over the local device mesh, params replicate, the learner's gradients
allreduce over ICI. Usage:

    python train_dmpo.py --task walk_on_ball --num-envs 256 \
        --iterations 1000 --log-every 10 [--test]

`--test` runs a small single-process smoke configuration printing stats
(reference train_dmpo_ray.py --test mode).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the fused train_iteration is a large XLA
# program (~25 min cold through the tunnel); resumed/repeated runs with
# the same shapes start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.agents.train import DMPOTrainer, TrainerConfig
from flybody_tpu.io import checkpoint as ckpt
from flybody_tpu.parallel.mesh import (loop_shardings, make_mesh,
                                       shard_loop_state)
from flybody_tpu.utils.loggers import make_default_logger

TASKS = {
    "walk_on_ball": "flybody_tpu.fly_envs:walk_on_ball",
    "template": "flybody_tpu.fly_envs:template_task",
    "walk_imitation": "flybody_tpu.fly_envs:walk_imitation",
    "flight_imitation": "flybody_tpu.fly_envs:flight_imitation",
    "vision_guided_flight": "flybody_tpu.fly_envs:vision_guided_flight",
    "rodent_escape_bowl": "flybody_tpu.rodent_envs:rodent_escape_bowl",
    "rodent_run_gaps": "flybody_tpu.rodent_envs:rodent_run_gaps",
    "rodent_maze_forage": "flybody_tpu.rodent_envs:rodent_maze_forage",
    "rodent_two_touch": "flybody_tpu.rodent_envs:rodent_two_touch",
    "rodent_walk_imitation":
        "flybody_tpu.rodent_envs:rodent_walk_imitation",
    "walk_humanoid": "flybody_tpu.rodent_envs:walk_humanoid",
}


def make_env(name: str, **kwargs):
    mod_name, fn_name = TASKS[name].split(":")
    import importlib
    return getattr(importlib.import_module(mod_name), fn_name)(**kwargs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="walk_on_ball", choices=sorted(TASKS))
    p.add_argument("--task-envs", default="",
                   help="multi-task mode: 'task:num_envs,task:num_envs' "
                        "(reference generalist configs' actors_envs); "
                        "overrides --task")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--unroll-length", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--replay-capacity", type=int, default=1_000_000)
    p.add_argument("--min-replay-size", type=int, default=10_000)
    p.add_argument("--samples-per-insert", type=float, default=32.0)
    p.add_argument("--n-step", type=int, default=5)
    # learner hyperparameters (reference ray_distributed_dmpo.py:44-82 +
    # config/train_config_*.yaml knob surface)
    p.add_argument("--policy-lr", type=float, default=1e-4)
    p.add_argument("--critic-lr", type=float, default=1e-4)
    p.add_argument("--dual-lr", type=float, default=1e-3)
    p.add_argument("--discount", type=float, default=0.99)
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--target-policy-update-period", type=int, default=101)
    p.add_argument("--target-critic-update-period", type=int, default=107)
    p.add_argument("--clip-global-norm", type=float, default=40.0)
    # network shapes (reference network_factory.py:89-113)
    p.add_argument("--policy-layers", default="256,256,256")
    p.add_argument("--critic-layers", default="512,512,256")
    p.add_argument("--encoder-layers", default="512,512")
    p.add_argument("--decoder-layers", default="512,512,512")
    p.add_argument("--vmin", type=float, default=-150.0)
    p.add_argument("--vmax", type=float, default=150.0)
    p.add_argument("--num-atoms", type=int, default=51)
    p.add_argument("--action-delay", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--ckpt-dir", default="")
    p.add_argument("--ckpt-minutes", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--network", default="plain",
                   choices=("plain", "intention", "vision"),
                   help="network factory mode (reference "
                        "intention_network_factory / vis_net)")
    p.add_argument("--intention-size", type=int, default=60)
    p.add_argument("--high-level-intention-size", type=int, default=0)
    p.add_argument("--intention-kl-weight", type=float, default=0.0)
    p.add_argument("--kickstart-ckpt", default="",
                   help="teacher policy checkpoint for kickstarting")
    p.add_argument("--kickstart-epsilon", type=float, default=0.01)
    p.add_argument("--transfer-ckpt", default="",
                   help="donor checkpoint: restore decoder + freeze "
                        "(reference bowl-transfer config)")
    p.add_argument("--config", default="",
                   help="YAML run config (overrides CLI defaults; "
                        "reference vnl_ray/config/*.yaml)")
    p.add_argument("--test", action="store_true",
                   help="small smoke configuration")
    args = p.parse_args()
    if args.config:
        from flybody_tpu.utils.config import apply_yaml_config
        apply_yaml_config(args, args.config)

    if args.test:
        args.num_envs = max(8, jax.device_count())
        args.unroll_length = 10
        args.batch_size = 32
        args.min_replay_size = 64
        args.replay_capacity = 10_000
        args.iterations = min(args.iterations, 20)
        args.log_every = 1

    def layers(s):
        if isinstance(s, (list, tuple)):
            return tuple(int(x) for x in s)
        return tuple(int(x) for x in str(s).split(",") if str(x).strip())

    # multi-task spec: dict from YAML (task_envs/actors_envs) or
    # "task:n,task:n" from the CLI
    task_envs = args.task_envs
    if isinstance(task_envs, str) and task_envs:
        task_envs = {kv.split(":")[0]: int(kv.split(":")[1])
                     for kv in task_envs.split(",")}
    task_envs = {k: n for k, n in (task_envs or {}).items() if n > 0}
    if args.test and task_envs:
        task_envs = {k: max(8, jax.device_count()) for k in task_envs}

    cfg = TrainerConfig(
        num_envs=args.num_envs, unroll_length=args.unroll_length,
        replay_capacity=args.replay_capacity,
        min_replay_size=args.min_replay_size,
        samples_per_insert=args.samples_per_insert,
        network=args.network,
        intention_size=args.intention_size,
        high_level_intention_size=(args.high_level_intention_size or None),
        freeze_decoder=bool(args.transfer_ckpt),
        policy_layers=layers(args.policy_layers),
        critic_layers=layers(args.critic_layers),
        encoder_layers=layers(args.encoder_layers),
        decoder_layers=layers(args.decoder_layers),
        vmin=args.vmin, vmax=args.vmax, num_atoms=args.num_atoms,
        action_delay=args.action_delay,
        dmpo=DMPOConfig(batch_size=args.batch_size, n_step=args.n_step,
                        discount=args.discount,
                        num_samples=args.num_samples,
                        policy_lr=args.policy_lr, critic_lr=args.critic_lr,
                        dual_lr=args.dual_lr,
                        clip_global_norm=args.clip_global_norm,
                        target_policy_update_period=(
                            args.target_policy_update_period),
                        target_critic_update_period=(
                            args.target_critic_update_period),
                        intention_kl_weight=args.intention_kl_weight))
    if task_envs:
        # multi-task generalist: per-task env shards + per-task replay
        # tables + round-robin learner (reference train_dmpo_ray.py
        # actors_envs topology)
        from flybody_tpu.agents.multitask import (MultiTaskDMPOTrainer,
                                                  multitask_shardings)
        envs = {k: make_env(k) for k in task_envs}
        trainer = MultiTaskDMPOTrainer(envs, task_envs, cfg)
    else:
        env = make_env(args.task)
        trainer = DMPOTrainer(env, cfg)
    if args.kickstart_ckpt:
        teacher = ckpt.restore_policy_params(args.kickstart_ckpt)
        trainer.load_teacher(teacher, args.kickstart_epsilon)
    logger = make_default_logger("learner", save_csv=bool(args.ckpt_dir),
                                 csv_dir=args.ckpt_dir or "logs")

    loop = trainer.init(jax.random.PRNGKey(args.seed))
    if args.transfer_ckpt:
        donor = ckpt.restore_policy_params(args.transfer_ckpt)
        loop = loop.replace(
            train=trainer.restore_decoder(loop.train, donor))
        print(f"transfer: decoder restored from {args.transfer_ckpt} "
              "and frozen")
    mesh = make_mesh()
    if task_envs:
        sh = multitask_shardings(mesh, loop)
        loop = jax.tree.map(jax.device_put, loop, sh)
    else:
        loop = shard_loop_state(mesh, loop)
        sh = loop_shardings(mesh, loop)
    step = jax.jit(trainer.train_iteration,
                   in_shardings=(sh,), out_shardings=(sh, None))

    ckptr = (ckpt.PeriodicCheckpointer(args.ckpt_dir, args.ckpt_minutes)
             if args.ckpt_dir else None)
    # checkpoints carry the LEARNER state only (params/optimizers/duals +
    # step counters) — the reference does not checkpoint Reverb either,
    # and device_get of the replay ring (GBs) through the tunnel costs
    # ~10 min per save. Resume refills replay through the min_replay gate.
    ckpt_view = lambda lp: {"train": lp.train,
                            "actor_steps": lp.actor_steps}
    resume = ckpt.latest(args.ckpt_dir) if args.ckpt_dir else None
    if resume:
        try:
            tpl = jax.device_get(ckpt_view(loop))
            restored = ckpt.restore(resume, tpl)
            same = jax.tree.all(jax.tree.map(
                lambda a, b: jnp.shape(a) == jnp.shape(b), restored, tpl))
            if same:
                loop = loop.replace(train=jax.tree.map(
                    jnp.asarray, restored["train"]),
                    actor_steps=jnp.asarray(restored["actor_steps"]))
                print(f"resumed from {resume}")
            else:
                print(f"WARNING: checkpoint {resume} has different array "
                      "shapes (older model/config); starting fresh")
        except Exception as e:
            print(f"WARNING: checkpoint {resume} does not match the "
                  f"current run structure ({type(e).__name__}); starting "
                  "fresh")

    t0 = time.time()
    steps0 = 0
    for it in range(args.iterations):
        loop, metrics = step(loop)
        if (it + 1) % args.log_every == 0:
            jax.block_until_ready(loop.train.steps)
            actor_steps = int(metrics["actor_steps"])
            dt = time.time() - t0
            sps = (actor_steps - steps0) / max(dt, 1e-9)
            t0, steps0 = time.time(), actor_steps
            critic_loss = float(metrics["critic_loss"])
            logger.write({
                "iteration": it + 1,
                "actor_steps": actor_steps,
                "learner_steps": int(metrics["learner_steps"]),
                "actor_sps": sps,
                "episode_return": float(metrics["mean_episode_return"]),
                "reward": float(metrics["mean_reward"]),
                "critic_loss": critic_loss,
                "dual_temperature": float(metrics["dual_temperature"]),
                "obs_absmax": float(metrics.get("obs_absmax", 0.0)),
            })
            import math
            if (int(metrics["learner_steps"]) > 0
                    and not math.isfinite(critic_loss)):
                print("FATAL: non-finite learner stats; aborting run")
                break
        if ckptr is not None and ckptr.due():
            # device_get only when actually saving, and only the learner
            # state (the replay ring is GBs)
            ckptr.maybe_save(jax.device_get(ckpt_view(loop)), it)
    logger.close()


if __name__ == "__main__":
    main()
