"""Multi-task generalist trainer (agents/multitask.py): two fly tasks,
per-task replay tables, round-robin learner — one jit program (reference
train_dmpo_ray.py actors_envs topology)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.agents.multitask import (MultiTaskDMPOTrainer,
                                          multitask_shardings)
from flybody_tpu.agents.train import TrainerConfig


@pytest.fixture(scope="module")
def trainer():
    from flybody_tpu.fly_envs import walk_imitation, walk_on_ball
    envs = {"walk_on_ball": walk_on_ball(time_limit=0.05),
            "walk_imitation": walk_imitation(time_limit=0.05)}
    cfg = TrainerConfig(
        unroll_length=4, replay_capacity=2048, min_replay_size=8,
        samples_per_insert=4.0,
        dmpo=DMPOConfig(batch_size=16, n_step=2))
    return MultiTaskDMPOTrainer(envs, {"walk_on_ball": 4,
                                       "walk_imitation": 4}, cfg)


def test_multitask_obs_union_and_action_space(trainer):
    # both fly tasks share the 59-dim action space; obs sizes differ and
    # pad to the union
    assert trainer.action_size == 59
    assert len(set(trainer.obs_sizes.values())) == 2
    assert trainer.obs_size == max(trainer.obs_sizes.values())


def test_multitask_train_iteration(trainer):
    loop = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_iteration)
    for _ in range(2):
        loop, metrics = step(loop)
    # both tasks rolled out and inserted
    for k in trainer.names:
        assert int(loop.replays[k].size) > 0
        assert np.isfinite(float(metrics[f"{k}/mean_reward"]))
    # learner took round-robin steps over both tables
    assert int(loop.train.steps) == 2 * trainer.updates_per_table * 2
    assert np.isfinite(float(metrics["critic_loss"]))


def test_multitask_sharding_compiles(trainer):
    """8-device mesh: per-task env/replay shards + replicated params
    compile and execute (same bar as the single-task dryrun)."""
    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from flybody_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(min(4, jax.device_count()))
    loop = trainer.init(jax.random.PRNGKey(1))
    sh = multitask_shardings(mesh, loop)
    loop = jax.tree.map(jax.device_put, loop, sh)
    step = jax.jit(trainer.train_iteration,
                   in_shardings=(sh,), out_shardings=(sh, None))
    loop, metrics = step(loop)
    assert np.isfinite(float(metrics["mean_reward"]))
