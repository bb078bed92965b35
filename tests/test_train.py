"""End-to-end training smoke tests (tiny configs, CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.agents.dmpo import DMPOConfig
from flybody_tpu.agents.train import DMPOTrainer, TrainerConfig
from flybody_tpu.fly_envs import walk_on_ball


@pytest.fixture(scope="module")
def trainer_and_loop():
    env = walk_on_ball(time_limit=0.05)
    cfg = TrainerConfig(
        num_envs=4, unroll_length=7, replay_capacity=256,
        min_replay_size=8, samples_per_insert=2.0,
        dmpo=DMPOConfig(batch_size=8, n_step=5, num_samples=4))
    trainer = DMPOTrainer(env, cfg)
    loop = trainer.init(jax.random.PRNGKey(0))
    return trainer, loop


def test_train_iteration_runs_and_is_finite(trainer_and_loop):
    trainer, loop = trainer_and_loop
    step = jax.jit(trainer.train_iteration)
    for _ in range(2):
        loop, metrics = step(loop)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert int(loop.train.steps) > 0
    assert int(loop.replay.size) > 0


def test_multichip_dryrun():
    """The driver's multi-chip validation: full fused train step over an
    8-device mesh (requires the conftest's virtual CPU devices)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_checkpoint_roundtrip(tmp_path, trainer_and_loop):
    trainer, loop = trainer_and_loop
    from flybody_tpu.io import checkpoint as ckpt
    path = ckpt.save(str(tmp_path / "ck"), loop.train, step=1)
    restored = ckpt.restore(path, loop.train)
    a = jax.tree.leaves(loop.train.policy_params)[0]
    b = jax.tree.leaves(restored.policy_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluator_runs(trainer_and_loop):
    trainer, loop = trainer_and_loop
    from flybody_tpu.agents.evaluator import make_evaluator
    ev = make_evaluator(trainer.env, trainer.policy.apply,
                        eval_average_over=2)
    stats = ev(loop.train.policy_params, jax.random.PRNGKey(0))
    assert np.isfinite(float(stats["eval_episode_return_mean"]))
