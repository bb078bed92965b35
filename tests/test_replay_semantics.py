"""Replay + rate-limiter semantics vs the reference's Reverb contract
(reference vnl_ray/agents/ray_distributed_dmpo.py:85-127: uniform
sampler, FIFO remover, SampleToInsertRatio rate limiter with
min_size_to_sample; re-expressed here as a deterministic
inserts:updates schedule — SURVEY.md §5.8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flybody_tpu.agents import replay as rp


def test_ring_wraps_fifo():
    """Overwrite-oldest (Reverb FIFO remover): after capacity overflow
    the ring holds exactly the newest `capacity` items."""
    cap = 8
    ex = {"x": jnp.zeros((1,), jnp.int32)}
    state = rp.replay_init(cap, ex)
    for start in range(0, 12, 3):
        batch = {"x": jnp.arange(start, start + 3, dtype=jnp.int32)}
        state = rp.replay_insert(state, batch)
    assert int(state.size) == cap
    held = set(np.asarray(state.storage["x"]).tolist())
    assert held == set(range(4, 12))   # items 0..3 evicted


def test_sample_uniform_over_filled_prefix():
    """Sampling never reads unwritten slots and covers the filled prefix
    roughly uniformly (Reverb uniform sampler)."""
    cap = 64
    ex = {"x": jnp.zeros((1,), jnp.int32)}
    state = rp.replay_init(cap, ex)
    state = rp.replay_insert(state, {"x": jnp.arange(10, 26,
                                                     dtype=jnp.int32)})
    assert int(state.size) == 16
    out = rp.replay_sample(state, jax.random.PRNGKey(0), 4096)["x"]
    vals = np.asarray(out)
    assert vals.min() >= 10 and vals.max() < 26
    counts = np.bincount(vals - 10, minlength=16)
    # with replacement, 4096 draws over 16 bins: each ~256 +- 5 sigma
    assert counts.min() > 256 - 5 * 16 and counts.max() < 256 + 5 * 16


@pytest.mark.parametrize("num_envs,unroll,spi,batch", [
    (32, 20, 32.0, 256),     # reference defaults ratio
    (4, 6, 2.0, 8),          # test-scale config
    (8, 10, 0.5, 64),        # sub-1 SPI floors at one update
])
def test_samples_per_insert_schedule(num_envs, unroll, spi, batch):
    """The deterministic schedule realizes Reverb's SampleToInsertRatio
    setpoint: cumulative sampled/inserted -> spi (when representable;
    floored at one update per iteration otherwise)."""
    inserted_per_iter = num_envs * unroll
    updates = max(1, int(inserted_per_iter * spi // batch))
    inserted = sampled = 0
    for _ in range(100):
        inserted += inserted_per_iter
        sampled += updates * batch
    ratio = sampled / inserted
    target = max(spi, batch / inserted_per_iter)
    # within one batch granularity of the setpoint
    assert abs(ratio - target) <= batch / inserted_per_iter, (ratio, target)


@pytest.mark.slow
def test_min_replay_size_gates_learning():
    """No learner updates run before min_replay_size transitions exist
    (Reverb rate-limiter min_size_to_sample), then updates start."""
    from flybody_tpu.agents.dmpo import DMPOConfig
    from flybody_tpu.agents.train import DMPOTrainer, TrainerConfig
    from flybody_tpu.fly_envs import template_task

    env = template_task(time_limit=0.02)
    cfg = TrainerConfig(
        num_envs=2, unroll_length=4, replay_capacity=256,
        min_replay_size=20,        # needs 3 iterations of 8 inserts
        samples_per_insert=1.0,
        dmpo=DMPOConfig(batch_size=4, n_step=2, num_samples=3))
    trainer = DMPOTrainer(env, cfg)
    loop = trainer.init(jax.random.PRNGKey(0))
    step = jax.jit(trainer.train_iteration)
    steps = []
    for _ in range(4):
        loop, metrics = step(loop)
        steps.append(float(np.asarray(metrics["learner_steps"])))
    assert steps[0] == 0.0 and steps[1] == 0.0   # 8, 16 < 20
    assert steps[-1] > 0.0                        # >= 24 transitions
