"""STAC conversion + playback rendering tests (reference
trajectory_rodent.py:174-249, render_stac.py:23-92)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_stac_conversion_roundtrip(tmp_path):
    from flybody_tpu.io.stac import convert_stac, write_stac_fixture

    src = str(tmp_path / "stac.h5")
    dst = str(tmp_path / "clips.h5")
    write_stac_fixture(src, num_clips=2, length=30, nj=67)
    n = convert_stac(src, dst, joint_names=["j%d" % i for i in range(67)])
    assert n == 2

    import h5py
    with h5py.File(dst, "r") as f:
        keys = [k for k in f.keys()
                if k not in ("id2name", "timestep_seconds",
                             "trajectory_lengths")]
        assert len(keys) == 2
        q = np.asarray(f[keys[0]]["qpos"])
        assert q.shape == (30, 3 + 4 + 67)
        # qpos = [pos, quat, joints]: quat normalized, x advances
        np.testing.assert_allclose(
            np.linalg.norm(q[:, 3:7], axis=-1), 1.0, atol=1e-6)
        assert q[-1, 0] > q[0, 0]
        assert float(f["timestep_seconds"][()]) == 0.02
        assert list(f["trajectory_lengths"][()]) == [30, 30]


@pytest.mark.slow
def test_stac_clips_load_into_tracking(tmp_path):
    """Converted STAC clips drive the rodent tracking env end to end."""
    from flybody_tpu.io.stac import convert_stac, write_stac_fixture
    from flybody_tpu.rodent_envs import rodent_walk_imitation

    src = str(tmp_path / "stac.h5")
    dst = str(tmp_path / "clips.h5")
    write_stac_fixture(src, num_clips=2, length=40, nj=67)
    convert_stac(src, dst)
    env = rodent_walk_imitation(ref_path=dst, time_limit=0.5)
    assert env.task.clips.num_clips == 2
    states = env.reset(jax.random.split(jax.random.PRNGKey(0), 1))
    states = jax.jit(env.step)(states,
                               jnp.zeros((1, env.action_size)))
    assert np.isfinite(np.asarray(states.reward)).all()


@pytest.mark.slow
def test_playback_render_frames():
    """The native rasterizer renders playback frames (round-1 weak #8:
    render path untested)."""
    from render_stac import playback_frames
    from flybody_tpu.rodent_envs import rodent_walk_imitation

    env = rodent_walk_imitation(time_limit=0.5)
    qpos = np.asarray(env.task.clips.fields["qpos"])[0]
    frames = playback_frames(env, qpos, n_steps=3, width=64, height=48)
    assert len(frames) == 3
    f = np.asarray(frames)
    assert f.shape == (3, 48, 64, 3) and f.dtype == np.uint8
    # scene visible: not a constant image
    assert f.std() > 1.0


@pytest.mark.slow
def test_render_with_rewards_overlay():
    """Reward-decomposition overlay rendering (reference
    utils.py render_with_rewards :139-244): frames widen by the plot
    strip and reward channels are recorded per step."""
    import numpy as np
    from flybody_tpu.fly_envs import walk_on_ball
    from flybody_tpu.utils.rendering import render_with_rewards
    import jax

    env = walk_on_ball()
    lo, hi = env.action_spec()
    mid = ((lo + hi) / 2).astype("float32")

    frames = render_with_rewards(
        env, lambda obs: mid[None], jax.random.PRNGKey(0), n_steps=3,
        width=96, height=72)
    assert len(frames) == 3
    assert frames[0].shape == (72, 2 * 96, 3)
    assert frames[0].dtype == np.uint8
