"""Rodent/humanoid task suite + mocap tracking tests.

Covers the functional re-design of the reference rodent suite
(reference vnl_ray/tasks/basic_rodent_2020.py, rodent_tasks_modified.py,
tracking_old.py, tracking_rewards.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- rewards

def test_bounded_quat_dist_matches_reference_form():
    from flybody_tpu.tasks.tracking_rewards import bounded_quat_dist

    # identical quats -> 0; orthogonal quats -> pi/4 (bounded metric)
    q = np.array([1.0, 0, 0, 0])
    r = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])  # 90 deg
    assert abs(float(bounded_quat_dist(q, q)[0])) < 1e-6
    d = float(bounded_quat_dist(q, r)[0])
    # reference rewards.py:136-158: .5 * arccos(2*<s,t>^2 - 1)
    expected = 0.5 * np.arccos(2 * np.cos(np.pi / 4) ** 2 - 1)
    assert abs(d - expected) < 1e-6
    # antipodal quats are the same rotation -> 0
    assert abs(float(bounded_quat_dist(q, -q)[0])) < 1e-3


def test_comic_reward_composition():
    from flybody_tpu.tasks import tracking_rewards as tr

    feats = dict(
        center_of_mass=jnp.zeros(3), joints_velocity=jnp.zeros(5),
        appendages=jnp.zeros((4, 3)),
        body_quaternions=jnp.tile(jnp.array([1.0, 0, 0, 0]), (6, 1)))
    # identical features -> multi_term = 4 (rodent tuning, unit weights)
    r, ch = tr.multi_term_pose_reward_fn(feats, feats, tuning="rodent")
    assert abs(float(r) - 4.0) < 1e-6
    assert set(ch) == {"appendages", "body_quaternions", "center_of_mass",
                       "joints_velocity"}
    # fly tuning weights sum to 1.9... no: 0.15+0.65+1+0.1 = 1.9
    r2, _ = tr.multi_term_pose_reward_fn(feats, feats, tuning="fly")
    assert abs(float(r2) - 1.9) < 1e-6
    # comic: 0.5*term/5 + 0.5*multi  (reference tracking_rewards.py:86-179)
    rc, chc = tr.comic_reward_fn(
        termination_error=jnp.asarray(0.0),
        termination_error_threshold=0.3,
        walker_features=feats, reference_features=feats, tuning="rodent")
    assert abs(float(rc) - (0.5 * 1.0 / 5.0 + 0.5 * 4.0)) < 1e-6
    assert "termination" in chc
    # channel registry matches emitted channels
    assert set(tr.get_reward_channels("comic")) == set(chc)


# ---------------------------------------------------------------- tracking

@pytest.fixture(scope="module")
def tracking_env():
    from flybody_tpu.rodent_envs import rodent_walk_imitation
    return rodent_walk_imitation(time_limit=1.0)


@pytest.mark.slow
def test_rodent_tracking_reset_step(tracking_env):
    env = tracking_env
    B = 2
    states = env.reset(jax.random.split(jax.random.PRNGKey(0), B))
    # reference observation set (tracking_old.py:570-732)
    for key in ("ref_rel_joints", "ref_rel_bodies_pos_local",
                "ref_rel_root_quat", "ref_ego_bodies_quats",
                "ref_appendages_pos", "clip_id"):
        assert key in states.obs, key
    # at episode start on a matching clip frame, reference previews are
    # small (walker initialized to the clip pose)
    assert float(jnp.abs(states.obs["ref_rel_joints"]).max()) < 2.0
    step = jax.jit(env.autoreset_step)
    a = jnp.zeros((B, env.action_size))
    states = step(states, a)
    r = np.asarray(states.reward)
    assert np.isfinite(r).all()
    # comic reward of a near-tracking pose is high (close to max 2.1)
    assert (r > 0.2).all()


@pytest.mark.slow
def test_tracking_termination_on_divergence(tracking_env):
    env = tracking_env
    states = env.reset(jax.random.split(jax.random.PRNGKey(1), 1))
    # teleport the walker far from the reference -> termination error
    # exceeds threshold -> fatal termination with discount 0
    data = states.data
    qpos = data.qpos.at[0].add(10.0)  # 10 m away in x
    states = states.replace(data=data.replace(qpos=qpos))
    states = jax.jit(env.step)(states, jnp.zeros((1, env.action_size)))
    assert bool(states.done[0])
    assert float(states.discount[0]) == 0.0


@pytest.mark.slow
def test_synthetic_clip_features_consistent(tracking_env):
    task = tracking_env.task
    clips = task.clips
    f = clips.fields
    N, T = f["qpos"].shape[:2]
    assert f["body_positions"].shape[:2] == (N, T)
    assert f["body_quaternions"].shape[-1] == 4
    # root quaternions normalized
    n = np.linalg.norm(np.asarray(f["quaternion"]), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-3)


# ------------------------------------------------------------- RL tasks

@pytest.mark.slow
def test_run_gaps_env():
    from flybody_tpu.rodent_envs import rodent_run_gaps
    env = rodent_run_gaps(time_limit=0.5)
    states = env.reset(jax.random.split(jax.random.PRNGKey(0), 2))
    assert "origin" in states.obs and "task_logic" in states.obs
    step = jax.jit(env.autoreset_step)
    for _ in range(3):
        states = step(states, jnp.zeros((2, env.action_size)))
    assert np.isfinite(np.asarray(states.reward)).all()
    # standing still at spawn: xvel ~ 0 -> reward ~ 0, not done yet
    assert (np.asarray(states.reward) < 0.5).all()


def test_escape_reward_math():
    """Escape reward formula on synthetic values (no model build):
    reference rodent_tasks_modified.py:111-151."""
    from flybody_tpu.utils import rewards as rw

    terrain_size = 20.0
    # head 1 m from origin -> escape = 1 - (20-1)/20 = 0.05 (linear margin)
    esc = float(rw.tolerance(jnp.asarray(1.0),
                             bounds=(terrain_size, float("inf")),
                             margin=terrain_size, sigmoid="linear",
                             value_at_margin=0.0))
    assert abs(esc - 0.05) < 1e-6


@pytest.mark.slow
def test_two_touch_state_machine():
    from flybody_tpu.rodent_envs import rodent_two_touch
    env = rodent_two_touch(time_limit=0.5)
    states = env.reset(jax.random.split(jax.random.PRNGKey(0), 2))
    assert states.obs["task_logic"].shape == (2, 1)
    assert states.obs["target_pos"].shape == (2, 3)
    states = jax.jit(env.autoreset_step)(
        states, jnp.zeros((2, env.action_size)))
    r = np.asarray(states.reward)
    # aliveness 0.1 + small closeness shaping, no touch reward yet
    assert (r >= 0.1).all() and (r < 1.0).all()


def test_maze_arena_layout():
    from flybody_tpu.tasks.rodent_arenas import random_maze
    arena = random_maze(seed=3)
    assert arena.hfield_data is not None
    assert arena.spawn_positions.shape[-1] == 2
    assert len(arena.target_positions) >= 3
    # spawn and target cells are open (height 0 in the wall field)
    nrow, ncol = arena.hfield_data.shape
    hx, hy = arena.size
    for xy in np.concatenate([arena.spawn_positions,
                              arena.target_positions]):
        col = int((xy[0] / hx / 2 + 0.5) * ncol)
        row = int((xy[1] / hy / 2 + 0.5) * nrow)
        assert arena.hfield_data[row, col] == 0.0, (xy, row, col)


def test_bowl_arena_shape():
    from flybody_tpu.tasks.rodent_arenas import terrain_bowl
    data = terrain_bowl(nrow=101, size=20.0, elevation_z=1.0)
    assert data.shape == (101, 101)
    # center flat (inside the tanh rim), rim raised
    assert data[50, 50] < 0.05
    assert data[:5, :].max() > 0.3


@pytest.mark.slow
def test_rodent_egocentric_camera_and_visnet():
    """Rodent vision stack (reference vis_net.py VisNetRodent :112-202 +
    the walker/egocentric_camera the rodent tasks consume): the two-touch
    env with use_vision=True emits a raycast egocentric camera image and
    the vision-mode networks consume it end-to-end."""
    from flybody_tpu.rodent_envs import rodent_two_touch
    from flybody_tpu.agents.networks import (VisionPolicy, VisNetRodent,
                                             batch_concat, obs_layout)

    env = rodent_two_touch(use_vision=True)
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
    img = state.obs["egocentric_camera"]
    assert img.shape == (2, 32, 32)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(jnp.max(img)) <= 255.0 and float(jnp.min(img)) >= 0.0
    # image must not be constant (scene structure visible)
    assert float(jnp.std(img)) > 1.0

    # VisNetRodent consumes the camera inside the vision policy
    keys, slices = obs_layout(state.obs)
    flat = batch_concat(state.obs, keys, num_batch_dims=1)
    policy = VisionPolicy(action_size=env.action_size,
                          eye_slices=(slices["egocentric_camera"],))
    params = policy.init(jax.random.PRNGKey(1), flat)
    dist = policy.apply(params, flat)
    assert dist.mean.shape == (2, env.action_size)
    assert bool(jnp.all(jnp.isfinite(dist.mean)))

    feat = VisNetRodent().apply(
        VisNetRodent().init(jax.random.PRNGKey(2), img), img)
    assert feat.shape == (2, 8)


@pytest.mark.slow
def test_walk_humanoid_env():
    """CMU humanoid mocap-tracking env (reference walk_humanoid,
    basic_rodent_2020.py:279-363): builds, resets, steps with random
    actions, observations stay finite."""
    from flybody_tpu.rodent_envs import walk_humanoid

    env = walk_humanoid()
    B = 2
    rng = jax.random.PRNGKey(3)
    state = jax.jit(env.reset)(jax.random.split(rng, B))
    step = jax.jit(env.autoreset_step)
    lo, hi = env.action_spec()
    for _ in range(3):
        rng, k = jax.random.split(rng)
        act = jax.random.uniform(k, (B, env.action_size), minval=lo,
                                 maxval=hi, dtype=jnp.float32)
        state = step(state, act)
    flat = jnp.concatenate([v.reshape(B, -1) for v in state.obs.values()],
                           axis=1)
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert bool(jnp.all(jnp.isfinite(state.reward)))
