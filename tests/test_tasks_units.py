"""Fast unit tests: tolerance rewards, WBPG, trajectory datasets,
DeepMimic features, IK on a toy model."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flybody_tpu.utils import rewards as rwu


def test_tolerance_matches_dm_control():
    from dm_control.utils import rewards as dmr
    xs = np.linspace(-3, 3, 41)
    for sigmoid in ("linear", "gaussian", "quadratic", "long_tail"):
        ours = np.array([float(rwu.tolerance(
            jnp.asarray(x), bounds=(-0.5, 0.5), margin=1.0,
            sigmoid=sigmoid, value_at_margin=0.1)) for x in xs])
        theirs = np.array([dmr.tolerance(
            x, bounds=(-0.5, 0.5), margin=1.0, sigmoid=sigmoid,
            value_at_margin=0.1) for x in xs])
        np.testing.assert_allclose(ours, theirs, atol=1e-6, err_msg=sigmoid)


def test_wbpg_phase_continuity():
    from flybody_tpu.tasks.pattern_generators import WingBeatPatternGenerator
    wbpg = WingBeatPatternGenerator(num_freqs=11)
    angles, qvel, state = wbpg.reset(initial_phase=0.3)
    assert angles.shape == (6,)
    # stepping at constant base freq follows the same sequence
    prev = angles
    step = jax.jit(wbpg.step)
    max_jump = 0.0
    for _ in range(50):
        angles, state = step(state, jnp.asarray(218.0))
        max_jump = max(max_jump, float(jnp.max(jnp.abs(angles - prev))))
        prev = angles
    # wing angles are continuous (no teleports) at dt=2e-4, 218 Hz
    assert max_jump < 0.5, max_jump
    # frequency switch stays phase-continuous
    angles2, state = step(state, jnp.asarray(228.0))
    assert float(jnp.max(jnp.abs(angles2 - prev))) < 0.5


def test_synthetic_walking_dataset_shapes():
    from flybody_tpu.io.trajectories import synthetic_walking_dataset
    qpos0 = np.zeros(7 + 10, np.float32)
    qpos0[3] = 1.0
    ds = synthetic_walking_dataset(qpos0, n_joints=10, n_sites=4,
                                   num_traj=3, length=50)
    assert ds.num_trajectories == 3
    assert ds.fields["qpos"].shape == (3, 50, 17)
    assert ds.fields["qvel"].shape == (3, 50, 16)
    assert ds.fields["root2site"].shape == (3, 50, 4, 3)
    assert int(ds.lengths[0]) == 50


def test_deep_mimic_reward_peaks_at_reference():
    from flybody_tpu.tasks import rewards as rw
    feats = {
        "com": jnp.asarray([0.1, 0.2, 0.3]),
        "qvel": jnp.zeros(5),
        "root2site": jnp.asarray([[0.1, 0.0, 0.0]]),
        "joint_quat": jnp.asarray([[1.0, 0, 0, 0]]),
    }
    factors = rw.reward_factors_deep_mimic(feats, feats)
    np.testing.assert_allclose(factors, [1, 1, 1, 1], atol=1e-6)
    far = dict(feats, com=feats["com"] + 1.0)
    factors2 = rw.reward_factors_deep_mimic(far, feats)
    assert float(factors2[0]) < 1e-8


def test_ik_converges_on_toy_arm():
    from flybody_tpu.inverse_kinematics import qpos_from_site_xpos
    from flybody_tpu.physics import io_mj
    from flybody_tpu.physics import kinematics as K
    xml = """
    <mujoco><worldbody>
      <body name="a" pos="0 0 1">
        <joint name="j1" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size=".04" fromto="0 0 0 .5 0 0" mass=".1"/>
        <body name="b" pos=".5 0 0">
          <joint name="j2" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size=".04" fromto="0 0 0 .5 0 0" mass=".1"/>
          <site name="tip" pos=".5 0 0"/>
        </body>
      </body>
    </worldbody></mujoco>"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    data = io_mj.make_data(model, dtype=jnp.float64)
    # target: tip at a reachable point
    target = jnp.asarray([[0.7, 0.0, 1.3]])
    res = qpos_from_site_xpos(model, data, site_ids=np.array([0]),
                              target_xpos=target,
                              dof_qposadr=np.array([0, 1]),
                              lr=0.01, beta=0.9, max_steps=3000)
    d = K.kinematics(model, data.replace(qpos=res.qpos))
    err = float(jnp.linalg.norm(d.site_xpos[0, :, 0] - target[0]))
    assert err < 1e-3, err


def test_intention_network_shapes():
    from flybody_tpu.agents.intention_networks import IntentionPolicy
    net = IntentionPolicy(action_size=12, task_obs_size=20,
                          intention_size=8, encoder_layers=(32,),
                          decoder_layers=(32,))
    obs = jnp.zeros((4, 50))
    params = net.init(jax.random.PRNGKey(0), obs)
    dist, intention = net.apply(params, obs,
                                method=net.with_intention)
    assert dist.mean.shape == (4, 12)
    assert intention.mean.shape == (4, 8)


def test_raycast_eye_sees_terrain():
    from flybody_tpu.ops import raycast
    import numpy as np
    hdata = jnp.asarray(np.ones((32, 32), np.float32))
    hsize = jnp.asarray([5.0, 5.0, 1.0, 0.1])
    hfn = raycast.hfield_height_fn(hdata, hsize, jnp.zeros(3))
    rays = raycast.camera_rays(120.0, 16, 16)
    cam_pos = jnp.asarray([0.0, 0.0, 2.0])
    # camera looking straight down (-z forward = world -z)
    cam_mat = jnp.eye(3)
    img = raycast.render_eye(cam_pos, cam_mat, rays, hfn)
    assert img.shape == (16, 16)
    assert float(img.mean()) > 50.0  # terrain visible
