"""Oracle tests for smooth dynamics: mass matrix, bias, passive, actuation,
and contact-free trajectory rollouts vs MuJoCo."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.physics import kinematics as K
from flybody_tpu.physics import smooth as S
from flybody_tpu.physics import passive as P
from flybody_tpu.physics import actuation as A

# Contact-free articulated model with springs, dampers, armature, tendon,
# position + filter + velocity actuators, in a viscous medium.
_XML = """
<mujoco>
  <option timestep="0.0005" density="1.2" viscosity="0.0002"/>
  <worldbody>
    <body name="b1" pos="0 0 1">
      <freejoint/>
      <geom type="box" size=".1 .2 .3" mass="2"/>
      <body name="b2" pos="0 0 0.5" quat="0.9 0.3 0.2 0.1">
        <joint name="h1" type="hinge" axis="0 1 0" ref="0.2" pos=".05 0 0"
               stiffness="3" springref="0.4" damping="0.2" armature="0.01"/>
        <geom type="capsule" size=".05" fromto="0 0 0 0 0 .4" mass="1"/>
        <body name="b3" pos="0 .1 0.4">
          <joint name="h2" type="hinge" axis="1 0 0" damping="0.05"/>
          <geom type="sphere" size=".08" mass="0.5"/>
        </body>
      </body>
    </body>
    <body name="pend" pos="1 0 1">
      <joint name="h3" type="hinge" axis="0 0 1" armature="0.002"/>
      <geom type="capsule" size=".04" fromto="0 0 0 .3 0 0" mass=".2"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1" stiffness="1.5" damping="0.02" springlength="0.1">
      <joint joint="h1" coef="1"/>
      <joint joint="h2" coef="-0.5"/>
    </fixed>
  </tendon>
  <actuator>
    <general name="a1" joint="h1" gainprm="2" biastype="affine"
             biasprm="0 -2 0" ctrlrange="-1 1" ctrllimited="true"/>
    <general name="a2" joint="h2" dyntype="filter" dynprm="0.01"
             gainprm="1.5" biastype="affine" biasprm="0 -1.5 0"/>
    <general name="a3" tendon="t1" gainprm="0.7"/>
  </actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def setup():
    mj_model = mujoco.MjModel.from_xml_string(_XML)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _rand(mj_model, seed, ctrl_scale=0.5):
    rng = np.random.RandomState(seed)
    mjd = mujoco.MjData(mj_model)
    mjd.qpos[:] = mj_model.qpos0 + 0.2 * rng.randn(mj_model.nq)
    mjd.qpos[3:7] /= np.linalg.norm(mjd.qpos[3:7])
    mjd.qvel[:] = 0.4 * rng.randn(mj_model.nv)
    mjd.ctrl[:] = ctrl_scale * rng.randn(mj_model.nu)
    if mj_model.na:
        mjd.act[:] = 0.1 * rng.randn(mj_model.na)
    return mjd


def _put_state(model, mjd):
    d = io_mj.make_data(model, dtype=jnp.float64)
    return io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel,
                           ctrl=mjd.ctrl, act=mjd.act)


@pytest.mark.parametrize("seed", [0, 1])
def test_smooth_pipeline_matches_mujoco(setup, seed):
    mj_model, model = setup
    mjd = _rand(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)

    d = _put_state(model, mjd)
    d = F.fwd_position(model, d)
    d = F.fwd_velocity(model, d)
    d = F.fwd_actuation(model, d)
    d = F.fwd_acceleration(model, d)

    # mass matrix (compressed tree-sparse; densify for comparison)
    Mfull = np.zeros((mj_model.nv, mj_model.nv))
    mujoco.mj_fullM(mj_model, mjd, Mfull)
    qM = np.asarray(io_mj.qm_dense(model, d))[..., 0]
    np.testing.assert_allclose(qM, Mfull, atol=1e-8)
    d = io_mj.unbatch(d)

    # velocity products
    np.testing.assert_allclose(d.cvel, mjd.cvel, atol=1e-8)
    np.testing.assert_allclose(d.cdof_dot, mjd.cdof_dot, atol=1e-8)
    np.testing.assert_allclose(d.qfrc_bias, mjd.qfrc_bias, atol=1e-8)

    # passive: springs + dampers + tendon + box fluid
    np.testing.assert_allclose(d.qfrc_passive, mjd.qfrc_passive, atol=1e-8)

    # actuation
    np.testing.assert_allclose(d.actuator_length, mjd.actuator_length,
                               atol=1e-10)
    np.testing.assert_allclose(d.actuator_velocity, mjd.actuator_velocity,
                               atol=1e-10)
    np.testing.assert_allclose(d.act_dot, mjd.act_dot, atol=1e-10)
    np.testing.assert_allclose(d.actuator_force, mjd.actuator_force,
                               atol=1e-10)
    np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator,
                               atol=1e-10)

    # smooth acceleration (no contacts in this model)
    np.testing.assert_allclose(d.qacc_smooth, mjd.qacc_smooth, atol=1e-7)


def test_rollout_matches_mujoco(setup):
    """200-substep contact-free rollout under random ctrl: trajectories
    should track MuJoCo tightly (f64, same integrator semantics)."""
    mj_model, model = setup
    mjd = _rand(mj_model, 7, ctrl_scale=0.3)
    d = _put_state(model, mjd)

    step = jax.jit(F.step)
    rng = np.random.RandomState(11)
    for t in range(200):
        ctrl = 0.3 * np.sin(0.01 * t * np.arange(mj_model.nu)) \
            + 0.05 * rng.randn(mj_model.nu)
        mjd.ctrl[:] = ctrl
        d = io_mj.set_state(d, ctrl=ctrl)
        mujoco.mj_step(mj_model, mjd)
        d = step(model, d)

    du = io_mj.unbatch(d)
    np.testing.assert_allclose(du.qpos, mjd.qpos, atol=1e-5)
    np.testing.assert_allclose(du.qvel, mjd.qvel, atol=1e-4)
    if mj_model.na:
        np.testing.assert_allclose(du.act, mjd.act, atol=1e-6)
