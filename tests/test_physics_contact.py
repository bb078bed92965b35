"""Oracle tests for contacts + constraint solver vs MuJoCo (elliptic cone)."""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj

_XML = """
<mujoco>
  <option timestep="0.002" cone="elliptic"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1" friction="1 .005 .0001"/>
    <body name="ball" pos="0 0 0.25">
      <freejoint/>
      <geom type="sphere" size=".1" mass="0.5" friction=".8"/>
    </body>
    <body name="caps" pos="0.5 0 0.15" quat="0.92 0 0.38 0">
      <freejoint/>
      <geom type="capsule" size=".05" fromto="-.15 0 0 .15 0 0" mass="0.3"
            friction=".6"/>
    </body>
    <body name="box" pos="-0.6 0 0.3">
      <freejoint/>
      <geom type="box" size=".1 .08 .06" mass="0.4" friction=".5"/>
    </body>
    <body name="arm" pos="1.5 0 0.12">
      <joint name="hinge" type="hinge" axis="0 1 0" range="-.7 .7"
             damping="0.05"/>
      <geom type="capsule" size=".04" fromto="0 0 0 .4 0 0" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def setup():
    mj_model = mujoco.MjModel.from_xml_string(_XML)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def test_forward_contact_forces(setup):
    """Static scene with penetrating contacts: qacc should match MuJoCo."""
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    # realistic slight penetration (typical in-simulation contact depth)
    mjd.qpos[:] = mj_model.qpos0
    mjd.qpos[2] -= 0.1505  # ball 0.5 mm into floor
    mjd.qvel[0] = 0.3      # sliding -> friction
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)
    d = jax.jit(F.forward)(model, d)
    d = io_mj.unbatch(d)

    err = np.abs(np.asarray(d.qacc) - mjd.qacc)
    scale = np.maximum(np.abs(mjd.qacc), 1.0)
    # production solver runs 6 fixed Newton iterations; a few percent on
    # low-magnitude dofs is the expected accuracy/throughput tradeoff
    assert np.max(err / scale) < 0.08, (
        f"qacc mismatch: ours={np.asarray(d.qacc)[:8]} mj={mjd.qacc[:8]}")


def test_drop_and_settle_matches_mujoco(setup):
    """Bodies dropped on the floor settle to the same resting state."""
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    mujoco.mj_resetData(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    step = jax.jit(F.step)
    for _ in range(250):
        mujoco.mj_step(mj_model, mjd)
        d = step(model, d)

    # resting heights match to sub-mm
    ours = np.asarray(d.qpos)[..., 0]
    theirs = mjd.qpos
    # compare heights of the three free bodies
    for z_idx in (2, 9, 16):
        assert abs(ours[z_idx] - theirs[z_idx]) < 2e-3, (
            f"qpos[{z_idx}]: ours {ours[z_idx]:.5f} vs mj {theirs[z_idx]:.5f}")
    # velocities near zero
    assert np.max(np.abs(np.asarray(d.qvel))) < 0.1


def test_joint_limit_matches_mujoco(setup):
    """Hinge driven into its limit: constrained acceleration matches."""
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    mjd.qpos[:] = mj_model.qpos0
    # arm rotated up past its lower limit (contact-free, pure limit row)
    adr = mj_model.jnt_qposadr[mj_model.joint("hinge").id]
    mjd.qpos[adr] = -0.705
    mjd.qvel[mj_model.jnt_dofadr[mj_model.joint("hinge").id]] = -1.0
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)
    d = F.forward(model, d)
    dof = mj_model.jnt_dofadr[mj_model.joint("hinge").id]
    ours = float(d.qacc[dof, 0])
    theirs = float(mjd.qacc[dof])
    assert abs(ours - theirs) / max(abs(theirs), 1.0) < 5e-3, (ours, theirs)
