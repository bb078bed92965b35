"""Oracle test for adhesion actuators (body transmission via contacts)."""

import pytest

pytestmark = pytest.mark.slow
import mujoco
import numpy as np

import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj

_XML = """
<mujoco>
  <option timestep="0.0005" cone="elliptic"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1" friction="1"/>
    <body name="pad" pos="0 0 0.1">
      <freejoint/>
      <geom name="pad" type="sphere" size=".1" mass="0.2"
            margin="0.002" gap="0.002" friction=".8"/>
    </body>
  </worldbody>
  <actuator>
    <adhesion name="stick" body="pad" ctrlrange="0 1" gain="3"/>
  </actuator>
</mujoco>
"""


def test_adhesion_matches_mujoco():
    mj_model = mujoco.MjModel.from_xml_string(_XML)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    mjd = mujoco.MjData(mj_model)
    # sphere resting in the gap zone: contact exists, no normal force
    mjd.qpos[2] = 0.1005
    mjd.ctrl[0] = 0.7
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, ctrl=mjd.ctrl)
    d = F.forward(model, d)

    # the adhesion moment is applied implicitly (actuation.adhesion_qfrc);
    # qfrc_actuator covers moment x force exactly
    du = io_mj.unbatch(d)
    np.testing.assert_allclose(du.actuator_force, mjd.actuator_force,
                               atol=1e-9)
    np.testing.assert_allclose(du.qfrc_actuator, mjd.qfrc_actuator,
                               atol=1e-9)
    # adhesion pulls the sphere DOWN toward the floor
    assert float(du.qfrc_actuator[2]) < -1e-3
