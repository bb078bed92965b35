"""Oracle test for adhesion actuators (body transmission via contacts)."""

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
    d = d.replace(qpos=jnp.asarray(mjd.qpos), ctrl=jnp.asarray(mjd.ctrl))
    d = F.forward(model, d)

    # mujoco 3.x stores actuator_moment sparse; densify for comparison
    dense = np.zeros((mj_model.nu, mj_model.nv))
    mujoco.mju_sparse2dense(dense, mjd.actuator_moment.reshape(-1),
                            mjd.moment_rownnz, mjd.moment_rowadr,
                            mjd.moment_colind.reshape(-1))
    np.testing.assert_allclose(d.actuator_moment, dense, atol=1e-9)
    np.testing.assert_allclose(d.actuator_force, mjd.actuator_force,
                               atol=1e-9)
    np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator,
                               atol=1e-9)
    # adhesion pulls the sphere DOWN toward the floor
    assert float(d.qfrc_actuator[2]) < -1e-3
