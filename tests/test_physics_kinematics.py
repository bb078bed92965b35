"""Oracle tests: engine kinematics/com stage vs MuJoCo C ground truth."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flybody_tpu.physics import io_mj
from flybody_tpu.physics import kinematics as K

_TEST_XML = """
<mujoco>
  <option timestep="0.001" jacobian="dense"/>
  <worldbody>
    <geom type="plane" size="5 5 .1" contype="0" conaffinity="0"/>
    <body name="b1" pos="0.1 0.2 0.6" quat="0.98 0.1 0.1 0.1">
      <freejoint/>
      <geom type="box" size=".1 .2 .3" mass="2"/>
      <site name="s1" pos=".1 0 .2"/>
      <body name="b2" pos="0 0 0.5" quat="0.9 0.3 0.2 0.1">
        <joint name="h1" type="hinge" axis="0 1 0" ref="0.3" pos=".05 0 0"
               range="-1 1" stiffness="2" springref="0.2" damping="0.1"/>
        <joint name="bb" type="ball"/>
        <geom type="capsule" size=".05" fromto="0 0 0 0 0 .4" mass="1"/>
        <body name="b3" pos="0 .1 0.4">
          <joint name="sl" type="slide" axis="1 0 1" ref="0.1"/>
          <joint name="h2" type="hinge" axis="1 0 0"/>
          <geom type="sphere" size=".08" mass="0.5"/>
          <site name="s3" pos="0 .02 .03" quat="0.9 0.1 0.3 0"/>
        </body>
      </body>
    </body>
    <body name="other" pos="1 0 0.3">
      <joint name="h3" type="hinge" axis="0 0 1"/>
      <geom type="capsule" size=".04" fromto="0 0 0 .3 0 0" mass=".2"/>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1">
      <joint joint="h1" coef="1"/>
      <joint joint="h2" coef="0.5"/>
    </fixed>
  </tendon>
</mujoco>
"""


@pytest.fixture(scope="module")
def setup():
    mj_model = mujoco.MjModel.from_xml_string(_TEST_XML)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _random_state(mj_model, seed):
    rng = np.random.RandomState(seed)
    d = mujoco.MjData(mj_model)
    qpos = mj_model.qpos0 + 0.3 * rng.randn(mj_model.nq)
    # normalize quaternions (free root at 3:7, ball at 8:12 after hinge)
    for j in range(mj_model.njnt):
        t = mj_model.jnt_type[j]
        adr = mj_model.jnt_qposadr[j]
        if t == mujoco.mjtJoint.mjJNT_FREE:
            qpos[adr + 3:adr + 7] /= np.linalg.norm(qpos[adr + 3:adr + 7])
        elif t == mujoco.mjtJoint.mjJNT_BALL:
            qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
    d.qpos[:] = qpos
    d.qvel[:] = 0.5 * rng.randn(mj_model.nv)
    return d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kinematics_matches_mujoco(setup, seed):
    mj_model, model = setup
    mjd = _random_state(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)
    d = jax.jit(K.kinematics, static_argnums=())(model, d)
    d = io_mj.unbatch(d)

    np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-8)
    # quaternion sign is arbitrary: compare via abs dot
    dots = np.abs(np.sum(np.asarray(d.xquat) * mjd.xquat, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.xmat), mjd.xmat.reshape(-1, 3, 3), atol=1e-8)
    np.testing.assert_allclose(d.xanchor, mjd.xanchor, atol=1e-8)
    np.testing.assert_allclose(d.xaxis, mjd.xaxis, atol=1e-8)
    np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.ximat), mjd.ximat.reshape(-1, 3, 3), atol=1e-8)
    np.testing.assert_allclose(d.geom_xpos, mjd.geom_xpos, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.geom_xmat), mjd.geom_xmat.reshape(-1, 3, 3), atol=1e-8)
    np.testing.assert_allclose(d.site_xpos, mjd.site_xpos, atol=1e-8)


@pytest.mark.parametrize("seed", [0, 3])
def test_com_pos_matches_mujoco(setup, seed):
    mj_model, model = setup
    mjd = _random_state(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)
    d = K.kinematics(model, d)
    d = K.com_pos(model, d)
    d = io_mj.unbatch(d)
    np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-8)
    np.testing.assert_allclose(d.cdof, mjd.cdof, atol=1e-8)
    # compact cinert uses MuJoCo's own [I6, mc(3), m] layout: direct compare
    np.testing.assert_allclose(d.cinert, mjd.cinert, atol=1e-8)


def test_tendon_matches_mujoco(setup):
    mj_model, model = setup
    mjd = _random_state(mj_model, 5)
    mujoco.mj_forward(mj_model, mjd)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)
    d = K.kinematics(model, d)
    d = K.tendon(model, d)
    du = io_mj.unbatch(d)
    np.testing.assert_allclose(du.ten_length, mjd.ten_length, atol=1e-12)
    # the engine keeps the fixed-tendon moment implicit (static scatter
    # map, kinematics.ten_moment_apply); reconstruct the dense moment by
    # applying it to unit tendon forces and compare against mujoco ten_J
    vals = np.asarray(mjd.ten_J).reshape(mj_model.ntendon, -1)
    for t in range(mj_model.ntendon):
        unit = jnp.zeros((mj_model.ntendon, 1), jnp.float64).at[t, 0].set(1.0)
        row = np.asarray(K.ten_moment_apply(model, d, unit))[:, 0]
        adr, num = mj_model.tendon_adr[t], mj_model.tendon_num[t]
        jids = mj_model.wrap_objid[adr:adr + num]
        dofs = mj_model.jnt_dofadr[jids]
        np.testing.assert_allclose(row[dofs], vals[t, :num], atol=1e-12)
        mask = np.ones(mj_model.nv, bool)
        mask[dofs] = False
        np.testing.assert_allclose(row[mask], 0.0, atol=1e-12)
