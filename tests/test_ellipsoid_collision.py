"""Ellipsoid pairs route through the gated exact-convex narrowphase
(physics/ccd.py) end-to-end: model build -> fwd_position -> collision ->
selected Contact rows. Distances are exact (support minimization), so
tolerances here are tight — unlike the round-1 scaled-space
approximation these replaced."""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj

_XML = """
<mujoco>
  <option cone="elliptic" gravity="0 0 0"/>
  <worldbody>
    <body name="ell" pos="0 0 1">
      <freejoint/>
      <geom type="ellipsoid" size=".1 .12 .09" mass="1"/>
    </body>
    <body name="cap" pos="0 0 1.3">
      <freejoint/>
      <geom type="capsule" size=".05" fromto="-.1 0 0 .1 0 0" mass=".5"/>
    </body>
    <body name="sph" pos="0.4 0 1">
      <freejoint/>
      <geom type="sphere" size=".06" mass=".2"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def setup():
    mj_model = mujoco.MjModel.from_xml_string(_XML)
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _dist_for(model, d, g1, g2):
    """Contact dist of the (g1, g2) pair from the selected rows (the pair
    is ccd-routed: its global slot id is ncon_max + ccd index)."""
    cg1 = np.asarray(model.ccd_geom1)
    cg2 = np.asarray(model.ccd_geom2)
    slot = None
    for k in range(model.nccd):
        if {int(cg1[k]), int(cg2[k])} == {g1, g2}:
            slot = model.ncon_max + k
            break
    assert slot is not None, (cg1, cg2)
    sel = np.asarray(d.contact.sel[:, 0])
    rows = np.nonzero(sel == slot)[0]
    assert len(rows), f"slot {slot} not selected (sel={sel.tolist()})"
    return float(d.contact.dist[rows[0], 0])


def test_pairs_are_ccd_routed(setup):
    _, model = setup
    # ell-cap, ell-sph, cap-sph: cap-sph stays analytic
    assert model.nccd == 2
    assert model.ncon_max == 1
    assert model.ccd_budget == 2


@pytest.mark.parametrize("cap_z,expect_sign", [(1.20, 1), (1.10, -1)])
def test_capsule_ellipsoid_distance_sign(setup, cap_z, expect_sign):
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    mjd.qpos[9] = cap_z          # capsule z (second freejoint)
    mujoco.mj_forward(mj_model, mjd)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos)
    d = F.fwd_position(model, d)
    # geom ids by definition order: 0 ell, 1 cap, 2 sph
    dist = _dist_for(model, d, 1, 0)
    # capsule (axis along x) bottom at z - 0.05, ellipsoid top at 1.09
    expected = (cap_z - 0.05) - 1.09
    assert np.sign(dist) == expect_sign
    assert abs(dist - expected) < 1e-6, (dist, expected)


def test_sphere_ellipsoid_distance(setup):
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mjd)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = F.fwd_position(model, d)
    dist = _dist_for(model, d, 0, 2)
    # sphere at x=0.4, ellipsoid +x semi-axis 0.1, sphere r 0.06
    assert abs(dist - (0.4 - 0.1 - 0.06)) < 1e-9, dist
