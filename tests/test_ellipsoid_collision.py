"""Sanity tests for the approximate ellipsoid narrowphase (direction and
sign correctness vs the MuJoCo oracle; magnitudes are approximate)."""

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
    old = io_mj.ELLIPSOID_ASPECT_LIMIT
    io_mj.ELLIPSOID_ASPECT_LIMIT = 4.0  # enable ellipsoid self pairs
    try:
        model = io_mj.put_model(mj_model, dtype=jnp.float64)
    finally:
        io_mj.ELLIPSOID_ASPECT_LIMIT = old
    return mj_model, model


def _slot_geoms(model):
    """Static per-slot geom ids from the model pair tables."""
    from flybody_tpu.physics.io_mj import _PAIR_NCON
    pg1 = np.asarray(model.pair_geom1)
    pg2 = np.asarray(model.pair_geom2)
    pt = np.asarray(model.pair_type)
    g1s, g2s = [], []
    for k in range(len(pg1)):
        n = _PAIR_NCON[(int(pt[k, 0]), int(pt[k, 1]))]
        g1s += [int(pg1[k])] * n
        g2s += [int(pg2[k])] * n
    return np.array(g1s), np.array(g2s)


def _dist_for(model, d, g1, g2):
    cg1, cg2 = _slot_geoms(model)
    slot = None
    for k in range(model.ncon_max):
        if {int(cg1[k]), int(cg2[k])} == {g1, g2}:
            slot = k
            break
    if slot is None:
        raise AssertionError(
            f"pair not found: {list(zip(cg1.tolist(), cg2.tolist()))}")
    # contact now holds only the selected islands; locate the slot there
    sel = np.asarray(d.contact.sel[:, 0])
    rows = np.nonzero(sel == slot)[0]
    assert len(rows), f"slot {slot} not selected (sel={sel.tolist()})"
    return float(d.contact.dist[rows[0], 0])


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
    # capsule bottom at z - 0.05, ellipsoid top at 1.09
    expected = (cap_z - 0.05) - 1.09
    assert np.sign(dist) == expect_sign
    assert abs(dist - expected) < 0.02, (dist, expected)


def test_sphere_ellipsoid_distance(setup):
    mj_model, model = setup
    mjd = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mjd)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = F.fwd_position(model, d)
    dist = _dist_for(model, d, 0, 2)
    # sphere at x=0.4, ellipsoid +x semi-axis 0.1, sphere r 0.06
    assert abs(dist - (0.4 - 0.1 - 0.06)) < 0.01, dist
