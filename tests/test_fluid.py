"""Oracle tests for fluid models: inertia-box and per-term ellipsoid."""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj


def _ellipsoid_model(coef, density=1.0, viscosity=0.0):
    xml = f"""
    <mujoco>
      <option density="{density}" viscosity="{viscosity}" gravity="0 0 0"/>
      <worldbody><body pos="0 0 1"><freejoint/>
        <geom type="ellipsoid" size="0.1 0.3 0.05" mass="1"
              fluidshape="ellipsoid"
              fluidcoef="{' '.join(str(c) for c in coef)}"/>
      </body></worldbody>
    </mujoco>"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    return mj_model, io_mj.put_model(mj_model, dtype=jnp.float64)


def _passive(mj_model, model, qvel):
    mjd = mujoco.MjData(mj_model)
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mjd)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qvel=qvel)
    d = F.fwd_position(model, d)
    d = F.fwd_velocity(model, d)
    return np.asarray(d.qfrc_passive)[..., 0], mjd.qfrc_passive.copy()


@pytest.mark.parametrize("coef,qvel", [
    # viscous only
    ((0, 0, 0, 0, 0), [2, 0, 0, 0, 0, 0]),
    ((0, 0, 0, 0, 0), [0, 0, 0, 3, 0, 0]),
    # blunt drag along each axis
    ((1, 0, 0, 0, 0), [2, 0, 0, 0, 0, 0]),
    ((1, 0, 0, 0, 0), [0, 2, 0, 0, 0, 0]),
    ((1, 0, 0, 0, 0), [0, 0, 2, 0, 0, 0]),
    # slender drag
    ((0, 1, 0, 0, 0), [2, 0, 0, 0, 0, 0]),
    ((0, 1, 0, 0, 0), [0, 2, 0, 0, 0, 0]),
    # angular drag (per-axis)
    ((0, 0, 1, 0, 0), [0, 0, 0, 3, 0, 0]),
    ((0, 0, 1, 0, 0), [0, 0, 0, 0, 3, 0]),
    ((0, 0, 1, 0, 0), [0, 0, 0, 0, 0, 3]),
    # magnus for all (v, w) axis pairs
    ((0, 0, 0, 0, 1), [2, 0, 0, 0, 3, 0]),
    ((0, 0, 0, 0, 1), [0, 2, 0, 3, 0, 0]),
    ((0, 0, 0, 0, 1), [0, 0, 2, 0, 3, 0]),
])
def test_ellipsoid_fluid_terms(coef, qvel):
    visc = 0.01 if coef == (0, 0, 0, 0, 0) else 0.0
    mj_model, model = _ellipsoid_model(coef, viscosity=visc)
    ours, theirs = _passive(mj_model, model, np.asarray(qvel, float))
    np.testing.assert_allclose(ours, theirs, atol=1e-10, rtol=1e-6)


def test_offaxis_blunt_drag_is_reasonable():
    """Off-axis blunt drag: MuJoCo integrates pressure over the surface
    (adds drag torque); our axis-exact form is approximate off-axis."""
    mj_model, model = _ellipsoid_model((1, 0, 0, 0, 0))
    ours, theirs = _passive(mj_model, model, np.asarray(
        [1.0, 1, 1, 0, 0, 0]))
    ratio = np.linalg.norm(ours[:3]) / np.linalg.norm(theirs[:3])
    assert 0.5 < ratio < 1.5, ratio
    # direction matches (pure drag, anti-parallel to v)
    cos = np.dot(ours[:3], theirs[:3]) / (
        np.linalg.norm(ours[:3]) * np.linalg.norm(theirs[:3]))
    assert cos > 0.99


def test_kutta_lift_is_reasonable():
    """Kutta is approximate: direction must match, magnitude within 2x."""
    mj_model, model = _ellipsoid_model((0, 0, 0, 1, 0))
    qvel = np.zeros(6)
    qvel[0] = 2.0
    qvel[2] = 2.0
    ours, theirs = _passive(mj_model, model, qvel)
    f_o, f_t = ours[:3], theirs[:3]
    # perpendicular to v, same orientation
    cos = np.dot(f_o, f_t) / (np.linalg.norm(f_o) * np.linalg.norm(f_t))
    assert cos > 0.99, (f_o, f_t)
    ratio = np.linalg.norm(f_o) / np.linalg.norm(f_t)
    assert 0.5 < ratio < 2.0, ratio
