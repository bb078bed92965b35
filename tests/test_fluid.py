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


@pytest.mark.parametrize("coef", [
    (1, 0, 0, 0, 0),     # blunt drag
    (0, 1, 0, 0, 0),     # slender drag (incl. rotational part)
    (0, 0, 1, 0, 0),     # angular drag
    (0, 0, 0, 1, 0),     # kutta lift
    (0, 0, 0, 0, 1),     # magnus
    (0, 0, 0, 0, 0),     # added mass alone (always active)
    (0.5, 0.25, 1.5, 1.0, 1.0),   # all defaults combined
    (1.0, 0.5, 1.5, 1.7, 1.0),    # the fly's wing fluidcoef
])
def test_ellipsoid_fluid_offaxis_exact(coef):
    """Every fluid term is ORACLE-EXACT off-axis (round 4: forms
    identified numerically via tools/derive_fluid.py — MuJoCo projected
    area pi*sqrt(den/num), norm-combined rotational drag, Kirchhoff
    added-mass terms)."""
    mj_model, model = _ellipsoid_model(coef, viscosity=0.003)
    rng = np.random.RandomState(3)
    for _ in range(4):
        qvel = np.concatenate([rng.randn(3) * 2.0, rng.randn(3) * 3.0])
        ours, theirs = _passive(mj_model, model, qvel)
        np.testing.assert_allclose(ours, theirs, atol=1e-12, rtol=1e-6)
