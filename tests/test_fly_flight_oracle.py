"""FLIGHT-configuration full-fly lockstep oracle vs MuJoCo C.

The walking-config oracle (tests/test_fly_model.py) never exercises the
assembled flight fly: free root + wings + ellipsoid wing fluid + dt 5e-5
(reference vnl_ray/tasks/constants.py:22-23, base.py:264-330). This test
builds exactly the flight_imitation morphology (wing stiffness/damping/
gain, wing fluidcoef [1.0, 0.5, 1.5, 1.7, 1.0]) and checks per-substep
velocity parity along a real MuJoCo trajectory with beating wings.
"""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics import constraint as Cn
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.tasks import constants as C

ORACLE_ITERS = 200


@pytest.fixture(scope="module")
def flight_fly():
    wp = C.WING_PARAMS
    cfg = ff.FlyConfig(
        use_legs=False, use_wings=True, use_mouth=False,
        use_antennae=False, joint_filter=0.0002, root_joint="free",
        body_pitch_angle=C.BODY_PITCH_ANGLE,
        physics_timestep=C.FLY_PHYSICS_TIMESTEP,
        num_user_actions=0, wing_fluid=True)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    wing_jnames = [f"wing_{ax}_{side}" for side in ("left", "right")
                   for ax in ("yaw", "roll", "pitch")]
    for b in morph.bodies:
        for j in b.joints:
            if j.name in wing_jnames:
                j.stiffness = wp["stiffness"]
                j.damping = wp["damping"]
        for g in b.geoms:
            if g.fluidshape:
                g.fluidcoef = wp["fluidcoef"]
    for a in morph.actuators:
        if a.name.startswith("wing_"):
            a.gainprm = a.gainprm.copy()
            a.gainprm[0] = wp["gainprm"][0]
    spec = ff.to_spec(morph, cfg, arena_fn=None)
    mj_model = spec.compile()
    # converged-narrowphase oracle (see tests/test_fly_model.py)
    mj_model.opt.ccd_tolerance = 1e-12
    mj_model.opt.ccd_iterations = 500
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _converged_substep(model):
    def fn(m, dd):
        dd = F.fwd_position(m, dd)
        dd = F.fwd_velocity(m, dd)
        efc = Cn.make_efc(m, dd)
        dd = F.fwd_actuation(m, dd, efc=efc)
        dd = F.fwd_acceleration(m, dd)
        dd = Cn.solve(m, dd, iterations=ORACLE_ITERS, efc=efc)
        dd = F.euler(m, dd)
        return dd
    return jax.jit(fn)


def test_flight_structure(flight_fly):
    """Wings + fluid present: free root, 6 wing dofs, fluid-active wing
    geoms with the Flying-base fluidcoef."""
    mj_model, model = flight_fly
    assert mj_model.nv >= 12  # free root (6) + wings (6) + head etc.
    fluid_geoms = np.nonzero(np.asarray(model.geom_fluid_active))[0]
    assert len(fluid_geoms) >= 2
    fl = np.asarray(model.geom_fluid)[fluid_geoms]
    np.testing.assert_allclose(fl[:, 1:6],
                               np.tile(C.WING_PARAMS["fluidcoef"],
                                       (len(fluid_geoms), 1)))
    assert float(mj_model.opt.timestep) == C.FLY_PHYSICS_TIMESTEP


def test_flight_smooth_forces_exact(flight_fly):
    """Smooth pipeline (incl. wing fluid) exact at random flying states."""
    mj_model, model = flight_fly
    mjd = mujoco.MjData(mj_model)
    for trial in range(3):
        rng = np.random.RandomState(trial)
        mujoco.mj_resetData(mj_model, mjd)
        mjd.qpos[:] = mj_model.qpos0
        mjd.qpos[2] += 1.0                       # airborne
        mjd.qpos[7:] += 0.05 * rng.randn(mj_model.nq - 7)
        mjd.qvel[:] = rng.randn(mj_model.nv)
        mjd.qvel[:3] = 20.0 * rng.randn(3)       # body airspeed (cm/s)
        # beating wings: large angular rates on the wing dofs
        mjd.qvel[6:12] = 300.0 * rng.randn(6)
        mjd.ctrl[:] = np.clip(0.1 * rng.randn(mj_model.nu), -0.3, 0.3)
        mujoco.mj_forward(mj_model, mjd)

        d = io_mj.make_data(model, dtype=jnp.float64)
        d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel,
                            ctrl=mjd.ctrl, act=mjd.act)
        d = F.fwd_position(model, d)
        d = F.fwd_velocity(model, d)
        du = io_mj.unbatch(d)
        np.testing.assert_allclose(du.qfrc_passive, mjd.qfrc_passive,
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(du.qfrc_bias, mjd.qfrc_bias,
                                   rtol=1e-6, atol=1e-8)


def test_flight_lockstep_substep_parity(flight_fly):
    """Per-substep velocity parity along a MuJoCo trajectory with driven
    wing beats at dt 5e-5 (M-norm, same bar family as the walking
    lockstep oracle)."""
    mj_model, model = flight_fly
    mjd = mujoco.MjData(mj_model)
    mjd.qpos[2] += 1.0
    rng = np.random.RandomState(2)
    step = _converged_substep(model)
    M = np.zeros((mj_model.nv, mj_model.nv))
    errs = []
    freq = C.WING_PARAMS["base_freq"]
    wing_act = np.array([i for i in range(mj_model.nu)
                         if "wing" in (mujoco.mj_id2name(
                             mj_model, mujoco.mjtObj.mjOBJ_ACTUATOR, i)
                             or "")])
    base = np.clip(0.05 * rng.randn(mj_model.nu), -0.2, 0.2)
    for i in range(80):
        # sinusoidal wing drive at the natural beat frequency
        ctrl = base.copy()
        if len(wing_act):
            ctrl[wing_act] = 0.6 * np.sin(
                2 * np.pi * freq * i * C.FLY_PHYSICS_TIMESTEP)
        mjd.ctrl[:] = ctrl
        qpos, qvel, act = mjd.qpos.copy(), mjd.qvel.copy(), mjd.act.copy()
        mujoco.mj_step(mj_model, mjd)
        if i % 8 == 0:
            d = io_mj.make_data(model, dtype=jnp.float64)
            d = io_mj.set_state(d, qpos=qpos, qvel=qvel, ctrl=ctrl,
                                act=act)
            d = step(model, d)
            du = io_mj.unbatch(d)
            mujoco.mj_fullM(mj_model, mjd, M)
            diff = np.asarray(du.qvel) - mjd.qvel
            errs.append(np.sqrt(diff @ M @ diff)
                        / (np.sqrt(mjd.qvel @ M @ mjd.qvel) + 1e-12))
    errs = np.asarray(errs)
    # Round 5: with manifold multiplicity (ccd.manifold_nu), exact
    # support-set-centered witnesses, and the summed pair margin rule,
    # the whole trajectory is near-machine-exact (measured profile:
    # median 2e-6, max 2.8e-4 on the initial contact transient; wing-
    # beat substeps ~1e-16). Round-4 bar was max < 0.25.
    assert np.median(errs) < 1e-3, errs
    assert errs.max() < 5e-3, errs
