"""Integration oracle test: the full fly model stepped by our engine vs
MuJoCo C, in the walk-on-ball configuration."""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.models import fruitfly as ff
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.tasks import constants as C
from flybody_tpu.tasks.walk_on_ball import ball_arena


@pytest.fixture(scope="module")
def fly_on_ball():
    cfg = ff.FlyConfig(use_legs=True, use_wings=False, root_joint="none",
                       spawn_pos=(0.0, 0.0, 0.1278),
                       physics_timestep=C.WALK_PHYSICS_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    # Ellipsoid/cylinder-vs-convex narrowphase is not implemented yet
    # (pairs are dropped at model build); disable those geoms' contacts in
    # the oracle too so the comparison is like-for-like. TODO(round 2):
    # smooth convex narrowphase, then remove this.
    import mujoco as _mj
    for b in morph.bodies:
        for g in b.geoms:
            if g.gtype in (int(_mj.mjtGeom.mjGEOM_ELLIPSOID),
                           int(_mj.mjtGeom.mjGEOM_CYLINDER)):
                g.contype = 0
                g.conaffinity = 0
    spec = ff.to_spec(morph, cfg, arena_fn=ball_arena())
    mj_model = spec.compile()
    # our engine has no noslip pass yet; compare against the same setting
    mj_model.opt.noslip_iterations = 0
    model = io_mj.put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def test_fly_structure(fly_on_ball):
    mj_model, model = fly_on_ball
    assert mj_model.nbody == 69          # world + 67 fly bodies + ball
    assert mj_model.nu == 59             # walking actuators
    assert mj_model.nv == 105            # 102 fly dofs + 3 ball dofs
    assert mj_model.nsensor == 15
    assert mj_model.na == 59             # filter dynamics everywhere
    total_mg = float(mj_model.body_subtreemass[1]) * 1e3
    assert 0.95 < total_mg < 1.1         # ~1 mg fly


def test_fly_forward_matches_mujoco(fly_on_ball):
    """Single forward call at a perturbed pose: smooth terms must match,
    constrained qacc must be close."""
    mj_model, model = fly_on_ball
    mjd = mujoco.MjData(mj_model)
    rng = np.random.RandomState(0)
    mjd.qpos[:] = mj_model.qpos0 + 0.01 * rng.randn(mj_model.nq)
    mjd.qvel[:] = 0.1 * rng.randn(mj_model.nv)
    mjd.ctrl[:] = np.clip(0.1 * rng.randn(mj_model.nu), -0.3, 0.3)
    mjd.act[:] = 0.05 * rng.randn(mj_model.na)
    # adhesion moments average over the contact set, which can differ by
    # one grazing contact between engines; exercised by its own oracle test
    adh = mj_model.actuator_trntype == mujoco.mjtTrn.mjTRN_BODY
    mjd.ctrl[adh] = 0.0
    mjd.act[mj_model.actuator_actadr[adh]] = 0.0
    mujoco.mj_forward(mj_model, mjd)

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, qpos=mjd.qpos, qvel=mjd.qvel,
                  ctrl=mjd.ctrl, act=mjd.act)
    from flybody_tpu.physics import constraint as Cn
    d = F.fwd_position(model, d)
    d = F.fwd_velocity(model, d)
    d = F.fwd_actuation(model, d)
    d = F.fwd_acceleration(model, d)
    d = Cn.solve(model, d, iterations=40)
    d = io_mj.unbatch(d)

    np.testing.assert_allclose(d.qfrc_bias, mjd.qfrc_bias, atol=1e-8)
    # wing ellipsoid-fluid terms are approximate (TODO round 2: exact
    # MuJoCo ellipsoid model coefficients); box-model terms are exact
    np.testing.assert_allclose(d.qfrc_passive, mjd.qfrc_passive, atol=1e-5)
    np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator,
                               atol=1e-8)
    np.testing.assert_allclose(d.qacc_smooth, mjd.qacc_smooth, rtol=1e-5,
                               atol=1e-4)
    # constrained accelerations: relative agreement on large entries
    err = np.abs(np.asarray(d.qacc) - mjd.qacc)
    scale = np.maximum(np.abs(mjd.qacc), 1e3)
    assert np.max(err / scale) < 0.05, np.max(err / scale)


def test_fly_trajectory_tracks_mujoco(fly_on_ball):
    """100 substeps with held ctrl: joint trajectories stay close."""
    mj_model, model = fly_on_ball
    mjd = mujoco.MjData(mj_model)
    mujoco.mj_resetData(mj_model, mjd)
    rng = np.random.RandomState(1)
    ctrl = np.clip(0.05 * rng.randn(mj_model.nu), -0.2, 0.2)
    mjd.ctrl[:] = ctrl

    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, ctrl=ctrl)
    step = jax.jit(F.step)
    for _ in range(100):
        mujoco.mj_step(mj_model, mjd)
        d = step(model, d)

    assert bool(jnp.all(jnp.isfinite(d.qpos)))
    du = io_mj.unbatch(d)
    err = np.max(np.abs(np.asarray(du.qpos) - mjd.qpos))
    # 10 ms of full-contact dynamics with ~50 active contacts; the
    # 6-iteration production solver tracks MuJoCo to ~0.1 rad worst-joint
    assert err < 0.15, f"max qpos drift {err}"
    # act (filter states) integrate identically
    np.testing.assert_allclose(du.act, mjd.act, atol=1e-8)
