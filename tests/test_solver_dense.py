"""Dense-dual ADMM solver (physics/solver_dense.py) vs the matrix-free
APGD reference solution and the MuJoCo oracle."""

import dataclasses

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.physics import constraint as CN
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj
from flybody_tpu.physics import smooth as S
from flybody_tpu.physics import solver_dense as SD


def test_admm_matches_converged_apgd_on_fly():
    """On full-contact fly states: 20/40 ADMM iterations reach ~1%/0.3%
    of the 800-iteration APGD solution (the measured basis for the
    production iteration default)."""
    from flybody_tpu.models import fruitfly as ff
    from flybody_tpu.tasks import constants as C
    from flybody_tpu.tasks.walk_on_ball import ball_arena

    cfg = ff.FlyConfig(use_legs=True, use_wings=False, root_joint="none",
                       spawn_pos=(0.0, 0.0, 0.1278),
                       physics_timestep=C.WALK_PHYSICS_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    spec = ff.to_spec(morph, cfg, arena_fn=ball_arena())
    mj_model = spec.compile()
    model = io_mj.put_model(mj_model, dtype=jnp.float64)

    rng = np.random.RandomState(1)
    ctrl = np.clip(0.05 * rng.randn(mj_model.nu), -0.2, 0.2)
    step = jax.jit(F.step)
    d = io_mj.make_data(model, dtype=jnp.float64)
    d = io_mj.set_state(d, ctrl=ctrl)
    for _ in range(25):        # reach a contact-rich state
        d = step(model, d)

    dd = F.fwd_position(model, d)
    dd = F.fwd_velocity(model, dd)
    efc = CN.make_efc(model, dd)
    lim, groups = efc
    dd = F.fwd_actuation(model, dd, efc=efc)
    dd = F.fwd_acceleration(model, dd)
    qref = CN.solve(model, dd, iterations=800, efc=efc).qacc

    for iters, tol in ((20, 0.03), (40, 0.01)):
        fl, fg = SD.solve_dual_dense(model, dd, lim, groups,
                                     iterations=iters)
        qfrc = jnp.zeros_like(dd.qvel)
        if fl is not None:
            qfrc = qfrc.at[lim.dadr].add(lim.sign * fl)
        for g, f in zip(groups, fg):
            qfrc = qfrc + jnp.einsum("kdvB,kdB->vB", g.jac, f)
        qacc = dd.qacc_smooth + S.solve_m(model, dd, qfrc)
        rel = (np.linalg.norm(np.asarray(qacc - qref))
               / np.linalg.norm(np.asarray(qref)))
        assert rel < tol, (iters, rel)


def test_admm_trajectory_tracks_mujoco():
    """Mixed convex scene stepped with contact_solver='admm' tracks the
    MuJoCo trajectory through contact settling (same scene as the ccd
    integration check: ellipsoid/cylinder/capsule falling on a plane)."""
    xml = """
<mujoco>
  <option cone="elliptic" timestep="1e-3" noslip_iterations="0"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.1"><freejoint/>
      <geom type="ellipsoid" size=".1 .07 .05" mass="1"/></body>
    <body pos="0.12 0 0.3"><freejoint/>
      <geom type="cylinder" size=".04 .06" mass=".5"/></body>
    <body pos="-0.05 0.05 0.35"><freejoint/>
      <geom type="capsule" size=".03 .05" mass=".3"/></body>
  </worldbody>
</mujoco>"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = io_mj.put_model(mj_model, dtype=jnp.float64,
                            contact_solver="admm")
    assert model.opt.contact_solver == "admm"
    mjd = mujoco.MjData(mj_model)
    d = io_mj.make_data(model, dtype=jnp.float64)

    # 40 iterations: settling friction needs more than the fly's
    # warm-contact default (measured: 40 iters ~ 1.9mm over 0.6s,
    # matching APGD; 20 iters ~ 8.6mm)
    def mystep(m, dd):
        dd = F.fwd_position(m, dd)
        dd = F.fwd_velocity(m, dd)
        efc = CN.make_efc(m, dd)
        dd = F.fwd_actuation(m, dd, efc=efc)
        dd = F.fwd_acceleration(m, dd)
        dd = CN.solve(m, dd, iterations=40, efc=efc)
        dd = F.euler(m, dd)
        return dd

    step = jax.jit(mystep)
    for _ in range(600):
        mujoco.mj_step(mj_model, mjd)
        d = step(model, d)
    du = io_mj.unbatch(d)
    err = np.max(np.abs(np.asarray(du.qpos) - mjd.qpos))
    assert np.all(np.isfinite(np.asarray(du.qpos)))
    assert err < 5e-3, err


def test_admm_kernel_matches_xla_path():
    """The fused Pallas iteration kernel (interpret mode off-TPU)
    reproduces the XLA ADMM path to bf16-operator accuracy on a real
    contact state."""
    xml = """
<mujoco>
  <option cone="elliptic" timestep="1e-3" noslip_iterations="0"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.06"><freejoint/>
      <geom type="ellipsoid" size=".1 .07 .05" mass="1"/></body>
    <body pos="0.12 0 0.08"><freejoint/>
      <geom type="cylinder" size=".04 .06" mass=".5"/></body>
  </worldbody>
</mujoco>"""
    mj_model = mujoco.MjModel.from_xml_string(xml)
    model = io_mj.put_model(mj_model, dtype=jnp.float32)
    d = io_mj.make_data(model, B=4, dtype=jnp.float32)
    step = jax.jit(F.step)
    for _ in range(30):        # settle into contact
        d = step(model, d)
    dd = F.fwd_position(model, d)
    dd = F.fwd_velocity(model, dd)
    efc = CN.make_efc(model, dd)
    lim, groups = efc
    dd = F.fwd_actuation(model, dd, efc=efc)
    dd = F.fwd_acceleration(model, dd)

    outs = {}
    for kern in (False, True):
        fl, fg = SD.solve_dual_dense(model, dd, lim, groups,
                                     iterations=25, use_kernel=kern)
        outs[kern] = (fl, fg)
    for fa, fb in zip(jax.tree.leaves(outs[False]),
                      jax.tree.leaves(outs[True])):
        scale = float(jnp.max(jnp.abs(fa))) + 1e-6
        np.testing.assert_allclose(np.asarray(fa) / scale,
                                   np.asarray(fb) / scale, atol=2e-2)
