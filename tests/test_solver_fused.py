"""Fused flat-row solver (physics/solver_fused.py + ops/solver_kernels.py)
vs the matrix-free APGD reference solution and the MuJoCo trajectory."""

import mujoco
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from flybody_tpu.ops import solver_kernels as SK
from flybody_tpu.physics import constraint as CN
from flybody_tpu.physics import forward as F
from flybody_tpu.physics import io_mj


def _fly_model_and_state(dtype=jnp.float64, ctrl_scale=0.05, warmup=25,
                         **put_kwargs):
    from flybody_tpu.models import fruitfly as ff
    from flybody_tpu.tasks import constants as C
    from flybody_tpu.tasks.walk_on_ball import ball_arena

    cfg = ff.FlyConfig(use_legs=True, use_wings=False, root_joint="none",
                       spawn_pos=(0.0, 0.0, 0.1278),
                       physics_timestep=C.WALK_PHYSICS_TIMESTEP)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    spec = ff.to_spec(morph, cfg, arena_fn=ball_arena())
    mj_model = spec.compile()
    model = io_mj.put_model(mj_model, dtype=dtype, **put_kwargs)

    rng = np.random.RandomState(1)
    ctrl = np.clip(ctrl_scale * rng.randn(mj_model.nu), -0.2, 0.2)
    step = jax.jit(F.step)
    d = io_mj.make_data(model, dtype=dtype)
    d = io_mj.set_state(d, ctrl=ctrl)
    for _ in range(warmup):    # reach a contact-rich state
        d = step(model, d)
    return model, d


def test_fused_matches_converged_apgd_on_fly():
    """On a full-contact fly state the fused solver's qacc reaches ~1% of
    the 800-iteration APGD reference (the same bar as the dense ADMM
    path, test_solver_dense.py)."""
    model, d = _fly_model_and_state()

    dd = F.fwd_position(model, d)
    dd = F.fwd_velocity(model, dd)
    dd = F.fwd_actuation(model, dd)
    dd = F.fwd_acceleration(model, dd)
    qref = CN.solve(model, dd, iterations=800).qacc

    fused = model.replace(opt=model.opt.replace(contact_solver="fused"))
    for iters, tol in ((20, 0.03), (40, 0.015)):
        qacc = CN.solve(fused, dd, iterations=iters).qacc
        rel = (np.linalg.norm(np.asarray(qacc - qref))
               / np.linalg.norm(np.asarray(qref)))
        assert rel < tol, (iters, rel)


def test_fused_warm_start_converges_faster():
    """A second solve warm-started from the first step's forces reaches
    the reference with fewer iterations than the cold solve."""
    model, d = _fly_model_and_state()
    fused = model.replace(opt=model.opt.replace(contact_solver="fused"))

    dd = F.fwd_position(fused, d)
    dd = F.fwd_velocity(fused, dd)
    dd = F.fwd_actuation(fused, dd)
    dd = F.fwd_acceleration(fused, dd)
    qref = CN.solve(model, dd, iterations=800).qacc

    def rel_of(dd_in, iters):
        q = CN.solve(fused, dd_in, iterations=iters).qacc
        return (np.linalg.norm(np.asarray(q - qref))
                / np.linalg.norm(np.asarray(qref)))

    cold = rel_of(dd, 8)
    warm_state = CN.solve(fused, dd, iterations=40)
    dd_warm = dd.replace(warm_sel=warm_state.warm_sel,
                         warm_f=warm_state.warm_f,
                         warm_lim=warm_state.warm_lim)
    warm = rel_of(dd_warm, 8)
    assert warm < cold, (warm, cold)
    assert warm < 0.02, warm


def test_fused_trajectory_tracks_mujoco():
    """Mixed convex scene stepped with contact_solver='fused' tracks the
    MuJoCo trajectory through contact settling (same scene and bar as
    the ADMM check)."""
    xml = """
<mujoco>
  <option cone="elliptic" timestep="1e-3" noslip_iterations="0"
          iterations="40"/>
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
                            contact_solver="fused")
    mjd = mujoco.MjData(mj_model)
    d = io_mj.make_data(model, dtype=jnp.float64)

    def mystep(m, dd):
        dd = F.forward(m, dd)
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


def test_fused_with_noslip_and_adhesion_full_step():
    """Full F.step with the fused solver on the fly walk-on-ball scene
    (noslip 3, adhesion actuators live) stays finite and near the
    reference-solver step.

    The resting pose sits at an impedance cliff (deep self contacts;
    qacc ~ 3e6 on mouthpart dofs): PRODUCTION-iteration solutions of two
    different first-order solvers legitimately differ by O(1) there, so
    the proximity bar compares CONVERGED (200-iteration) solutions of
    the two paths at f32, while the production fused step is held to
    finiteness."""
    model, d = _fly_model_and_state(dtype=jnp.float32, warmup=0)
    fused = model.replace(opt=model.opt.replace(contact_solver="fused"))
    got = jax.jit(F.step)(fused, d)
    assert np.all(np.isfinite(np.asarray(got.qpos)))

    from flybody_tpu.physics import constraint as CN
    dd = F.fwd_position(model, d)
    dd = F.fwd_velocity(model, dd)
    dd = F.fwd_actuation(model, dd)
    dd = F.fwd_acceleration(model, dd)
    qa = np.asarray(CN.solve(model, dd, iterations=200).qacc)
    qf = np.asarray(CN.solve(fused, dd, iterations=200).qacc)
    rel = np.linalg.norm(qf - qa) / (np.linalg.norm(qa) + 1e-9)
    assert rel < 0.05, rel


def test_kernels_match_references_interpret():
    """Pallas kernels (interpreter mode) reproduce the jnp reference
    implementations bit-closely on random data."""
    rng = np.random.RandomState(0)
    from flybody_tpu.ops import tree_ldl as TL
    # small random tree: 10 dofs chain-ish
    parent = np.array([-1, 0, 1, 2, 1, 4, 0, 6, 7, 7])
    tree = TL.build_tree_meta(parent)
    nv, B = 10, 8
    kl, kc = 8, 8
    R = kl + 3 * kc
    M = np.eye(nv) * 2.0
    for i in range(nv):
        j = parent[i]
        if j >= 0:
            M[i, j] = M[j, i] = 0.3
    Ms = jnp.asarray(M, jnp.float32)[tree.entry_i, tree.entry_j]
    Ms = jnp.broadcast_to(Ms[:, None], (tree.nM, B))
    LD, Dinv = TL.factor(tree, Ms)

    jt = jnp.asarray(rng.randn(nv, R, B), jnp.float32)
    qs = jnp.asarray(rng.randn(nv, B), jnp.float32)
    qv = jnp.asarray(rng.randn(nv, B), jnp.float32)
    kco = jnp.asarray(rng.rand(R, B), jnp.float32)
    bco = jnp.asarray(rng.rand(R, B), jnp.float32)
    por = jnp.asarray(rng.randn(R, B), jnp.float32)

    yd_r, b_r = SK.upsolve_yd_reference(tree, jt, LD, Dinv, qs, qv,
                                        kco, bco, por)
    yd_k, b_k = SK.upsolve_yd(tree, jt, LD, Dinv, qs, qv, kco, bco, por,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(yd_k), np.asarray(yd_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_k), np.asarray(b_r),
                               rtol=1e-5, atol=1e-5)

    b = jnp.asarray(rng.randn(R, B), jnp.float32)
    rreg = jnp.asarray(rng.rand(R, B) * 0.1 + 0.01, jnp.float32)
    act = jnp.asarray((rng.rand(R, B) > 0.3), jnp.float32)
    mu = jnp.asarray(rng.rand(kc, B) * 0.8 + 0.2, jnp.float32)
    f0 = jnp.zeros((R, B), jnp.float32)
    kw = dict(kl=kl, kc=kc, iterations=12, noslip_iterations=2)
    f_r, y_r, v_r = SK.apgd_iterate_reference(yd_r, b, rreg, act, mu, f0,
                                              **kw)
    f_k, y_k, v_k = SK.apgd_iterate(yd_r, b, rreg, act, mu, f0,
                                    interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r),
                               rtol=1e-4, atol=1e-4)


def test_fused_selection_persistence_matches_fresh():
    """fresh=False (selection-persistent update substeps, envs/core.py
    col_refresh schedule) reuses the stored row selection + raw forces:
    at the SAME state it must reproduce the fresh solve's qacc nearly
    exactly (identical selected rows, warm start at the solution)."""
    fused, d = _fly_model_and_state(contact_solver="fused")

    dd = F.fwd_position(fused, d)
    dd = F.fwd_velocity(fused, dd)
    dd = F.fwd_actuation(fused, dd)
    dd = F.fwd_acceleration(fused, dd)

    s1 = CN.solve(fused, dd, fresh=True)
    # carry the persisted selection + forces into a second solve at the
    # same state
    dd2 = dd.replace(sol_lim_sel=s1.sol_lim_sel,
                     sol_cone_sel=s1.sol_cone_sel, sol_f=s1.sol_f,
                     warm_sel=s1.warm_sel, warm_f=s1.warm_f,
                     warm_lim=s1.warm_lim, apgd_v=s1.apgd_v)
    s2 = CN.solve(fused, dd2, fresh=False)
    # identical selected rows (stored selection is what fresh recomputes)
    assert (np.asarray(s1.sol_lim_sel) == np.asarray(s2.sol_lim_sel)).all()
    assert (np.asarray(s1.sol_cone_sel) == np.asarray(s2.sol_cone_sel)).all()
    # warm-started at s1's solution, s2 must be at least as close to the
    # converged dual solution as s1 (persistence adds effective
    # iterations, never loses accuracy at an unchanged state)
    qref = np.asarray(CN.solve(fused, dd, iterations=400).qacc)

    def rel(a, b):
        return (np.linalg.norm(np.asarray(a) - b) / np.linalg.norm(b))

    assert rel(s2.qacc, qref) <= rel(s1.qacc, qref) * 1.05, (
        rel(s2.qacc, qref), rel(s1.qacc, qref))

    # the fresh solve at the next state must also accept the carried
    # fields (cross-window path) without shape errors
    d3 = F.step(fused, s2.replace(qacc=s2.qacc), col_update=False)
    assert np.all(np.isfinite(np.asarray(d3.qpos)))
