"""Probe MuJoCo's multi-point contact manifolds on the fly.

Replays the flight-oracle trajectory (tests/test_fly_flight_oracle.py)
and the walking lockstep states, printing every MuJoCo contact grouped
by geom pair — revealing where the native narrowphase emits >1 witness
per pair (the manifold gap tracked in PARITY.md).

Run CPU-only: JAX_PLATFORMS=cpu python tools/probe_manifolds.py
"""

import numpy as np
import mujoco

import sys
sys.path.insert(0, "/root/repo")


def name(m, g):
    return mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or f"g{g}"


def dump_contacts(mj_model, mjd, tag, only_multi=True):
    groups = {}
    for i in range(mjd.ncon):
        c = mjd.contact[i]
        key = (c.geom1, c.geom2)
        groups.setdefault(key, []).append(
            (float(c.dist), np.array(c.pos), np.array(c.frame[:3])))
    for (g1, g2), rows in sorted(groups.items()):
        if only_multi and len(rows) < 2:
            continue
        t1 = mj_model.geom_type[g1]
        t2 = mj_model.geom_type[g2]
        print(f"[{tag}] {name(mj_model, g1)}({t1}) x "
              f"{name(mj_model, g2)}({t2}): {len(rows)} contacts")
        for dist, pos, n in rows:
            print(f"    dist={dist: .6e} pos={pos} n={n}")


def flight_probe():
    from flybody_tpu.models import fruitfly as ff
    from flybody_tpu.tasks import constants as C

    wp = C.WING_PARAMS
    cfg = ff.FlyConfig(
        use_legs=False, use_wings=True, use_mouth=False,
        use_antennae=False, joint_filter=0.0002, root_joint="free",
        body_pitch_angle=C.BODY_PITCH_ANGLE,
        physics_timestep=C.FLY_PHYSICS_TIMESTEP,
        num_user_actions=0, wing_fluid=True)
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    spec = ff.to_spec(morph, cfg, arena_fn=None)
    mj_model = spec.compile()
    mjd = mujoco.MjData(mj_model)
    mjd.qpos[2] += 1.0
    rng = np.random.RandomState(2)
    base = np.clip(0.05 * rng.randn(mj_model.nu), -0.2, 0.2)
    freq = C.WING_PARAMS["base_freq"]
    wing_act = np.array([i for i in range(mj_model.nu)
                         if "wing" in (mujoco.mj_id2name(
                             mj_model, mujoco.mjtObj.mjOBJ_ACTUATOR, i)
                             or "")])
    for i in range(17):
        ctrl = base.copy()
        if len(wing_act):
            ctrl[wing_act] = 0.6 * np.sin(
                2 * np.pi * freq * i * C.FLY_PHYSICS_TIMESTEP)
        mjd.ctrl[:] = ctrl
        mujoco.mj_step(mj_model, mjd)
        if i % 8 == 0:
            dump_contacts(mj_model, mjd, f"flight substep {i}")


def walking_probe():
    from flybody_tpu.models import fruitfly as ff

    cfg = ff.FlyConfig()
    morph = ff.apply_surgery(ff.load_morphology(), cfg)
    spec = ff.to_spec(morph, cfg, arena_fn=ff.floor_arena)
    mj_model = spec.compile()
    mjd = mujoco.MjData(mj_model)
    rng = np.random.RandomState(0)
    mjd.ctrl[:] = np.clip(0.3 * rng.randn(mj_model.nu), -1, 1)
    for i in range(40):
        mujoco.mj_step(mj_model, mjd)
        if i % 10 == 9:
            dump_contacts(mj_model, mjd, f"walk substep {i}")


if __name__ == "__main__":
    print("=== flight config ===")
    flight_probe()
    print("=== walking config ===")
    walking_probe()
