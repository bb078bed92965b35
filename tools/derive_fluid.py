"""Numerically identify MuJoCo's exact ellipsoid-fluid term forms.

For each fluidcoef isolated in turn, compares MuJoCo's qfrc_passive on a
single free ellipsoid against candidate closed forms evaluated on the
same local-frame velocity, over random off-axis (v, w) states. The
winning candidate (max rel error < 1e-9) is the form implemented in
physics/passive.py::fluid_ellipsoid.

Run: JAX_PLATFORMS=cpu python tools/derive_fluid.py
"""

import itertools

import mujoco
import numpy as np

SIZE = np.array([0.1, 0.3, 0.05])
RHO = 1.3


def build(coef, density=RHO, viscosity=0.0):
    xml = f"""
    <mujoco>
      <option density="{density}" viscosity="{viscosity}" gravity="0 0 0"/>
      <worldbody><body pos="0 0 1"><freejoint/>
        <geom type="ellipsoid" size="{SIZE[0]} {SIZE[1]} {SIZE[2]}"
              mass="1" fluidshape="ellipsoid"
              fluidcoef="{' '.join(str(c) for c in coef)}"/>
      </body></worldbody>
    </mujoco>"""
    return mujoco.MjModel.from_xml_string(xml)


def mj_passive(m, qvel):
    d = mujoco.MjData(m)
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    return d.qfrc_passive.copy()


def local_frames(qvel):
    """Free joint at identity: world == local. v = qvel[:3], w = qvel[3:]."""
    return np.asarray(qvel[:3]), np.asarray(qvel[3:])


def candidates_blunt(v):
    s = SIZE
    speed = np.linalg.norm(v)
    if speed < 1e-12:
        return {}
    u = v / speed
    pair = np.array([s[1] * s[2], s[0] * s[2], s[0] * s[1]])
    num = np.sum((pair * v) ** 2)
    den = np.sum((pair ** 2 * v) ** 2)
    A_exact = np.pi * np.sqrt(np.sum((pair * u) ** 2))
    A_mj = np.pi * np.sqrt(den / max(num, 1e-30))
    return {
        "exact_projection": -RHO * A_exact * speed * v,
        "mj_denom_form": -RHO * A_mj * speed * v,
    }


def candidates_kutta(v):
    s = SIZE
    speed = np.linalg.norm(v)
    if speed < 1e-12:
        return {}
    pair = np.array([s[1] * s[2], s[0] * s[2], s[0] * s[1]])
    num = np.sum((pair * v) ** 2)
    den = np.sum((pair ** 2 * v) ** 2)
    normal = pair ** 2 * v
    lift = np.cross(np.cross(normal, v), v)
    f_mj = RHO * np.pi * np.sqrt(num / max(den, 1e-30)) / speed * lift
    # old in-repo approximation
    nvec = v / s ** 2
    nhat = nvec / max(np.linalg.norm(nvec), 1e-30)
    u = v / speed
    A_exact = np.pi * np.sqrt(np.sum((pair * u) ** 2))
    cosun = float(np.dot(u, nhat))
    f_old = (RHO * A_exact * cosun * speed * speed
             * np.cross(np.cross(nhat, u), u))
    return {"mj_num_den_form": f_mj, "old_approx": f_old}


def candidates_angdrag(w):
    s = SIZE
    I = (8.0 / 15.0) * np.pi * np.array([
        s[0] * max(s[1], s[2]) ** 4,
        s[1] * max(s[0], s[2]) ** 4,
        s[2] * max(s[0], s[1]) ** 4])
    return {
        "elementwise": -RHO * I * np.abs(w) * w,
        "norm_Iw": -RHO * np.linalg.norm(I * w) * w,
        "norm_w": -RHO * I * np.linalg.norm(w) * w,
    }


def added_mass_terms(m, v, w):
    fl = m.geom_fluid[0]
    vmass, vinert = fl[6:9], fl[9:12]
    p, L = vmass * v, vinert * w
    frc = np.cross(p, w)
    trq = np.cross(p, v) + np.cross(L, w)
    return frc, trq


def main():
    rng = np.random.RandomState(0)
    states = [np.concatenate([rng.randn(3) * 2, rng.randn(3) * 3])
              for _ in range(8)]

    print("=== added mass alone (all coefs zero) ===")
    m = build((0, 0, 0, 0, 0))
    for qv in states[:4]:
        ref = mj_passive(m, qv)
        v, w = local_frames(qv)
        frc, trq = added_mass_terms(m, v, w)
        print("  ref f", np.round(ref[:3], 6), " cand", np.round(frc, 6))
        print("  ref t", np.round(ref[3:], 6), " cand", np.round(trq, 6))

    print("=== blunt drag (minus added mass) ===")
    m = build((1, 0, 0, 0, 0))
    m0 = build((0, 0, 0, 0, 0))
    for qv in states[:4]:
        ref = mj_passive(m, qv) - mj_passive(m0, qv)
        v, w = local_frames(qv)
        for name, f in candidates_blunt(v).items():
            err = np.linalg.norm(ref[:3] - f) / max(
                np.linalg.norm(ref[:3]), 1e-30)
            print(f"  {name:18s} rel err {err:.3e}")
        print("  ref torque", np.round(ref[3:], 8))

    print("=== kutta (minus added mass) ===")
    m = build((0, 0, 0, 1, 0))
    for qv in states[:4]:
        ref = mj_passive(m, qv) - mj_passive(m0, qv)
        v, w = local_frames(qv)
        for name, f in candidates_kutta(v).items():
            err = np.linalg.norm(ref[:3] - f) / max(
                np.linalg.norm(ref[:3]), 1e-30)
            print(f"  {name:18s} rel err {err:.3e}")

    print("=== angular drag (minus added mass) ===")
    m = build((0, 0, 1, 0, 0))
    for qv in states[:4]:
        ref = mj_passive(m, qv) - mj_passive(m0, qv)
        v, w = local_frames(qv)
        for name, t in candidates_angdrag(w).items():
            err = np.linalg.norm(ref[3:] - t) / max(
                np.linalg.norm(ref[3:]), 1e-30)
            print(f"  {name:18s} rel err {err:.3e}")

    print("=== magnus (minus added mass) ===")
    m = build((0, 0, 0, 0, 1))
    vol = 4.0 / 3.0 * np.pi * np.prod(SIZE)
    for qv in states[:4]:
        ref = mj_passive(m, qv) - mj_passive(m0, qv)
        v, w = local_frames(qv)
        f = RHO * vol * np.cross(w, v)
        err = np.linalg.norm(ref[:3] - f) / max(
            np.linalg.norm(ref[:3]), 1e-30)
        print(f"  rho*V*(w x v)      rel err {err:.3e}")

    print("=== slender drag: any angular (torque) part? ===")
    m = build((0, 1, 0, 0, 0))
    for qv in states[:4]:
        ref = mj_passive(m, qv) - mj_passive(m0, qv)
        print("  torque", np.round(ref[3:], 8))


if __name__ == "__main__":
    main()
