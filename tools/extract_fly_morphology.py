"""One-time extraction of the fruit-fly morphology into a standalone asset.

The published flybody model (Vaxenburg et al., Apache-2.0; reference mounted
at /root/reference) defines the fly's kinematic tree, inertials, joints,
actuators, tendons and sensors partly through ~160 visual meshes. This tool
compiles a mesh-patched variant once (the snapshot is missing 6 visual
meshes, which we replace with their documented collision-ellipsoid
equivalents and published masses: head 0.15 mg, thorax 0.34 mg), then dumps
the *numeric morphology* — never any XML/code — into
``flybody_tpu/models/assets/fly_morphology.npz`` + ``.json``.

The framework's procedural builder (flybody_tpu/models/fruitfly.py)
re-authors the model from this data with primitive-only geometry; visual
meshes are dropped entirely (the TPU pipeline renders from primitives).

Run:  python tools/extract_fly_morphology.py [reference_assets_dir out_dir]
"""

import json
import os
import shutil
import sys
import tempfile
import xml.etree.ElementTree as ET

import numpy as np

import mujoco

REF = "/root/reference/vnl_ray/fruitfly/assets"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "flybody_tpu", "models", "assets")

# Published empirical masses (mg -> g, CGS): flybody make_fruitfly.py:24
HEAD_MASS = 0.00015
THORAX_MASS = 0.00034

_MISSING = {"thorax", "thorax_black", "head", "head_red", "head_ocelli",
            "head_black"}


def patch_xml(src: str) -> str:
    tree = ET.parse(src)
    root = tree.getroot()
    # remove asset entries for missing meshes
    asset = root.find("asset")
    for mesh in list(asset.findall("mesh")):
        name = mesh.get("name") or os.path.splitext(
            os.path.basename(mesh.get("file")))[0]
        f = os.path.join(REF, mesh.get("file"))
        if not os.path.exists(f):
            asset.remove(mesh)

    def find_geom(body, name):
        for g in body.findall("geom"):
            if g.get("name") == name:
                return g
        return None

    for body in root.iter("body"):
        bname = body.get("name")
        for g in list(body.findall("geom")):
            mesh = g.get("mesh")
            if mesh is None or mesh not in _MISSING:
                continue
            if mesh == "thorax":
                coll = find_geom(body, "thorax_collision")
                g.attrib.clear()
                g.set("name", "thorax_visual")
                g.set("type", "ellipsoid")
                g.set("size", coll.get("size"))
                g.set("pos", coll.get("pos"))
                g.set("quat", coll.get("quat"))
                g.set("mass", str(THORAX_MASS))
                g.set("contype", "0")
                g.set("conaffinity", "0")
                g.set("group", "1")
            elif mesh == "head":
                coll = find_geom(body, "head_collision")
                g.attrib.clear()
                g.set("name", "head_visual")
                g.set("type", "ellipsoid")
                g.set("size", coll.get("size"))
                g.set("pos", coll.get("pos"))
                g.set("euler", coll.get("euler", "0 0 0"))
                g.set("mass", str(HEAD_MASS))
                g.set("contype", "0")
                g.set("conaffinity", "0")
                g.set("group", "1")
            else:
                body.remove(g)
    out = tempfile.mkdtemp(prefix="fly_extract_")
    # link existing assets
    os.makedirs(os.path.join(out, "assets"), exist_ok=True)
    for f in os.listdir(REF):
        if f.endswith((".obj", ".msh", ".png")):
            os.symlink(os.path.join(REF, f), os.path.join(out, f))
    path = os.path.join(out, "fly_patched.xml")
    tree.write(path)
    return path


def extract(m: mujoco.MjModel) -> tuple[dict, dict]:
    arrays, names = {}, {}

    def name_of(obj, i):
        return mujoco.mj_id2name(m, obj, i) or f"_{i}"

    O = mujoco.mjtObj
    names["bodies"] = [name_of(O.mjOBJ_BODY, i) for i in range(m.nbody)]
    names["joints"] = [name_of(O.mjOBJ_JOINT, i) for i in range(m.njnt)]
    names["sites"] = [name_of(O.mjOBJ_SITE, i) for i in range(m.nsite)]
    names["actuators"] = [name_of(O.mjOBJ_ACTUATOR, i) for i in range(m.nu)]
    names["tendons"] = [name_of(O.mjOBJ_TENDON, i) for i in range(m.ntendon)]
    names["cameras"] = [name_of(O.mjOBJ_CAMERA, i) for i in range(m.ncam)]
    names["sensors"] = [name_of(O.mjOBJ_SENSOR, i) for i in range(m.nsensor)]

    # geoms: keep only primitives (drop all visual meshes)
    keep = [g for g in range(m.ngeom)
            if m.geom_type[g] != mujoco.mjtGeom.mjGEOM_MESH]
    names["geoms"] = [name_of(O.mjOBJ_GEOM, g) for g in keep]
    arrays["geom_keep"] = np.array(keep)
    for f in ["geom_type", "geom_bodyid", "geom_pos", "geom_quat",
              "geom_size", "geom_contype", "geom_conaffinity", "geom_condim",
              "geom_friction", "geom_solref", "geom_solimp", "geom_solmix",
              "geom_margin", "geom_gap", "geom_priority", "geom_group",
              "geom_rgba"]:
        arrays[f] = getattr(m, f)[keep]

    for f in ["body_parentid", "body_pos", "body_quat", "body_mass",
              "body_ipos", "body_iquat", "body_inertia",
              "jnt_type", "jnt_bodyid", "jnt_pos", "jnt_axis", "jnt_range",
              "jnt_limited", "jnt_stiffness", "jnt_margin",
              "jnt_solref", "jnt_solimp", "jnt_qposadr", "jnt_dofadr",
              "dof_jntid", "dof_damping", "dof_armature", "dof_frictionloss",
              "qpos_spring", "qpos0",
              "site_bodyid", "site_pos", "site_quat", "site_size",
              "site_type",
              "cam_bodyid", "cam_pos", "cam_quat", "cam_fovy", "cam_mode",
              "actuator_trntype", "actuator_trnid", "actuator_dyntype",
              "actuator_dynprm", "actuator_gaintype", "actuator_gainprm",
              "actuator_biastype", "actuator_biasprm", "actuator_ctrlrange",
              "actuator_ctrllimited", "actuator_forcerange",
              "actuator_forcelimited", "actuator_gear", "actuator_group",
              "tendon_stiffness", "tendon_damping", "tendon_lengthspring",
              "tendon_adr", "tendon_num",
              "wrap_objid", "wrap_prm", "wrap_type",
              "sensor_type", "sensor_objid", "sensor_objtype",
              "sensor_datatype", "sensor_dim"]:
        arrays[f] = getattr(m, f)

    # explicit contact exclude pairs (body-name pairs): the reference XML
    # carries ~26 of them (abdomen chain skips, wing-abdomen, coxa/femur
    # left-right, rostrum-labrum); dropping them creates contacts MuJoCo
    # never simulates (found by the reference-env parity tests, round 4)
    excludes = []
    for e in range(m.nexclude):
        sig = int(m.exclude_signature[e])
        b1, b2 = sig >> 16, sig & 0xFFFF
        excludes.append([name_of(O.mjOBJ_BODY, b1),
                         name_of(O.mjOBJ_BODY, b2)])
    names["excludes"] = excludes

    opt = m.opt
    arrays["opt_timestep"] = np.array(opt.timestep)
    arrays["opt_gravity"] = np.array(opt.gravity)
    arrays["opt_density"] = np.array(opt.density)
    arrays["opt_viscosity"] = np.array(opt.viscosity)
    arrays["opt_cone"] = np.array(int(opt.cone))
    arrays["opt_noslip_iterations"] = np.array(int(opt.noslip_iterations))
    return arrays, names


def main():
    global REF
    ref = sys.argv[1] if len(sys.argv) > 1 else REF
    out = sys.argv[2] if len(sys.argv) > 2 else OUT
    REF = ref
    path = patch_xml(os.path.join(ref, "fruitfly.xml"))
    m = mujoco.MjModel.from_xml_path(path)
    print(f"compiled: nbody={m.nbody} njnt={m.njnt} nv={m.nv} nu={m.nu} "
          f"ngeom={m.ngeom} ntendon={m.ntendon} nsensor={m.nsensor} "
          f"total mass={m.body_subtreemass[0]*1e3:.4f} mg")
    arrays, names = extract(m)
    os.makedirs(out, exist_ok=True)
    np.savez_compressed(os.path.join(out, "fly_morphology.npz"), **arrays)
    with open(os.path.join(out, "fly_morphology.json"), "w") as f:
        json.dump(names, f, indent=1)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print("written:", os.path.join(out, "fly_morphology.npz"))


if __name__ == "__main__":
    main()
