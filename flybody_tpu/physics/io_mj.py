"""Host-side model compilation: MuJoCo mjModel -> TPU-native Model pytree.

The framework authors models programmatically (see flybody_tpu.models) and
compiles them ONCE on the host with the MuJoCo compiler (a C library, used
here the way a build toolchain is used). Everything downstream — stepping,
batching, sharding — is this repo's pure-JAX engine; mjModel never crosses
the device boundary.

This mirrors the role dm_control's mjcf compile step plays for the reference
(reference: vnl_ray/fruitfly/fruitfly.py:162) but removes it from the episode
loop entirely: per-episode variation is data, never model surgery, so there
is exactly one XLA compilation per task family (SURVEY.md §7 design delta 1).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Model, Data, Contact, Option, Static


_SUPPORTED_GEOMS = {
    T.GEOM_PLANE, T.GEOM_HFIELD, T.GEOM_SPHERE, T.GEOM_CAPSULE,
    T.GEOM_ELLIPSOID, T.GEOM_CYLINDER, T.GEOM_BOX, T.GEOM_MESH,
}

# Max contacts generated per candidate pair, keyed by (type1, type2) with
# type1 <= type2 (plane/hfield always first by construction below).
_PAIR_NCON = {
    (T.GEOM_PLANE, T.GEOM_SPHERE): 1,
    (T.GEOM_PLANE, T.GEOM_CAPSULE): 2,
    (T.GEOM_PLANE, T.GEOM_ELLIPSOID): 1,
    (T.GEOM_PLANE, T.GEOM_CYLINDER): 3,
    (T.GEOM_PLANE, T.GEOM_BOX): 4,
    (T.GEOM_HFIELD, T.GEOM_SPHERE): 1,
    (T.GEOM_HFIELD, T.GEOM_CAPSULE): 2,
    (T.GEOM_HFIELD, T.GEOM_ELLIPSOID): 1,
    (T.GEOM_HFIELD, T.GEOM_CYLINDER): 3,
    (T.GEOM_SPHERE, T.GEOM_SPHERE): 1,
    (T.GEOM_SPHERE, T.GEOM_CAPSULE): 1,
    (T.GEOM_SPHERE, T.GEOM_BOX): 1,
    (T.GEOM_CAPSULE, T.GEOM_CAPSULE): 1,
    (T.GEOM_CAPSULE, T.GEOM_BOX): 2,
}
# Every ellipsoid/cylinder vs {sphere, capsule, ellipsoid, cylinder} pair
# routes through the gated exact-convex narrowphase (physics/ccd.py),
# matching MuJoCo's mjc_Convex dispatch. Plane-vs-* keeps analytic
# support-point functions (as MuJoCo does).
_CCD_TYPES = {T.GEOM_SPHERE, T.GEOM_CAPSULE, T.GEOM_ELLIPSOID,
              T.GEOM_CYLINDER}


def _is_ccd_pair(t1: int, t2: int) -> bool:
    return (t1 in _CCD_TYPES and t2 in _CCD_TYPES
            and (T.GEOM_ELLIPSOID in (t1, t2)
                 or T.GEOM_CYLINDER in (t1, t2)))


def _names(m) -> dict:
    """Extract name -> id tables from mjModel."""
    import mujoco

    out: dict[str, dict[str, int]] = {}
    for kind, n in [
        ("body", m.nbody), ("joint", m.njnt), ("geom", m.ngeom),
        ("site", m.nsite), ("actuator", m.nu), ("tendon", m.ntendon),
        ("sensor", m.nsensor), ("camera", m.ncam),
    ]:
        obj = getattr(mujoco.mjtObj, "mjOBJ_" + kind.upper())
        table = {}
        for i in range(n):
            name = mujoco.mj_id2name(m, obj, i)
            if name:
                table[name] = i
        out[kind] = table
    return out


def _tree_meta(dof_parentid):
    from flybody_tpu.ops import tree_ldl as TL
    return TL.build_tree_meta(np.asarray(dof_parentid))


def _tree_levels(parentid: np.ndarray) -> tuple:
    """Group body ids (excluding world=0) by depth for level-parallel FK."""
    nbody = len(parentid)
    depth = np.zeros(nbody, dtype=np.int32)
    for i in range(1, nbody):
        depth[i] = depth[parentid[i]] + 1
    levels = []
    for d in range(1, depth.max() + 1 if nbody > 1 else 1):
        ids = np.nonzero(depth == d)[0]
        if len(ids):
            levels.append(Static(ids.astype(np.int32)))
    return tuple(levels)


def _body_dof_mask(m) -> np.ndarray:
    """(nbody, nv) bool: True where the dof belongs to the body or one of
    its kinematic ancestors (i.e. the dof moves the body)."""
    mask = np.zeros((m.nbody, m.nv), dtype=bool)
    for b in range(m.nbody):
        cur = b
        while cur != 0:
            adr, num = m.body_dofadr[cur], m.body_dofnum[cur]
            mask[b, adr:adr + num] = True
            cur = m.body_parentid[cur]
    return mask


def _ancestor_mask(dof_parentid: np.ndarray, nv: int) -> np.ndarray:
    """mask[i, j] == True iff dof j is an ancestor of dof i (or j == i)."""
    mask = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = dof_parentid[j]
    return mask


def _collision_pairs(m):
    """Static candidate geom pairs passing MuJoCo's collision filters,
    split into analytic-narrowphase pairs and gated ccd pairs."""
    geom1, geom2 = [], []
    ccd1, ccd2 = [], []
    weld = m.body_weldid
    weldparent = np.array([weld[m.body_parentid[weld[b]]]
                           for b in range(m.nbody)])
    excluded = set()
    for e in range(m.nexclude):
        sig = m.exclude_signature[e]
        excluded.add((sig >> 16, sig & 0xFFFF))

    for i in range(m.ngeom):
        for j in range(i + 1, m.ngeom):
            t1, t2 = int(m.geom_type[i]), int(m.geom_type[j])
            g1, g2 = (i, j)
            if t1 > t2:
                g1, g2, t1, t2 = j, i, t2, t1
            is_ccd = _is_ccd_pair(t1, t2)
            if not is_ccd and (t1, t2) not in _PAIR_NCON:
                continue
            b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
            con1, aff1 = int(m.geom_contype[g1]), int(m.geom_conaffinity[g1])
            con2, aff2 = int(m.geom_contype[g2]), int(m.geom_conaffinity[g2])
            if not ((con1 & aff2) or (con2 & aff1)):
                continue
            w1, w2 = int(weld[b1]), int(weld[b2])
            if w1 == w2:
                continue
            wp1, wp2 = int(weldparent[b1]), int(weldparent[b2])
            if (w1 == wp2 and w1 != 0) or (w2 == wp1 and w2 != 0):
                continue
            bb = (min(b1, b2), max(b1, b2))
            if bb in excluded or (bb[1], bb[0]) in excluded:
                continue
            if is_ccd:
                ccd1.append(g1)
                ccd2.append(g2)
            else:
                geom1.append(g1)
                geom2.append(g2)
    types = [(int(m.geom_type[a]), int(m.geom_type[b]))
             for a, b in zip(geom1, geom2)]
    return (np.array(geom1, dtype=np.int32),
            np.array(geom2, dtype=np.int32), types,
            np.array(ccd1, dtype=np.int32), np.array(ccd2, dtype=np.int32))


_SENSOR_MAP = {}  # filled lazily from mujoco enums


def _sensor_code(mj_type: int) -> int:
    import mujoco

    if not _SENSOR_MAP:
        S = mujoco.mjtSensor
        _SENSOR_MAP.update({
            S.mjSENS_ACCELEROMETER: T.SENS_ACCELEROMETER,
            S.mjSENS_GYRO: T.SENS_GYRO,
            S.mjSENS_VELOCIMETER: T.SENS_VELOCIMETER,
            S.mjSENS_FORCE: T.SENS_FORCE,
            S.mjSENS_TOUCH: T.SENS_TOUCH,
            S.mjSENS_JOINTPOS: T.SENS_JOINTPOS,
            S.mjSENS_JOINTVEL: T.SENS_JOINTVEL,
            S.mjSENS_ACTUATORFRC: T.SENS_ACTUATORFRC,
            S.mjSENS_FRAMEPOS: T.SENS_FRAMEPOS,
            S.mjSENS_FRAMEQUAT: T.SENS_FRAMEQUAT,
            S.mjSENS_SUBTREECOM: T.SENS_SUBTREECOM,
            S.mjSENS_TENDONPOS: T.SENS_TENDONPOS,
            S.mjSENS_TENDONVEL: T.SENS_TENDONVEL,
            S.mjSENS_SUBTREELINVEL: T.SENS_SUBTREELINVEL,
            S.mjSENS_FRAMEZAXIS: T.SENS_FRAMEZAXIS,
            S.mjSENS_TORQUE: T.SENS_TORQUE,
        })
    code = _SENSOR_MAP.get(mj_type)
    if code is None:
        raise NotImplementedError(f"sensor type {mj_type}")
    return code


def put_model(m, dtype=jnp.float32, con_sel: dict | None = None,
              ccd_budget: int = 128, ccd_iters: int = 8,
              contact_solver: str = "apgd",
              fused_sel: tuple = (24, 24),
              col_refresh: int = 1,
              ccd_class_budgets: dict | None = None) -> Model:
    """Convert a compiled mjModel into the engine's Model pytree.

    con_sel: optional {condim: K} overrides for the per-condim active
    contact island sizes (smaller K = faster constraint solve; default
    constraint.MAX_ACTIVE).
    ccd_budget: per-env lane budget for the gated exact-convex
    narrowphase (ellipsoid/cylinder pairs); the nccd candidates are
    gated to this many by bounding-sphere distance each substep.
    ccd_iters: PGD iterations per narrowphase run. 8 is converged on
    the full fly (max |dist - dist*| < 5e-8 m over all near-contact
    pairs, tools/ccd_iter_sweep.py) thanks to the BB steps + the
    previous-substep warm start carried in Data (ccd_warm_u); raise
    for cold single-shot queries on exotic shapes.
    """
    import mujoco

    for g in range(m.ngeom):
        if int(m.geom_type[g]) not in _SUPPORTED_GEOMS:
            raise NotImplementedError(f"geom type {m.geom_type[g]}")

    a = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
    s = lambda x: Static(np.asarray(x))

    pair_g1, pair_g2, pair_types, ccd_g1, ccd_g2 = _collision_pairs(m)
    ncon_max = int(sum(_PAIR_NCON[t] for t in pair_types))

    def _combined_params(g1, g2):
        """mj_contactParam semantics for one geom pair."""
        p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
        if p1 != p2:
            hi = g1 if p1 > p2 else g2
            cd = int(m.geom_condim[hi])
            solref = m.geom_solref[hi].copy()
            solimp = m.geom_solimp[hi].copy()
            fric = m.geom_friction[hi].copy()
        else:
            cd = max(int(m.geom_condim[g1]), int(m.geom_condim[g2]))
            s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
            mix = s1 / (s1 + s2) if (s1 + s2) > 1e-12 else 0.5
            if m.geom_solref[g1, 0] <= 0 or m.geom_solref[g2, 0] <= 0:
                solref = np.minimum(m.geom_solref[g1], m.geom_solref[g2])
            else:
                solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
            solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
            fric = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        # MuJoCo 3.10 (measured, two-sphere probes): the pair margin is
        # the SUM of the two geoms' margins, contact.includemargin equals
        # that sum, and geom_gap has no observable effect on row
        # inclusion or force (the round-4 engine used max() — wrong by
        # 2x on the fly's adhesion-class pairs where both geoms carry
        # margin 5e-4)
        margin = float(m.geom_margin[g1]) + float(m.geom_margin[g2])
        fric5 = np.array([fric[0], fric[0], fric[1], fric[2], fric[2]])
        return cd, solref, solimp, fric5, margin

    # Per-slot combined contact params (precomputed host-side so
    # collision() traces O(groups) not O(pairs)).
    con_dim = []
    con_solref, con_solimp, con_fric, con_incmargin = [], [], [], []
    con_margin_l = []
    for (g1, g2) in zip(pair_g1, pair_g2):
        cd, solref, solimp, fric5, margin = _combined_params(g1, g2)
        t = (int(m.geom_type[g1]), int(m.geom_type[g2]))
        k = _PAIR_NCON[t]
        con_dim += [cd] * k
        con_solref += [solref] * k
        con_solimp += [solimp] * k
        con_fric += [fric5] * k
        con_incmargin += [margin] * k
        con_margin_l += [margin] * k

    # ccd pair tables (support-core geometry + combined params), sorted
    # class-major by kink structure (ax1, ax2) — smoother classes need
    # fewer PGD candidate runs (ccd.minimize_support)
    from flybody_tpu.physics import ccd as ccd_mod
    nccd = len(ccd_g1)
    order = []
    for i, (g1, g2) in enumerate(zip(ccd_g1, ccd_g2)):
        c1 = ccd_mod.geom_core_params(int(m.geom_type[g1]), m.geom_size[g1])
        c2 = ccd_mod.geom_core_params(int(m.geom_type[g2]), m.geom_size[g2])
        order.append(((int(c1[5]), int(c2[5])), i))
    order.sort()
    perm = [i for _, i in order]
    ccd_g1 = ccd_g1[perm] if nccd else ccd_g1
    ccd_g2 = ccd_g2[perm] if nccd else ccd_g2

    ccd_core, ccd_solref_l, ccd_solimp_l = [], [], []
    ccd_mu_l, ccd_margin_ll, ccd_rbsum = [], [], []
    cls_axes = []
    for (g1, g2) in zip(ccd_g1, ccd_g2):
        cd, solref, solimp, fric5, margin = _combined_params(g1, g2)
        if cd == 1:
            # each gated ccd pool is one static condim-3 group; in the
            # dual solver a friction cone with mu = 0 is EXACTLY a
            # frictionless contact (the cone projection zeroes the
            # tangential forces every iteration, incl. the noslip pass),
            # so condim-1 pairs are promoted with mu := 0
            fric5 = np.zeros_like(fric5)
        elif cd != 3:
            raise NotImplementedError(
                f"ccd pair condim {cd} (only 1/3 supported)")
        c1 = ccd_mod.geom_core_params(int(m.geom_type[g1]), m.geom_size[g1])
        c2 = ccd_mod.geom_core_params(int(m.geom_type[g2]), m.geom_size[g2])
        cls_axes.append((bool(c1[5]), bool(c2[5])))
        ccd_core.append(np.concatenate([c1[:5], c2[:5]]))
        ccd_solref_l.append(solref)
        ccd_solimp_l.append(solimp)
        ccd_mu_l.append(fric5[0])
        ccd_margin_ll.append(margin)
        ccd_rbsum.append(float(m.geom_rbound[g1] + m.geom_rbound[g2]))

    # class segments over the (ax1, ax2)-sorted tables; budgets split
    # the total lane budget by kink count: 25% smooth / 50% one-axis
    # (both side variants) / 25% two-axis, each capped by the class's
    # candidate count
    ccd_classes = []
    ccd_budget_eff = 0
    if nccd:
        flags = np.array(cls_axes)                      # (nccd, 2) bool
        shares = {0: 0.25, 1: 0.25, 2: 0.25}
        for key in ((False, False), (False, True), (True, False),
                    (True, True)):
            idx = np.nonzero((flags[:, 0] == key[0])
                             & (flags[:, 1] == key[1]))[0]
            if not len(idx):
                continue
            start, n = int(idx[0]), int(len(idx))
            assert np.all(idx == np.arange(start, start + n))
            share = shares[int(key[0]) + int(key[1])]
            if ccd_class_budgets and key in ccd_class_budgets:
                # explicit per-class budget (sized per env family with
                # tools/measure_active_contacts.py — the class gate-hot
                # counts are far from the uniform share split)
                budget = min(n, int(ccd_class_budgets[key]))
            else:
                budget = min(n, max(8, int(round(ccd_budget * share))))
            ccd_classes.append((key[0], key[1], start, n, budget))
            ccd_budget_eff += budget

    n_limit = int(m.jnt_limited.sum())
    nefc = n_limit + int(sum(con_dim)) + 3 * ccd_budget_eff

    integ = {0: T.EULER, 1: T.RK4, 2: T.IMPLICIT}.get(int(m.opt.integrator),
                                                      T.EULER)
    has_fluid = bool(m.opt.density > 0 or m.opt.viscosity > 0
                     or np.any(m.opt.wind))

    opt = Option(
        timestep=a(m.opt.timestep), gravity=a(m.opt.gravity),
        density=a(m.opt.density), viscosity=a(m.opt.viscosity),
        wind=a(m.opt.wind), impratio=a(m.opt.impratio),
        tolerance=a(m.opt.tolerance),
        integrator=integ, cone=int(m.opt.cone),
        solver_iterations=min(int(m.opt.iterations), 32),
        ls_iterations=min(int(m.opt.ls_iterations), 16),
        noslip_iterations=int(m.opt.noslip_iterations),
        has_fluid=has_fluid,
        contact_solver=contact_solver,
    )

    wrap_jntid = np.zeros(m.nwrap, dtype=np.int32)
    for w in range(m.nwrap):
        if m.wrap_type[w] != mujoco.mjtWrap.mjWRAP_JOINT:
            raise NotImplementedError("only fixed tendons supported")
        wrap_jntid[w] = m.wrap_objid[w]

    sensor_type = np.array([_sensor_code(int(t)) for t in m.sensor_type],
                           dtype=np.int32)

    return Model(
        nq=int(m.nq), nv=int(m.nv), nu=int(m.nu), na=int(m.na),
        nbody=int(m.nbody), njnt=int(m.njnt), ngeom=int(m.ngeom),
        nsite=int(m.nsite), ntendon=int(m.ntendon), nwrap=int(m.nwrap),
        nsensor=int(m.nsensor), nsensordata=int(m.nsensordata),
        ncon_max=ncon_max, nefc=nefc,
        nhfield=int(m.nhfield),
        hfield_nrow=int(m.hfield_nrow[0]) if m.nhfield else 0,
        hfield_ncol=int(m.hfield_ncol[0]) if m.nhfield else 0,
        body_parentid=s(m.body_parentid), body_rootid=s(m.body_rootid),
        body_jntadr=s(m.body_jntadr), body_jntnum=s(m.body_jntnum),
        body_dofadr=s(m.body_dofadr), body_dofnum=s(m.body_dofnum),
        body_geomadr=s(m.body_geomadr), body_geomnum=s(m.body_geomnum),
        body_tree=_tree_levels(m.body_parentid),
        jnt_type=s(m.jnt_type), jnt_qposadr=s(m.jnt_qposadr),
        jnt_dofadr=s(m.jnt_dofadr), jnt_bodyid=s(m.jnt_bodyid),
        jnt_limited=s(m.jnt_limited),
        dof_bodyid=s(m.dof_bodyid), dof_jntid=s(m.dof_jntid),
        dof_parentid=s(m.dof_parentid),
        ancestor_mask=s(_ancestor_mask(m.dof_parentid, m.nv)),
        body_dof_mask=s(_body_dof_mask(m)),
        tree=_tree_meta(m.dof_parentid),
        geom_type=s(m.geom_type), geom_bodyid=s(m.geom_bodyid),
        geom_condim=s(m.geom_condim), geom_priority=s(m.geom_priority),
        geom_fluid_active=s(np.asarray(m.geom_fluid)[:, 0] != 0),
        site_bodyid=s(m.site_bodyid),
        ten_adr=s(m.tendon_adr), ten_num=s(m.tendon_num),
        wrap_jntid=s(wrap_jntid),
        actuator_trntype=s(m.actuator_trntype),
        actuator_dyntype=s(m.actuator_dyntype),
        actuator_gaintype=s(m.actuator_gaintype),
        actuator_biastype=s(m.actuator_biastype),
        actuator_trnid=s(m.actuator_trnid),
        actuator_actadr=s(m.actuator_actadr),
        actuator_ctrllimited=s(m.actuator_ctrllimited),
        actuator_forcelimited=s(m.actuator_forcelimited),
        sensor_type=s(sensor_type), sensor_objid=s(m.sensor_objid),
        sensor_objtype=s(m.sensor_objtype),
        sensor_adr=s(m.sensor_adr), sensor_dim=s(m.sensor_dim),
        pair_geom1=s(pair_g1), pair_geom2=s(pair_g2),
        pair_type=Static(np.array(pair_types, dtype=np.int32).reshape(-1, 2)),
        con_dim=s(np.array(con_dim, dtype=np.int32)),
        con_sel=tuple(sorted((con_sel or {}).items())),
        fused_sel=tuple(fused_sel),
        names=_names(m),
        nccd=nccd, ccd_budget=ccd_budget_eff,
        ccd_classes=tuple(ccd_classes),
        ccd_iters=int(ccd_iters),
        ccd_geom1=s(ccd_g1), ccd_geom2=s(ccd_g2),
        ccd_b1=s(np.asarray(m.geom_bodyid)[ccd_g1].astype(np.int32)),
        ccd_b2=s(np.asarray(m.geom_bodyid)[ccd_g2].astype(np.int32)),
        ccd_rbsum=s(np.array(ccd_rbsum, dtype=np.float64)),
        col_refresh=int(col_refresh),
        opt=opt,
        qpos0=a(m.qpos0), qpos_spring=a(m.qpos_spring),
        body_pos=a(m.body_pos), body_quat=a(m.body_quat),
        body_ipos=a(m.body_ipos), body_iquat=a(m.body_iquat),
        body_mass=a(m.body_mass), body_subtreemass=a(m.body_subtreemass),
        body_inertia=a(m.body_inertia),
        body_invweight0=a(m.body_invweight0),
        jnt_pos=a(m.jnt_pos), jnt_axis=a(m.jnt_axis),
        jnt_range=a(m.jnt_range), jnt_stiffness=a(m.jnt_stiffness),
        jnt_solref=a(m.jnt_solref), jnt_solimp=a(m.jnt_solimp),
        jnt_margin=a(m.jnt_margin),
        dof_armature=a(m.dof_armature), dof_damping=a(m.dof_damping),
        dof_frictionloss=a(m.dof_frictionloss),
        dof_invweight0=a(m.dof_invweight0),
        geom_pos=a(m.geom_pos), geom_quat=a(m.geom_quat),
        geom_size=a(m.geom_size), geom_friction=a(m.geom_friction),
        geom_solref=a(m.geom_solref), geom_solimp=a(m.geom_solimp),
        geom_solmix=a(m.geom_solmix),
        geom_margin=a(m.geom_margin), geom_gap=a(m.geom_gap),
        geom_fluid=a(m.geom_fluid),
        site_pos=a(m.site_pos), site_quat=a(m.site_quat),
        site_size=a(m.site_size),
        ten_stiffness=a(m.tendon_stiffness), ten_damping=a(m.tendon_damping),
        ten_lengthspring=a(m.tendon_lengthspring),
        ten_invweight0=a(m.tendon_invweight0),
        wrap_coef=a(m.wrap_prm),
        actuator_dynprm=a(m.actuator_dynprm),
        actuator_gainprm=a(m.actuator_gainprm),
        actuator_biasprm=a(m.actuator_biasprm),
        actuator_ctrlrange=a(m.actuator_ctrlrange),
        actuator_forcerange=a(m.actuator_forcerange),
        actuator_gear=a(m.actuator_gear),
        actuator_acc0=a(m.actuator_acc0),
        hfield_data=(a(np.concatenate([
            m.hfield_data[m.hfield_adr[i]:
                          m.hfield_adr[i] + m.hfield_nrow[i] * m.hfield_ncol[i]
                          ].reshape(m.hfield_nrow[i], m.hfield_ncol[i])[None]
            for i in range(m.nhfield)]))
            if m.nhfield else jnp.zeros((0, 0, 0), dtype=dtype)),
        hfield_size=(a(m.hfield_size) if m.nhfield
                     else jnp.zeros((0, 4), dtype=dtype)),
        con_solref=(a(np.stack(con_solref)) if con_solref
                    else jnp.zeros((0, 2), dtype=dtype)),
        con_solimp=(a(np.stack(con_solimp)) if con_solimp
                    else jnp.zeros((0, 5), dtype=dtype)),
        con_friction=(a(np.stack(con_fric)) if con_fric
                      else jnp.zeros((0, 5), dtype=dtype)),
        con_includemargin=(a(np.array(con_incmargin)) if con_incmargin
                           else jnp.zeros((0,), dtype=dtype)),
        con_margin=(a(np.array(con_margin_l)) if con_margin_l
                    else jnp.zeros((0,), dtype=dtype)),
        ccd_core=(a(np.stack(ccd_core)) if nccd
                  else jnp.zeros((0, 10), dtype=dtype)),
        ccd_solref=(a(np.stack(ccd_solref_l)) if nccd
                    else jnp.zeros((0, 2), dtype=dtype)),
        ccd_solimp=(a(np.stack(ccd_solimp_l)) if nccd
                    else jnp.zeros((0, 5), dtype=dtype)),
        ccd_mu=(a(np.array(ccd_mu_l)) if nccd
                else jnp.zeros((0,), dtype=dtype)),
        ccd_includemargin=(a(np.array(ccd_margin_ll)) if nccd
                           else jnp.zeros((0,), dtype=dtype)),
        ccd_margin=(a(np.array(ccd_margin_ll)) if nccd
                    else jnp.zeros((0,), dtype=dtype)),
    )


def make_data(model: Model, B: int = 1, dtype=None) -> Data:
    """Fresh batched Data (trailing batch axis B) at qpos0, zero velocity."""
    dtype = dtype or model.qpos0.dtype
    z = lambda *shape: jnp.zeros(shape + (B,), dtype=dtype)
    nv, nbody, nq = model.nv, model.nbody, model.nq
    ncon = model.ncon_max
    nM = model.tree.nM
    ident = jnp.zeros((nbody, 4, B), dtype=dtype).at[:, 0].set(1.0)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None, :, :, None],
                            (nbody, 3, 3, B))
    ksum = _ksum(model)
    contact = Contact(
        sel=jnp.zeros((ksum, B), jnp.int32),
        dist=jnp.full((ksum, B), 1e10, dtype=dtype),
        pos=z(ksum, 3), frame=z(ksum, 3, 3),
        k=z(ksum), b=z(ksum), R=jnp.full((ksum, B), 1.0, dtype=dtype),
        mu=z(ksum), invw=z(ksum),
        margin=z(ksum), marginfull=z(ksum),
        b1=jnp.zeros((ksum, B), jnp.int32),
        b2=jnp.zeros((ksum, B), jnp.int32),
        g1=jnp.zeros((ksum, B), jnp.int32),
        g2=jnp.zeros((ksum, B), jnp.int32),
        typ=jnp.full((ksum, B), -1, jnp.int32),
        sub=jnp.zeros((ksum, B), jnp.int32),
        solref=z(ksum, 2), solimp=z(ksum, 5),
    )
    return Data(
        qpos=jnp.broadcast_to(
            jnp.asarray(model.qpos0, dtype=dtype)[:, None], (nq, B)),
        qvel=z(nv),
        act=z(model.na), ctrl=z(model.nu),
        qfrc_applied=z(nv), xfrc_applied=z(nbody, 6),
        time=jnp.zeros((B,), dtype=dtype),
        xpos=z(nbody, 3), xquat=ident,
        xmat=eye3, xipos=z(nbody, 3), ximat=eye3,
        xanchor=z(model.njnt, 3), xaxis=z(model.njnt, 3),
        geom_xpos=z(model.ngeom, 3),
        geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None, :, :, None],
                                   (model.ngeom, 3, 3, B)),
        site_xpos=z(model.nsite, 3),
        site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None, :, :, None],
                                   (model.nsite, 3, 3, B)),
        subtree_com=z(nbody, 3), cinert=z(nbody, 10), cdof=z(nv, 6),
        ten_length=z(model.ntendon),
        qM=z(nM), qLD=z(nM), qLDiagInv=z(nv), contact=contact,
        cvel=z(nbody, 6), cdof_dot=z(nv, 6),
        ten_velocity=z(model.ntendon),
        qfrc_bias=z(nv), qfrc_passive=z(nv), qfrc_fluid=z(nv),
        actuator_length=z(model.nu), actuator_velocity=z(model.nu),
        actuator_force=z(model.nu),
        act_dot=z(model.na), qfrc_actuator=z(nv),
        qfrc_smooth=z(nv), qacc_smooth=z(nv),
        qfrc_constraint=z(nv), qacc=z(nv),
        warm_sel=jnp.zeros((_ksum(model), B), jnp.int32),
        warm_f=z(_ksum(model), 3),
        warm_lim=z(_nlimit(model)),
        qLDh=z(model.tree.nM), qLDiagInvh=z(nv),
        apgd_v=jnp.ones((_fused_r(model), B), dtype=dtype),
        sol_lim_sel=jnp.zeros((_fused_sel_dims(model)[0], B), jnp.int32),
        sol_cone_sel=jnp.zeros((_fused_sel_dims(model)[1], B), jnp.int32),
        sol_f=z(_fused_r(model)),
        ccd_warm_id=jnp.full((model.ccd_budget, B), -1, jnp.int32),
        ccd_warm_u=z(model.ccd_budget, 3),
        ccd_lane_tab=z(model.ccd_budget, 25),
        sensordata=z(model.nsensordata),
    )


def _ksum(model: Model) -> int:
    from flybody_tpu.physics import constraint as C
    return sum(k for _, k in C.efc_meta(model).groups)


def _nlimit(model: Model) -> int:
    from flybody_tpu.physics import constraint as C
    return len(C.efc_meta(model).limit_ids)


def _fused_r(model: Model) -> int:
    """Total fused-solver row count R (0 when the fused path is off)."""
    if model.opt.contact_solver != "fused":
        return 0
    from flybody_tpu.physics import constraint as C
    from flybody_tpu.physics import solver_fused as SF
    return SF.fused_layout(model, C.efc_meta(model))["R"]


def _fused_sel_dims(model: Model) -> tuple[int, int]:
    """(n_lim, k_cone) of the fused solver's row selection (0, 0 off)."""
    if model.opt.contact_solver != "fused":
        return 0, 0
    from flybody_tpu.physics import constraint as C
    from flybody_tpu.physics import solver_fused as SF
    lay = SF.fused_layout(model, C.efc_meta(model))
    return lay["n_lim"], lay["k_cone"]


def unbatch(x):
    """Strip the trailing batch axis (per-env view of batched pytrees)."""
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a)[..., 0], x)


def batch1(x):
    """Add a trailing batch axis of size 1 to every leaf."""
    import jax

    return jax.tree_util.tree_map(lambda a: jnp.asarray(a)[..., None], x)


def qm_dense(model: Model, d: Data) -> jnp.ndarray:
    """Dense symmetric (nv, nv, B) view of the compressed mass matrix."""
    from flybody_tpu.ops import tree_ldl as TL

    return TL.sparse_to_dense(model.tree, d.qM)


def set_state(d: Data, **kw) -> Data:
    """Test/host helper: set per-env state columns on a B=1 batched Data.

    Accepts unbatched (mjData-shaped) arrays and adds the trailing batch
    axis. Example: ``set_state(d, qpos=mjd.qpos, qvel=mjd.qvel)``.
    """
    upd = {k: jnp.asarray(np.asarray(v), d.qpos.dtype)[..., None]
           for k, v in kw.items()}
    return d.replace(**upd)
