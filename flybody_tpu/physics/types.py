"""Core pytree types of the TPU-native physics engine.

Design (TPU-first, not a port):

* ``Model`` is a pytree whose *numeric parameters* (masses, inertias, gains,
  spring constants, geometry sizes, ...) are JAX arrays — they are traced
  under jit so they can be domain-randomized without retracing — while
  *structural metadata* (tree topology, joint types, index tables, candidate
  collision pairs, the sparse mass-matrix layout) is static numpy carried as
  pytree aux data. Static structure is what lets the compiler unroll the
  kinematic tree into a fixed level-parallel schedule with static gathers.

* ``Data`` is the dynamic state of a whole BATCH of environments: every
  array carries a trailing batch axis B (``qpos (nq, B)``, ``xpos
  (nbody, 3, B)``, ...). The engine is natively batched — there is no vmap
  in the hot path. The trailing batch axis maps onto TPU vector lanes, so
  each scalar operation of the classical algorithms becomes one full-width
  VPU op; materialized intermediates tile with no lane padding (the round-1
  engine used vmap with leading batch, which tiles (B, n, 3) tensors at up
  to 42x bandwidth waste — the dominant cost of the 968 steps/s round-1
  bench).

* The joint-space inertia is stored COMPRESSED (``qM (nM, B)`` over the
  kinematic-tree sparsity pattern, nM = 586 vs 5565 dense for the fly) and
  factorized with a level-parallel sparse LDL^T (``ops/tree_ldl``) — ~87x
  fewer FLOPs than the dense Cholesky and no (nv, nv, B) traffic.

Per-env task/observation code still runs unchanged: entity-major shapes are
preserved ahead of the batch axis, so ``jax.vmap(fn, in_axes=-1)`` presents
the familiar single-env view (see envs/core.py).

Semantics follow the MuJoCo computation pipeline (the reference framework
delegates all physics to MuJoCo C via dm_control; see SURVEY.md L0 and
reference vnl_ray/fruitfly/fruitfly.py:12-19) but the implementation here is
an independent, functional JAX design validated numerically against the
MuJoCo oracle in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

# Joint types (mjtJoint order kept for converter simplicity).
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# Geom types we support (subset of mjtGeom, same codes).
GEOM_PLANE = 0
GEOM_HFIELD = 1
GEOM_SPHERE = 2
GEOM_CAPSULE = 3
GEOM_ELLIPSOID = 4
GEOM_CYLINDER = 5
GEOM_BOX = 6
GEOM_MESH = 7

# Actuator dynamics / gain / bias types (mjt* codes).
DYN_NONE = 0
DYN_INTEGRATOR = 1
DYN_FILTER = 2
DYN_FILTEREXACT = 3
GAIN_FIXED = 0
GAIN_AFFINE = 1
BIAS_NONE = 0
BIAS_AFFINE = 1
# Transmission types.
TRN_JOINT = 0
TRN_TENDON = 3
TRN_BODY = 5  # adhesion

# Friction cone.
CONE_PYRAMIDAL = 0
CONE_ELLIPTIC = 1

# Integrators.
EULER = 0
RK4 = 1
IMPLICIT = 2

# Sensor types (own enum, independent of mjtSensor codes).
SENS_ACCELEROMETER = 0
SENS_GYRO = 1
SENS_VELOCIMETER = 2
SENS_FORCE = 3
SENS_TOUCH = 4
SENS_JOINTPOS = 5
SENS_JOINTVEL = 6
SENS_ACTUATORFRC = 7
SENS_FRAMEPOS = 8
SENS_FRAMEQUAT = 9
SENS_SUBTREECOM = 10
SENS_TENDONPOS = 11
SENS_TENDONVEL = 12
SENS_SUBTREELINVEL = 13
SENS_FRAMEZAXIS = 14
SENS_TORQUE = 15


class Static(np.ndarray):
    """Numpy array usable as static pytree aux data (hashable by content)."""

    def __new__(cls, a):
        return np.asarray(a).view(cls)

    def __hash__(self):  # type: ignore[override]
        return hash((self.shape, self.dtype.str, self.tobytes()))

    def __eq__(self, other):  # type: ignore[override]
        if isinstance(other, np.ndarray):
            return (
                self.shape == other.shape
                and np.asarray(self).tobytes() == np.asarray(other).tobytes()
            )
        return NotImplemented

    def __ne__(self, other):  # type: ignore[override]
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


def static_key(*arrays) -> tuple:
    """Content-based cache key for static-plan caches.

    Plans derived from a Model's static numpy structure must NOT be keyed
    on ``id(array)``: CPython reuses object ids after garbage collection,
    so two different models built in one process can silently collide
    (observed as cross-test plan corruption once Contact row counts became
    model-dependent). Key on content instead — plan builders run at trace
    time only, so hashing the small structure arrays is free.
    """
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
        elif isinstance(a, dict):
            out.append(tuple(sorted(a.items())))
        else:
            a = np.asarray(a)
            out.append((a.shape, a.dtype.str, a.tobytes()))
    return tuple(out)


def pytree(meta: tuple[str, ...] = ()):
    """Decorator: dataclass registered as pytree with given static fields."""

    def wrap(cls):
        cls = dataclasses.dataclass(frozen=False, repr=False)(cls)
        fields = [f.name for f in dataclasses.fields(cls)]
        data = [f for f in fields if f not in meta]
        cls.replace = lambda self, **kw: dataclasses.replace(self, **kw)
        return _register(cls, data, meta)

    return wrap


@pytree(meta=("integrator", "cone", "solver_iterations", "ls_iterations",
              "noslip_iterations", "has_fluid", "contact_solver"))
class Option:
    """Simulation options (mjOption subset)."""

    timestep: jax.Array
    gravity: jax.Array          # (3,)
    density: jax.Array          # fluid medium density
    viscosity: jax.Array
    wind: jax.Array             # (3,)
    impratio: jax.Array
    tolerance: jax.Array
    # static:
    integrator: int
    cone: int
    solver_iterations: int
    ls_iterations: int
    noslip_iterations: int
    has_fluid: bool
    contact_solver: str = "apgd"   # "apgd" (matrix-free) | "admm" (dense)


_MODEL_META = (
    # sizes
    "nq", "nv", "nu", "na", "nbody", "njnt", "ngeom", "nsite", "ntendon",
    "nwrap", "nsensor", "nsensordata", "ncon_max", "nefc",
    # structure (Static numpy)
    "body_parentid", "body_rootid", "body_jntadr", "body_jntnum",
    "body_dofadr", "body_dofnum", "body_geomadr", "body_geomnum",
    "body_tree",  # tuple of Static arrays: bodies per depth level
    "jnt_type", "jnt_qposadr", "jnt_dofadr", "jnt_bodyid", "jnt_limited",
    "dof_bodyid", "dof_jntid", "dof_parentid", "ancestor_mask",
    "body_dof_mask",
    "tree",       # ops/tree_ldl.TreeMeta: sparse M layout + schedules
    "geom_type", "geom_bodyid", "geom_condim", "geom_priority",
    "geom_fluid_active",
    "site_bodyid",
    "ten_adr", "ten_num", "wrap_jntid",
    "actuator_trntype", "actuator_dyntype", "actuator_gaintype",
    "actuator_biastype", "actuator_trnid", "actuator_actadr",
    "actuator_ctrllimited", "actuator_forcelimited",
    "sensor_type", "sensor_objid", "sensor_objtype", "sensor_adr",
    "sensor_dim",
    "pair_geom1", "pair_geom2", "pair_type",  # candidate collision pairs
    "con_dim",  # per-contact-slot condim (static, from pair geoms)
    "con_sel",  # ((condim, K) ...) active-island sizes per condim group
    "fused_sel",  # (limit rows, cones) solver-active budgets (fused path)
    "names",
    "nhfield", "hfield_nrow", "hfield_ncol",
    # gated exact-convex (ccd) pair tables
    "nccd", "ccd_budget", "ccd_classes", "ccd_iters",
    "ccd_geom1", "ccd_geom2", "ccd_b1", "ccd_b2", "ccd_rbsum",
    "col_refresh",
)


@pytree(meta=_MODEL_META)
class Model:
    """Static model description + numeric parameters (see module docstring).

    Mirrors the information content of mjModel for the supported feature set:
    free/ball/slide/hinge joints, primitive geoms + heightfields, fixed
    tendons, general/adhesion actuators with filter dynamics, inertia-box and
    ellipsoid fluid models, elliptic/pyramidal friction cones.
    """

    # ---- sizes (static) ----
    nq: int; nv: int; nu: int; na: int
    nbody: int; njnt: int; ngeom: int; nsite: int
    ntendon: int; nwrap: int; nsensor: int; nsensordata: int
    ncon_max: int; nefc: int
    nhfield: int; hfield_nrow: int; hfield_ncol: int

    # ---- structure (static numpy) ----
    body_parentid: Static; body_rootid: Static
    body_jntadr: Static; body_jntnum: Static
    body_dofadr: Static; body_dofnum: Static
    body_geomadr: Static; body_geomnum: Static
    body_tree: tuple  # tuple[Static]: body ids grouped by tree depth (>=1)
    jnt_type: Static; jnt_qposadr: Static; jnt_dofadr: Static
    jnt_bodyid: Static; jnt_limited: Static
    dof_bodyid: Static; dof_jntid: Static; dof_parentid: Static
    ancestor_mask: Static  # (nv, nv) bool: j is ancestor-or-self dof of i
    body_dof_mask: Static  # (nbody, nv) bool: dof supports body
    tree: Any              # TreeMeta (static; identity-hashed)
    geom_type: Static; geom_bodyid: Static
    geom_condim: Static; geom_priority: Static
    geom_fluid_active: Static  # (ngeom,) bool: ellipsoid fluid model on
    site_bodyid: Static
    ten_adr: Static; ten_num: Static; wrap_jntid: Static
    actuator_trntype: Static; actuator_dyntype: Static
    actuator_gaintype: Static; actuator_biastype: Static
    actuator_trnid: Static; actuator_actadr: Static
    actuator_ctrllimited: Static; actuator_forcelimited: Static
    sensor_type: Static; sensor_objid: Static; sensor_objtype: Static
    sensor_adr: Static; sensor_dim: Static
    pair_geom1: Static; pair_geom2: Static; pair_type: Static
    con_dim: Static
    con_sel: tuple
    fused_sel: tuple
    names: Any  # dict of name tables (static)
    # ---- gated exact-convex (ccd) pairs: every candidate pair whose
    # narrowphase needs the support-minimization solver (physics/ccd.py:
    # ellipsoid/cylinder vs sphere/capsule/ellipsoid/cylinder). Cheap
    # bounding-sphere distances gate the nccd candidates down to
    # ccd_budget lanes per env before the solver runs. ----
    nccd: int
    ccd_budget: int            # total selected lanes (sum over classes)
    # per kink-structure class (fewer PGD candidate runs for smoother
    # classes — ccd.minimize_support): (ax1, ax2, start, n, budget)
    # over the class-major-sorted pair tables below
    ccd_classes: tuple
    ccd_iters: int             # PGD iterations per narrowphase run
    ccd_geom1: Static; ccd_geom2: Static   # (nccd,) geom ids (t1 <= t2)
    ccd_b1: Static; ccd_b2: Static         # (nccd,) body ids
    ccd_rbsum: Static                      # (nccd,) bounding-radius sum
    # contact SELECTION refresh period in substeps (production knob).
    # 1 = MuJoCo-exact (gates + top-K islands every substep). r > 1:
    # substep 0 of every r-block runs the full gated selection; the next
    # r-1 substeps recompute geometry/impedance ONLY for the already-
    # selected lanes (collision.collision_update) — the candidate set a
    # contact can enter lags by at most r-1 substeps, bounded by the
    # includemargin slack. Must divide the env's substeps-per-control-step
    # so auto-reset always lands on a refresh boundary.
    col_refresh: int

    # ---- numeric parameters (traced jnp arrays) ----
    opt: Option
    qpos0: jax.Array; qpos_spring: jax.Array
    body_pos: jax.Array; body_quat: jax.Array
    body_ipos: jax.Array; body_iquat: jax.Array
    body_mass: jax.Array; body_subtreemass: jax.Array
    body_inertia: jax.Array
    body_invweight0: jax.Array  # (nbody, 2)
    jnt_pos: jax.Array; jnt_axis: jax.Array
    jnt_range: jax.Array; jnt_stiffness: jax.Array
    jnt_solref: jax.Array; jnt_solimp: jax.Array; jnt_margin: jax.Array
    dof_armature: jax.Array; dof_damping: jax.Array
    dof_frictionloss: jax.Array; dof_invweight0: jax.Array
    geom_pos: jax.Array; geom_quat: jax.Array; geom_size: jax.Array
    geom_friction: jax.Array; geom_solref: jax.Array; geom_solimp: jax.Array
    geom_solmix: jax.Array
    geom_margin: jax.Array; geom_gap: jax.Array
    geom_fluid: jax.Array  # (ngeom, 12) ellipsoid-model params (0 => off)
    site_pos: jax.Array; site_quat: jax.Array; site_size: jax.Array
    ten_stiffness: jax.Array; ten_damping: jax.Array
    ten_lengthspring: jax.Array; ten_invweight0: jax.Array
    wrap_coef: jax.Array
    actuator_dynprm: jax.Array; actuator_gainprm: jax.Array
    actuator_biasprm: jax.Array
    actuator_ctrlrange: jax.Array; actuator_forcerange: jax.Array
    actuator_gear: jax.Array  # (nu, 6)
    actuator_acc0: jax.Array
    hfield_data: jax.Array      # (nhfield, nrow, ncol) normalized heights
    hfield_size: jax.Array      # (nhfield, 4): x, y, z_top, z_bottom
    # per-contact-slot combined params (precomputed at model conversion)
    con_solref: jax.Array       # (ncon_max, 2)
    con_solimp: jax.Array       # (ncon_max, 5)
    con_friction: jax.Array     # (ncon_max, 5)
    con_includemargin: jax.Array  # (ncon_max,)
    con_margin: jax.Array       # (ncon_max,) full margin (adhesion zone)
    # per-ccd-pair combined params + support-core geometry
    # ccd_core columns: [ell1(3), seg1, r1, ell2(3), seg2, r2]
    ccd_core: jax.Array         # (nccd, 10)
    ccd_solref: jax.Array       # (nccd, 2)
    ccd_solimp: jax.Array       # (nccd, 5)
    ccd_mu: jax.Array           # (nccd,) sliding friction
    ccd_includemargin: jax.Array  # (nccd,)
    ccd_margin: jax.Array       # (nccd,)


@pytree(meta=())
class Contact:
    """Selected active contact islands (top-K by penetration per condim
    group; row layout = constraint.efc_meta(m).groups order).

    Selection happens INSIDE collision(): the ncon_max candidate slots are
    reduced to the Ksum selected rows with one-hot einsum contractions, so
    no per-env dynamic gather of candidate-sized arrays survives anywhere
    downstream (round-2 microbench: take_along_axis over (ncand, 3, B)
    costs ~700us at B=4096 on v5e; one-hot contraction 10-50us and the
    static-table variant maps onto the MXU).

    Geometry fields are raw narrowphase outputs (dist is the signed
    geometric distance, NOT margin-adjusted); per-slot solver parameters
    (stiffness k / damping b / regularizer R from solref-solimp at the
    selected penetration) are precomputed here so the constraint stage is
    pure slicing + Jacobian assembly.
    """

    sel: jax.Array        # (Ksum, B) int32 global candidate slot id
    dist: jax.Array       # (Ksum, B) signed distance
    pos: jax.Array        # (Ksum, 3, B) midpoint contact position
    frame: jax.Array      # (Ksum, 3, 3, B): rows = normal, tangent1, tangent2
    k: jax.Array          # (Ksum, B) solref/solimp stiffness
    b: jax.Array          # (Ksum, B) solref/solimp damping
    R: jax.Array          # (Ksum, B) normal-row regularizer (1-d)/d * invw
    mu: jax.Array         # (Ksum, B) sliding friction
    invw: jax.Array       # (Ksum, B) body invweight0 sum (diag approx)
    margin: jax.Array     # (Ksum, B) includemargin of the slot
    marginfull: jax.Array  # (Ksum, B) full margin (adhesion active zone)
    b1: jax.Array         # (Ksum, B) int32 body id of geom1
    b2: jax.Array         # (Ksum, B) int32 body id of geom2
    # lane identity + impedance inputs, carried so collision_update can
    # recompute geometry/impedance for the SAME lanes on non-refresh
    # substeps (Model.col_refresh > 1) without re-running selection
    g1: jax.Array         # (Ksum, B) int32 geom id 1
    g2: jax.Array         # (Ksum, B) int32 geom id 2
    typ: jax.Array        # (Ksum, B) int32 analytic type-group id; -1 = ccd
    sub: jax.Array        # (Ksum, B) int32 sub-contact index within pair
    solref: jax.Array     # (Ksum, 2, B)
    solimp: jax.Array     # (Ksum, 5, B)


@pytree(meta=())
class Data:
    """Dynamic state of a batch of envs; MuJoCo mjData analog.

    Every array has a trailing batch axis B. ``jax.vmap(f, in_axes=-1)``
    over a Data presents per-env views with the familiar mjData shapes.
    """

    # state
    qpos: jax.Array       # (nq, B)
    qvel: jax.Array       # (nv, B)
    act: jax.Array        # (na, B)
    ctrl: jax.Array       # (nu, B)
    qfrc_applied: jax.Array  # (nv, B)
    xfrc_applied: jax.Array  # (nbody, 6, B)
    time: jax.Array       # (B,)

    # fwd_position products
    xpos: jax.Array; xquat: jax.Array; xmat: jax.Array
    xipos: jax.Array; ximat: jax.Array
    xanchor: jax.Array; xaxis: jax.Array
    geom_xpos: jax.Array; geom_xmat: jax.Array
    site_xpos: jax.Array; site_xmat: jax.Array
    subtree_com: jax.Array  # (nbody, 3, B)
    cinert: jax.Array       # (nbody, 10, B) compact spatial inertia\n    # [Ixx Iyy Izz Ixy Ixz Iyz, mc(3), m] at com-root origin (mjData layout)
    cdof: jax.Array         # (nv, 6, B)
    ten_length: jax.Array   # (ntendon, B)
    qM: jax.Array           # (nM, B) compressed (tree-sparse) inertia
    qLD: jax.Array          # (nM, B) sparse LDL^T factor (L off-diag, D diag)
    qLDiagInv: jax.Array    # (nv, B) 1/D of the factorization
    # factor of (M + h diag(damping)) for the implicit-damping Euler
    # update — computed alongside qLD in one stacked factor pass (crb)
    qLDh: jax.Array         # (nM, B)
    qLDiagInvh: jax.Array   # (nv, B)
    contact: Contact

    # fwd_velocity products
    cvel: jax.Array         # (nbody, 6, B)
    cdof_dot: jax.Array     # (nv, 6, B)
    ten_velocity: jax.Array
    qfrc_bias: jax.Array
    qfrc_passive: jax.Array
    qfrc_fluid: jax.Array

    # actuation
    actuator_length: jax.Array    # (nu, B)
    actuator_velocity: jax.Array  # (nu, B)
    actuator_force: jax.Array     # (nu, B)
    act_dot: jax.Array            # (na, B)
    qfrc_actuator: jax.Array      # (nv, B)

    # acceleration & constraints
    qfrc_smooth: jax.Array
    qacc_smooth: jax.Array
    qfrc_constraint: jax.Array
    qacc: jax.Array
    # Solved constraint forces in COMPACT selected form: the solver's
    # active islands (sum of per-condim K slots) + limit rows. A dense
    # (ncon_max, 3, B) per-slot force array would cost a large dynamic
    # scatter every substep; consumers (touch sensors, self-contact obs,
    # warm starting) use membership masks against warm_sel instead.
    warm_sel: jax.Array       # (Ksum, B) int32 selected candidate slot ids
    warm_f: jax.Array         # (Ksum, 3, B) contact force (n, t1, t2)
    warm_lim: jax.Array       # (nlimit, B) limit-row forces
    # fused-solver warm Lipschitz estimate: previous substep's power-
    # iteration eigenvector of the scaled dual operator (solver_fused).
    # The dominant eigenpair drifts slowly between substeps, so 2 warm
    # power iterations replace 4 cold ones. Derived state (not in
    # STATE_FIELDS): stale values after an auto-reset only seed the next
    # power iteration.
    apgd_v: jax.Array         # (R_fused, B)
    # within-window solver-row-selection persistence (Model.col_refresh
    # schedule): the fused solver's limit/cone top-k selections and raw
    # row forces from the previous substep. On update substeps
    # (fresh=False in constraint.solve) the solver reuses the stored
    # selection instead of re-running top_k, and warm-starts APGD from
    # sol_f directly (row order is unchanged within a window) instead of
    # the sel-matching einsums. Derived state (rebuilt at every
    # selection-refresh substep).
    sol_lim_sel: jax.Array    # (n_lim_fused, B) int32
    sol_cone_sel: jax.Array   # (k_cone_fused, B) int32
    sol_f: jax.Array          # (R_fused, B)
    # ccd narrowphase warm start: previous substep's selected lane ids
    # (global slot ids, as in contact.sel) and converged support
    # directions; lanes with |u| ~ 0 reseed from the center line.
    ccd_warm_id: jax.Array    # (ccd_budget, B) int32
    ccd_warm_u: jax.Array     # (ccd_budget, 3, B)
    # compacted per-lane static ccd params (the 25-column tab_all rows of
    # the selected lanes), written at selection refresh so non-refresh
    # substeps skip the (N, nccd, B) one-hot compaction entirely
    ccd_lane_tab: jax.Array   # (ccd_budget, 25, B)

    # sensors
    sensordata: jax.Array     # (nsensordata, B)


# Fields that constitute the true dynamical state (everything else is
# recomputed by forward()); used by env auto-reset to swap only state.
STATE_FIELDS = ("qpos", "qvel", "act", "ctrl", "qfrc_applied",
                "xfrc_applied", "time", "warm_sel", "warm_f", "warm_lim")
