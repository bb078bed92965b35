"""Sensor evaluation (accelerometer, gyro, velocimeter, force, touch, ...).

Covers the fly's sensor suite (reference fruitfly MJCF sensors block:
thorax accelerometer/gyro/velocimeter, 6 tarsus force, 6 claw touch) plus
generic joint/frame/tendon sensors used by tasks. Acceleration-dependent
sensors use a post-constraint RNE sweep (cacc / cfrc_int) equivalent to
MuJoCo's mj_rnePostConstraint, built from the same level-parallel passes
as the smooth stage. Batch-native: all arrays carry the trailing env axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.physics import smooth as S
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


def _contact_body_forces(m: Model, d: Data) -> jnp.ndarray:
    """(nbody, 6, B) spatial contact forces (at com-root origin, world
    frame) accumulated from the solver's compact selected forces — a small
    (Ksum-sized) gather/one-hot pass, never an all-candidate-slot sweep."""
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    out = jnp.zeros((m.nbody, 6, B), dtype=dtype)
    if m.ncon_max == 0 or d.warm_sel.shape[0] == 0:
        return out
    con = d.contact
    # contact rows align 1:1 with warm_f rows (the solver writes warm_f
    # over the same selected islands)
    frame, pos, b1, b2 = con.frame, con.pos, con.b1, con.b2
    # world-frame force on body2 (normal points g1 -> g2; positive normal
    # force pushes the bodies apart, i.e. acts along -normal on body2)
    F = -jnp.einsum("cdkB,cdB->ckB", frame, d.warm_f)    # (Ksum, 3, B)
    root = np.asarray(m.body_rootid)
    com_root = d.subtree_com[root]                       # (nbody, 3, B)
    # one-hot accumulation over bodies (Ksum x nbody is tiny)
    oh2 = (b2[:, None, :] == jnp.arange(m.nbody)[None, :, None]
           ).astype(dtype)                               # (Ksum, nbody, B)
    oh1 = (b1[:, None, :] == jnp.arange(m.nbody)[None, :, None]
           ).astype(dtype)
    com2 = jnp.einsum("kbB,bcB->kcB", oh2, com_root)
    com1 = jnp.einsum("kbB,bcB->kcB", oh1, com_root)
    r2 = pos - com2
    r1 = pos - com1
    lin = jnp.einsum("kbB,kdB->bdB", oh2, F) - jnp.einsum(
        "kbB,kdB->bdB", oh1, F)
    ang = (jnp.einsum("kbB,kdB->bdB", oh2, bq.cross(r2, F))
           - jnp.einsum("kbB,kdB->bdB", oh1, bq.cross(r1, F)))
    return out.at[:, 3:].add(lin).at[:, :3].add(ang)


_SUBTREE_CACHE: dict = {}


def _subtree_pairs(m: Model):
    """Static (ancestor_body, descendant_body) pairs (incl. self)."""
    key = T.static_key(m.body_parentid)
    if key not in _SUBTREE_CACHE:
        par = np.asarray(m.body_parentid)
        anc_l, desc_l = [], []
        for b in range(m.nbody):
            cur = b
            while True:
                anc_l.append(cur)
                desc_l.append(b)
                if cur == 0:
                    break
                cur = par[cur]
        _SUBTREE_CACHE[key] = (np.asarray(anc_l, np.int32),
                               np.asarray(desc_l, np.int32))
    return _SUBTREE_CACHE[key]


_SUBTREE_MAT_CACHE: dict = {}


def subtree_sum(m: Model, x: jnp.ndarray) -> jnp.ndarray:
    """out[a] = sum over descendants-or-self b of x[b], as ONE matmul.

    The scatter-add formulation (`zeros.at[anc].add(x[desc])`) lowers to
    serialized per-element scatters on TPU (~1 ms per call at B=4096);
    the static (nbody, nbody) ancestor matrix maps it onto the MXU.
    HIGHEST precision keeps f32-exact accumulation (0/1 matrix entries
    are exact in every pass of the bf16x6 decomposition)."""
    key = T.static_key(m.body_parentid)
    if key not in _SUBTREE_MAT_CACHE:
        anc, desc = _subtree_pairs(m)
        A = np.zeros((m.nbody, m.nbody), np.float32)
        A[anc, desc] = 1.0
        _SUBTREE_MAT_CACHE[key] = A
    A = jnp.asarray(_SUBTREE_MAT_CACHE[key], x.dtype)
    return jnp.einsum("ab,b...B->a...B", A, x,
                      precision=jax.lax.Precision.HIGHEST)


def rne_postconstraint(m: Model, d: Data):
    """cacc (nbody, 6, B) and cfrc_int (nbody, 6, B) given solved qacc.

    Tree sweeps flattened into static support/subtree pair scatter-adds
    (no sequential level loops in the substep hot path)."""
    contrib = d.cdof_dot * d.qvel[:, None, :] + d.cdof * d.qacc[:, None, :]
    cacc = S.body_cacc(m, d, contrib)

    cfrc_ext = _contact_body_forces(m, d)
    root = np.asarray(m.body_rootid)
    offset = d.xipos - d.subtree_com[root]
    force = d.xfrc_applied[:, :3]
    torque = d.xfrc_applied[:, 3:]
    cfrc_ext = cfrc_ext.at[:, :3].add(torque + bq.cross(offset, force))
    cfrc_ext = cfrc_ext.at[:, 3:].add(force)

    from flybody_tpu.physics.kinematics import mul_inertia
    Iv = mul_inertia(d.cinert, d.cvel)
    leaf = mul_inertia(d.cinert, cacc) + S.force_cross(d.cvel, Iv) - cfrc_ext
    cfrc_int = subtree_sum(m, leaf)
    return cacc, cfrc_int


def _spatial_at_point(vec6, origin, point):
    """Translate spatial (ang, lin) vector from `origin` to `point`."""
    ang = vec6[..., :3, :]
    lin = vec6[..., 3:, :] + bq.cross(ang, point - origin)
    return ang, lin


def sensor(m: Model, d: Data) -> Data:
    """Evaluate all sensors into sensordata (nsensordata, B)."""
    if m.nsensor == 0:
        return d
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    out = jnp.zeros((m.nsensordata, B), dtype=dtype)

    types = np.asarray(m.sensor_type)
    objid = np.asarray(m.sensor_objid)
    adr = np.asarray(m.sensor_adr)

    need_acc = np.any((types == T.SENS_ACCELEROMETER)
                      | (types == T.SENS_FORCE)
                      | (types == T.SENS_TORQUE))
    cacc = cfrc_int = None
    if need_acc:
        cacc, cfrc_int = rne_postconstraint(m, d)

    root = np.asarray(m.body_rootid)
    site_body = np.asarray(m.site_bodyid)

    for i in range(m.nsensor):
        st, oid, a = int(types[i]), int(objid[i]), int(adr[i])
        if st in (T.SENS_GYRO, T.SENS_VELOCIMETER, T.SENS_ACCELEROMETER,
                  T.SENS_FORCE, T.SENS_TORQUE):
            b = site_body[oid]
            com = d.subtree_com[root[b]]
            p = d.site_xpos[oid]
            R = d.site_xmat[oid]                      # (3, 3, B)
            ang_w, lin_w = _spatial_at_point(d.cvel[b], com, p)
            if st == T.SENS_GYRO:
                out = out.at[a:a + 3].set(bq.matvec_t(R, ang_w))
            elif st == T.SENS_VELOCIMETER:
                out = out.at[a:a + 3].set(bq.matvec_t(R, lin_w))
            elif st == T.SENS_ACCELEROMETER:
                aang, alin = _spatial_at_point(cacc[b], com, p)
                alin = alin + bq.cross(ang_w, lin_w)
                out = out.at[a:a + 3].set(bq.matvec_t(R, alin))
            elif st == T.SENS_FORCE:
                # interaction force on the body subtree, at site
                out = out.at[a:a + 3].set(bq.matvec_t(R, cfrc_int[b, 3:]))
            else:  # TORQUE: subtree torque translated from com to site
                trq = cfrc_int[b, :3] - bq.cross(p - com, cfrc_int[b, 3:])
                out = out.at[a:a + 3].set(bq.matvec_t(R, trq))
        elif st == T.SENS_TOUCH:
            b = site_body[oid]
            val = jnp.zeros((B,), dtype)
            if m.ncon_max:
                from flybody_tpu.physics.actuation import _slot_bodies
                from flybody_tpu.physics.constraint import \
                    selected_force_mask
                b1s, b2s = _slot_bodies(m)
                on = np.nonzero((b1s == b) | (b2s == b))[0]
                if len(on):
                    mask = selected_force_mask(d.warm_sel, on).astype(dtype)
                    val = jnp.sum(d.warm_f[:, 0] * mask, axis=0)
            out = out.at[a].set(jnp.maximum(val, 0.0))
        elif st == T.SENS_JOINTPOS:
            out = out.at[a].set(d.qpos[np.asarray(m.jnt_qposadr)[oid]])
        elif st == T.SENS_JOINTVEL:
            out = out.at[a].set(d.qvel[np.asarray(m.jnt_dofadr)[oid]])
        elif st == T.SENS_ACTUATORFRC:
            out = out.at[a].set(d.actuator_force[oid])
        elif st in (T.SENS_FRAMEPOS, T.SENS_FRAMEQUAT, T.SENS_FRAMEZAXIS):
            objtype = int(np.asarray(m.sensor_objtype)[i])
            if objtype == 6:       # mjOBJ_SITE
                pos, mat = d.site_xpos[oid], d.site_xmat[oid]
            elif objtype == 5:     # mjOBJ_GEOM
                pos, mat = d.geom_xpos[oid], d.geom_xmat[oid]
            else:                  # mjOBJ_BODY / mjOBJ_XBODY
                pos, mat = d.xpos[oid], d.xmat[oid]
            if st == T.SENS_FRAMEPOS:
                out = out.at[a:a + 3].set(pos)
            elif st == T.SENS_FRAMEZAXIS:
                out = out.at[a:a + 3].set(mat[:, 2])
            else:
                out = out.at[a:a + 4].set(bq.from_mat(mat))
        elif st == T.SENS_SUBTREECOM:
            out = out.at[a:a + 3].set(d.subtree_com[oid])
        elif st == T.SENS_SUBTREELINVEL:
            off = d.xipos - d.subtree_com[root]
            vcom = d.cvel[:, 3:] + bq.cross(d.cvel[:, :3], off)
            mom = m.body_mass[:, None, None] * vcom
            anc, desc = _subtree_pairs(m)
            acc = jnp.zeros_like(mom).at[anc].add(mom[desc])
            out = out.at[a:a + 3].set(
                acc[oid] / jnp.maximum(m.body_subtreemass[oid], 1e-12))
        elif st == T.SENS_TENDONPOS:
            out = out.at[a].set(d.ten_length[oid])
        elif st == T.SENS_TENDONVEL:
            out = out.at[a].set(d.ten_velocity[oid])
    return d.replace(sensordata=out)
