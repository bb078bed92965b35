"""Collision detection: static candidate pairs + batched narrowphase.

TPU-first design: broadphase is *compile-time* — the candidate pair list is
enumerated once from the static model (contype/conaffinity masks, weld and
parent-child exclusion, same rules as MuJoCo's filter) and grouped by geom
type pair. At runtime each group is ONE batched closed-form narrowphase
kernel over (pairs, ..., B) arrays (component axis -2, trailing env batch);
every candidate pair owns fixed contact slots, inactive slots are masked by
dist >= includemargin downstream. No dynamic shapes anywhere.

Analytic primitive pairs cover plane/{sphere, capsule, ellipsoid,
cylinder, box}, hfield/{sphere, capsule}, sphere/{sphere, capsule, box},
capsule/{capsule, box}. Every ellipsoid/cylinder-vs-convex pair routes
through the gated exact narrowphase in physics/ccd.py (_ccd_stage).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.math import bquat as bq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Contact, Data, Model


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True))


def _dot(a, b):
    return jnp.sum(a * b, axis=-2, keepdims=True)


def _make_frame(n):
    """Orthonormal frame rows (k, 3, 3, B) from unit normals (k, 3, B)."""
    ax = jnp.abs(n[..., 0:1, :])
    ex = jnp.zeros_like(n).at[..., 0, :].set(1.0)
    ey = jnp.zeros_like(n).at[..., 1, :].set(1.0)
    a = jnp.where(ax < 0.5, ex, ey)
    t1 = bq.cross(n, a)
    t1 = t1 / jnp.maximum(_norm(t1), 1e-12)
    t2 = bq.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-3)


# Each narrowphase fn: (p1, M1, s1, p2, M2, s2) with p (P, 3, B),
# M (P, 3, 3, B), s (P, 3, 1) -> (dist (P, k, B), pos (P, k, 3, B),
# normal (P, k, 3, B)) with k static contacts per pair.


def _plane_sphere(p1, m1, s1, p2, m2, s2):
    n = m1[..., :, 2, :]                       # plane z axis (P, 3, B)
    dctr = _dot(n, p2 - p1)[..., 0, :]         # (P, B)
    dist = dctr - s2[..., 0, :]
    pos = p2 - n * (s2[..., 0:1, :] + 0.5 * dist[..., None, :])
    return dist[:, None], pos[:, None], n[:, None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
    n = m1[..., :, 2, :]
    axis = m2[..., :, 2, :]
    r = s2[..., 0:1, :]
    hl = s2[..., 1:2, :]
    dists, poss = [], []
    for sgn in (1.0, -1.0):
        c = p2 + sgn * hl * axis
        dd = _dot(n, c - p1) - r
        dists.append(dd[..., 0, :])
        poss.append(c - n * (r + 0.5 * dd))
    return (jnp.stack(dists, axis=1), jnp.stack(poss, axis=1),
            jnp.stack([n, n], axis=1))


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
    n = m1[..., :, 2, :]
    nl = bq.matvec_t(m2, n)                    # (P, 3, B)
    s = s2
    support_l = -(s * s * nl) / jnp.maximum(_norm(s * nl), 1e-12)
    sp = p2 + bq.matvec(m2, support_l)
    dd = _dot(n, sp - p1)
    pos = sp - 0.5 * dd * n
    return dd[..., 0, :][:, None], pos[:, None], n[:, None]


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
    """Plane vs cylinder: deepest rim points of both caps + one extra
    lower-cap rim point (stabilizes the near-upright case)."""
    n = m1[..., :, 2, :]
    a = m2[..., :, 2, :]
    r = s2[..., 0:1, :]
    h = s2[..., 1:2, :]
    na = _dot(n, a)
    u = n - na * a
    u_norm = _norm(u)
    ax = jnp.abs(a[..., 0:1, :])
    ex = jnp.zeros_like(a).at[..., 0, :].set(1.0)
    ey = jnp.zeros_like(a).at[..., 1, :].set(1.0)
    alt = jnp.where(ax < 0.5, ex, ey)
    alt = alt - _dot(alt, a) * a
    alt = alt / jnp.maximum(_norm(alt), 1e-12)
    u = jnp.where(u_norm > 1e-9, u / jnp.maximum(u_norm, 1e-12), alt)
    w = bq.cross(a, u)
    sgn = jnp.where(na > 0, -1.0, 1.0)
    c_low = p2 + sgn * h * a
    c_high = p2 - sgn * h * a
    pts = jnp.stack([
        c_low - r * u,
        c_high - r * u,
        c_low - r * (-0.5 * u + 0.8660254 * w),
    ], axis=1)                                  # (P, 3pts, 3, B)
    dd = jnp.sum(pts * n[:, None], axis=-2) - _dot(p1, n)  # (P, 3pts, B)
    pos = pts - 0.5 * dd[..., None, :] * n[:, None]
    nn = jnp.broadcast_to(n[:, None], pts.shape)
    return dd, pos, nn


def _plane_box(p1, m1, s1, p2, m2, s2):
    n = m1[..., :, 2, :]
    corners = np.array([[sx, sy, sz]
                        for sx in (-1., 1.) for sy in (-1., 1.)
                        for sz in (-1., 1.)])
    corner_l = jnp.asarray(corners, p2.dtype)[None, :, :, None] * s2[:, None]
    pts = p2[:, None] + bq.matvec(m2[:, None], corner_l)   # (P, 8, 3, B)
    dd = jnp.sum(pts * n[:, None], axis=-2) - _dot(p1, n)   # (P, 8, B)
    idx = jnp.argsort(dd, axis=1)[:, :4]                    # (P, 4, B)
    d4 = jnp.take_along_axis(dd, idx, axis=1)
    pos8 = pts - 0.5 * dd[..., None, :] * n[:, None]
    pos = jnp.take_along_axis(pos8, idx[..., None, :], axis=1)
    nn = jnp.broadcast_to(n[:, None], pos.shape)
    return d4, pos, nn


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
    dvec = p2 - p1
    L = _norm(dvec)
    n = dvec / jnp.maximum(L, 1e-12)
    dist = (L - s1[..., 0:1, :] - s2[..., 0:1, :])[..., 0, :]
    pos = p1 + n * (s1[..., 0:1, :] + 0.5 * dist[..., None, :])
    return dist[:, None], pos[:, None], n[:, None]


def _closest_on_seg(p, a, b):
    ab = b - a
    t = _dot(p - a, ab) / jnp.maximum(_dot(ab, ab), 1e-12)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def _zero_r(s):
    return jnp.concatenate([s[..., 0:1, :], jnp.zeros_like(s[..., 1:, :])],
                           axis=-2)


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
    axis = m2[..., :, 2, :]
    hl = s2[..., 1:2, :]
    a, b = p2 - hl * axis, p2 + hl * axis
    c = _closest_on_seg(p1, a, b)
    return _sphere_sphere(p1, m1, s1, c, m2, _zero_r(s2))


def _sphere_box(p1, m1, s1, p2, m2, s2):
    r = s1[..., 0:1, :]
    c = bq.matvec_t(m2, p1 - p2)
    q = jnp.clip(c, -s2, s2)
    dvec = c - q
    L = _norm(dvec)
    outside = L > 1e-9
    pen = s2 - jnp.abs(c)                      # (P, 3, B)
    amin = jnp.argmin(pen, axis=-2, keepdims=True)     # (P, 1, B)
    pen_min = jnp.take_along_axis(pen, amin, axis=-2)  # (P, 1, B)
    sgn = jnp.sign(jnp.take_along_axis(c, amin, axis=-2) + 1e-30)
    n_in = jnp.zeros_like(c)
    onehot = (jnp.arange(3)[None, :, None] == amin).astype(c.dtype)
    n_in = onehot * sgn
    n_local = jnp.where(outside, dvec / jnp.maximum(L, 1e-12), n_in)
    dist = jnp.where(outside[..., 0, :], (L - r)[..., 0, :],
                     -(pen_min + r)[..., 0, :])
    q_surf = jnp.where(outside, q, c + n_in * pen_min)
    n = bq.matvec(m2, n_local)
    pos_w = p2 + bq.matvec(m2, q_surf)
    pos = pos_w + 0.5 * dist[..., None, :] * (-n)
    return dist[:, None], pos[:, None], (-n)[:, None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
    """Capsule vs box: sphere-box tests at both caps + the segment point
    nearest the box center; keep the 2 deepest."""
    axis = m1[..., :, 2, :]
    hl = s1[..., 1:2, :]
    rs = _zero_r(s1)
    e1, e2 = p1 - hl * axis, p1 + hl * axis
    mid = _closest_on_seg(p2, e1, e2)
    ds, ps, ns = [], [], []
    for c in (e1, e2, mid):
        dd, pp, nn = _sphere_box(c, m1, rs, p2, m2, s2)
        ds.append(dd[:, 0]); ps.append(pp[:, 0]); ns.append(nn[:, 0])
    d3 = jnp.stack(ds, axis=1)                 # (P, 3, B)
    idx = jnp.argsort(d3, axis=1)[:, :2]
    d2 = jnp.take_along_axis(d3, idx, axis=1)
    pos = jnp.take_along_axis(jnp.stack(ps, axis=1), idx[..., None, :],
                              axis=1)
    nrm = jnp.take_along_axis(jnp.stack(ns, axis=1), idx[..., None, :],
                              axis=1)
    return d2, pos, nrm


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
    a1 = m1[..., :, 2, :] * s1[..., 1:2, :]
    a2 = m2[..., :, 2, :] * s2[..., 1:2, :]
    P1, Q1 = p1 - a1, p1 + a1
    P2, Q2 = p2 - a2, p2 + a2
    d1 = Q1 - P1
    d2 = Q2 - P2
    r = P1 - P2
    A = _dot(d1, d1)
    E = _dot(d2, d2)
    Bc = _dot(d1, d2)
    C = _dot(d1, r)
    F = _dot(d2, r)
    denom = jnp.maximum(A * E - Bc * Bc, 1e-12)
    s = jnp.clip((Bc * F - C * E) / denom, 0.0, 1.0)
    t = jnp.clip((Bc * s + F) / jnp.maximum(E, 1e-12), 0.0, 1.0)
    s = jnp.clip((Bc * t - C) / jnp.maximum(A, 1e-12), 0.0, 1.0)
    c1 = P1 + s * d1
    c2 = P2 + t * d2
    return _sphere_sphere(c1, m1, _zero_r(s1), c2, m2, _zero_r(s2))


def _hfield_height_normal(m: Model, hid, xy_local, size):
    """Bilinear height and normal of heightfield (local frame).

    xy_local (P, 2, B); returns h (P, B), n (P, 3, B)."""
    data = m.hfield_data[hid]
    nr, nc = m.hfield_nrow, m.hfield_ncol
    sx, sy, zt = size[0], size[1], size[2]
    fx = (xy_local[..., 0, :] / sx + 1.0) * 0.5 * (nc - 1)
    fy = (xy_local[..., 1, :] / sy + 1.0) * 0.5 * (nr - 1)
    fx = jnp.clip(fx, 0.0, nc - 1.001)
    fy = jnp.clip(fy, 0.0, nr - 1.001)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    tx, ty = fx - ix, fy - iy
    h00 = data[iy, ix]
    h01 = data[iy, ix + 1]
    h10 = data[iy + 1, ix]
    h11 = data[iy + 1, ix + 1]
    h = ((1 - ty) * ((1 - tx) * h00 + tx * h01)
         + ty * ((1 - tx) * h10 + tx * h11)) * zt
    dx = (((1 - ty) * (h01 - h00) + ty * (h11 - h10)) * zt
          / (2.0 * sx / (nc - 1)))
    dy = (((1 - tx) * (h10 - h00) + tx * (h11 - h01)) * zt
          / (2.0 * sy / (nr - 1)))
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-2)
    n = n / _norm(n)
    return h, n


def _make_hfield_sphere(m: Model, hid):
    def fn(p1, m1, s1, p2, m2, s2):
        local = bq.matvec_t(m1, p2 - p1)
        h, nl = _hfield_height_normal(m, hid, local[..., :2, :],
                                      m.hfield_size[hid])
        n = bq.matvec(m1, nl)
        dist = (local[..., 2, :] - h) * nl[..., 2, :] - s2[..., 0, :]
        pos = p2 - n * (s2[..., 0:1, :] + 0.5 * dist[..., None, :])
        return dist[:, None], pos[:, None], n[:, None]
    return fn


def _hfield_tangent_plane(m: Model, hid, p1, m1, xy):
    """World-space tangent plane (anchor point, unit normal) of the
    heightfield at local footprint xy (P, 2, B)."""
    h, nl = _hfield_height_normal(m, hid, xy, m.hfield_size[hid])
    n = bq.matvec(m1, nl)
    anchor_l = jnp.concatenate([xy, h[..., None, :]], axis=-2)
    anchor = p1 + bq.matvec(m1, anchor_l)
    return anchor, n


def _make_hfield_ellipsoid(m: Model, hid):
    """Hfield vs ellipsoid via the local tangent plane with one support
    refinement: evaluate the bilinear surface under the ellipsoid's
    deepest point and run the analytic plane-ellipsoid form there.

    Exact in the limit of terrain flat at the geom's footprint scale —
    the regime of the reference's procedural sine terrains (hills.py
    wavelengths >> geom sizes); MuJoCo's mjc_ConvexHField instead
    collides against a local triangle prism mesh (oracle comparison in
    tests/test_ccd.py::test_hfield_convex_vs_mujoco)."""

    def fn(p1, m1, s1, p2, m2, s2):
        xy = bq.matvec_t(m1, p2 - p1)[..., :2, :]
        sp = p2
        for _ in range(2):
            anchor, n = _hfield_tangent_plane(m, hid, p1, m1, xy)
            nloc = bq.matvec_t(m2, n)
            sup_l = -(s2 * s2 * nloc) / jnp.maximum(_norm(s2 * nloc), 1e-12)
            sp = p2 + bq.matvec(m2, sup_l)
            xy = bq.matvec_t(m1, sp - p1)[..., :2, :]
        anchor, n = _hfield_tangent_plane(m, hid, p1, m1, xy)
        dd = _dot(n, sp - anchor)
        pos = sp - 0.5 * dd * n
        return dd[..., 0, :][:, None], pos[:, None], n[:, None]

    return fn


def _make_hfield_cylinder(m: Model, hid):
    """Hfield vs cylinder: tangent-plane at the footprint, analytic
    plane-cylinder 3-point rim manifold, one refinement at the deepest
    witness (same approximation regime as _make_hfield_ellipsoid)."""

    def fn(p1, m1, s1, p2, m2, s2):
        xy = bq.matvec_t(m1, p2 - p1)[..., :2, :]

        def plane_pts(xy):
            anchor, n = _hfield_tangent_plane(m, hid, p1, m1, xy)
            frame = _make_frame(n)                 # rows (n, t1, t2)
            fake_m = jnp.stack([frame[..., 1, :, :], frame[..., 2, :, :],
                                frame[..., 0, :, :]], axis=-2)
            return _plane_cylinder(anchor, fake_m, s1, p2, m2, s2)

        dd, pos, nn = plane_pts(xy)
        deepest = jnp.argmin(dd, axis=1)[:, None]            # (P, 1, B)
        psel = jnp.take_along_axis(pos, deepest[..., None, :], axis=1)
        xy = bq.matvec_t(m1, psel[:, 0] - p1)[..., :2, :]
        return plane_pts(xy)

    return fn


def _make_hfield_capsule(m: Model, hid):
    sph = _make_hfield_sphere(m, hid)

    def fn(p1, m1, s1, p2, m2, s2):
        axis = m2[..., :, 2, :]
        hl = s2[..., 1:2, :]
        outs = [sph(p1, m1, s1, p2 + sgn * hl * axis, m2, _zero_r(s2))
                for sgn in (1.0, -1.0)]
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1),
                jnp.concatenate([o[2] for o in outs], axis=1))
    return fn


def _dispatch(m: Model, t1: int, t2: int):
    table = {
        (T.GEOM_PLANE, T.GEOM_SPHERE): _plane_sphere,
        (T.GEOM_PLANE, T.GEOM_CAPSULE): _plane_capsule,
        (T.GEOM_PLANE, T.GEOM_ELLIPSOID): _plane_ellipsoid,
        (T.GEOM_PLANE, T.GEOM_CYLINDER): _plane_cylinder,
        (T.GEOM_PLANE, T.GEOM_BOX): _plane_box,
        (T.GEOM_SPHERE, T.GEOM_SPHERE): _sphere_sphere,
        (T.GEOM_SPHERE, T.GEOM_CAPSULE): _sphere_capsule,
        (T.GEOM_SPHERE, T.GEOM_BOX): _sphere_box,
        (T.GEOM_CAPSULE, T.GEOM_CAPSULE): _capsule_capsule,
        (T.GEOM_CAPSULE, T.GEOM_BOX): _capsule_box,
    }
    if (t1, t2) in table:
        return table[(t1, t2)]
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_SPHERE:
        return _make_hfield_sphere(m, 0)
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_CAPSULE:
        return _make_hfield_capsule(m, 0)
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_ELLIPSOID:
        return _make_hfield_ellipsoid(m, 0)
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_CYLINDER:
        return _make_hfield_cylinder(m, 0)
    raise NotImplementedError(f"collision pair {(t1, t2)}")


def _pair_groups(m: Model):
    """Static layout shared by _narrowphase and collision_update:
    (groups dict {(t1,t2): [pair indices]} in first-occurrence order,
    slot_of_pair prefix sums)."""
    from flybody_tpu.physics.io_mj import _PAIR_NCON

    ptypes = np.asarray(m.pair_type)
    npair = ptypes.shape[0]
    groups: dict[tuple, list[int]] = {}
    for k in range(npair):
        groups.setdefault((int(ptypes[k, 0]), int(ptypes[k, 1])), []).append(k)
    slot_of_pair = np.concatenate(
        [[0], np.cumsum([_PAIR_NCON[(int(ptypes[k, 0]), int(ptypes[k, 1]))]
                         for k in range(npair)])]).astype(int)
    return groups, slot_of_pair


def _slot_identity(m: Model):
    """Static per-slot identity: (g1, g2, typ, sub) over the ncon_max
    analytic slots. typ indexes the _pair_groups order; sub is the
    sub-contact index within the pair's narrowphase output."""
    groups, slot_of_pair = _pair_groups(m)
    g1s = np.asarray(m.pair_geom1)
    g2s = np.asarray(m.pair_geom2)
    typ_of_pair = np.zeros(len(g1s), dtype=np.int32)
    for tid, (key, pidx) in enumerate(groups.items()):
        typ_of_pair[pidx] = tid
    slot_g1 = np.zeros(m.ncon_max, dtype=np.int32)
    slot_g2 = np.zeros(m.ncon_max, dtype=np.int32)
    slot_typ = np.zeros(m.ncon_max, dtype=np.int32)
    slot_sub = np.zeros(m.ncon_max, dtype=np.int32)
    for p in range(len(g1s)):
        a, b = slot_of_pair[p], slot_of_pair[p + 1]
        slot_g1[a:b] = g1s[p]
        slot_g2[a:b] = g2s[p]
        slot_typ[a:b] = typ_of_pair[p]
        slot_sub[a:b] = np.arange(b - a)
    return slot_g1, slot_g2, slot_typ, slot_sub


def _narrowphase(m: Model, d: Data):
    """All candidate pairs -> per-slot (dist (ncon, B), pos (ncon, 3, B),
    normal (ncon, 3, B)). No frames: those are built post-selection."""
    from flybody_tpu.physics.io_mj import _PAIR_NCON

    g1s = np.asarray(m.pair_geom1)
    g2s = np.asarray(m.pair_geom2)
    groups, slot_of_pair = _pair_groups(m)

    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    ncon = m.ncon_max
    dist = jnp.full((ncon, B), 1e10, dtype=dtype)
    pos = jnp.zeros((ncon, 3, B), dtype=dtype)
    nrm = jnp.zeros((ncon, 3, B), dtype=dtype).at[:, 2].set(1.0)

    for (t1, t2), pair_idx in groups.items():
        fn = _dispatch(m, t1, t2)
        k = _PAIR_NCON[(t1, t2)]
        pg1 = g1s[pair_idx]
        pg2 = g2s[pair_idx]
        p1, M1 = d.geom_xpos[pg1], d.geom_xmat[pg1]
        p2, M2 = d.geom_xpos[pg2], d.geom_xmat[pg2]
        S1 = m.geom_size[pg1][..., None].astype(dtype)
        S2 = m.geom_size[pg2][..., None].astype(dtype)
        dd, pp, nn = fn(p1, M1, S1, p2, M2, S2)
        # dd (P, k, B), pp/nn (P, k, 3, B)
        slots = np.concatenate([np.arange(slot_of_pair[pi],
                                          slot_of_pair[pi] + k)
                                for pi in pair_idx])
        dist = dist.at[slots].set(dd.reshape(-1, B))
        pos = pos.at[slots].set(pp.reshape(-1, 3, B))
        nrm = nrm.at[slots].set(nn.reshape(-1, 3, B))

    return dist, pos, nrm


def _slot_table(m: Model, dtype):
    """(ncon, 12) traced per-slot static solver params:
    [solref0, solref1, mu, invw, includemargin, marginfull, b1, b2,
    g1, g2, typ, sub] plus the (ncon, 5) solimp block. Traced (not
    numpy) so solref/solimp stay randomizable."""
    from flybody_tpu.physics.actuation import _slot_bodies
    b1s, b2s = _slot_bodies(m)
    sg1, sg2, styp, ssub = _slot_identity(m)
    invw = (m.body_invweight0[b1s, 0] + m.body_invweight0[b2s, 0])
    f = lambda x: jnp.asarray(x, dtype=m.con_includemargin.dtype)
    cols = jnp.stack([
        m.con_solref[:, 0], m.con_solref[:, 1],
        m.con_friction[:, 0], invw, m.con_includemargin, m.con_margin,
        f(b1s), f(b2s), f(sg1), f(sg2), f(styp), f(ssub),
    ], axis=1).astype(dtype)
    return cols, m.con_solimp.astype(dtype)


# Fixed iteration budget for the gated exact-convex narrowphase
# (physics/ccd.py). 32 reaches ~1e-6 relative accuracy on the fly's
# shape inventory in f64 (tests/test_ccd.py).


def ccd_gate(m: Model, d: Data, start: int, n: int, dtype) -> jnp.ndarray:
    """Center-line support-gap gate for a ccd pair segment -> (n, B).

    d_gate = |c| - h1(u) - h2(-u) along the center line u is -f(u) for
    one support direction, hence a LOWER bound of the signed distance
    (never wrongly excludes a pair). Shared between the production
    narrowphase and the measurement tools so budget measurements can
    never drift from the production gate (ADVICE round-2)."""
    seg = slice(start, start + n)
    g1 = np.asarray(m.ccd_geom1)[seg]
    g2 = np.asarray(m.ccd_geom2)[seg]
    core = m.ccd_core[seg].astype(dtype)       # (n, 10)
    c1 = d.geom_xpos[g1]                       # (n, 3, B) static gather
    c2 = d.geom_xpos[g2]
    cc = c2 - c1
    cn = jnp.sqrt(jnp.sum(cc * cc, axis=1, keepdims=True) + 1e-20)
    u = cc / cn

    def _h(R_g, u_world, half):                # support height along u
        ell = half[:, 0:3, None]
        sg = half[:, 3, None]
        r = half[:, 4, None]
        ul = jnp.einsum("njiB,njB->niB", R_g, u_world)
        au = ell * ul
        an = jnp.sqrt(jnp.sum(au * au, axis=1) + 1e-20)
        return an + sg * jnp.abs(ul[:, 2]) + r

    return (cn[:, 0] - _h(d.geom_xmat[g1], u, core[:, :5])
            - _h(d.geom_xmat[g2], -u, core[:, 5:]))


def _ccd_stage(m: Model, d: Data, dtype):
    """Gated exact-convex narrowphase, per kink-structure class.

    For each class segment (ccd_classes: smooth / one-axis / two-axis
    pair pools): conservative center-line support-gap gating selects the
    class budget of lanes per env, then ccd.narrowphase runs with the
    class's static axis flags — smooth pools pay ONE PGD run, only the
    two-axis pool pays the full candidate set (circle runs + poles +
    crosses). Returns per-class row tuples in class order, matching the
    (3, budget) groups efc_meta appends.

    The gate d_gate = |c| - h1(u) - h2(-u) along the center line u is
    -f(u) for one support direction, hence a LOWER bound of the signed
    distance (never wrongly excludes a pair) and ~4x tighter than
    bounding spheres for the fly's elongated shapes (measured: 29 vs 115
    gate-hot pairs at the standing pose)."""
    from flybody_tpu.physics import ccd as ccd_mod

    g1_all = np.asarray(m.ccd_geom1)
    g2_all = np.asarray(m.ccd_geom2)
    b1f = jnp.asarray(np.asarray(m.ccd_b1), dtype)
    b2f = jnp.asarray(np.asarray(m.ccd_b2), dtype)
    invw = (m.body_invweight0[np.asarray(m.ccd_b1), 0]
            + m.body_invweight0[np.asarray(m.ccd_b2), 0]).astype(dtype)
    tab_all = jnp.concatenate([
        m.ccd_core.astype(dtype),                      # 0:10
        m.ccd_solref.astype(dtype),                    # 10:12
        m.ccd_solimp.astype(dtype),                    # 12:17
        m.ccd_mu.astype(dtype)[:, None],               # 17
        invw[:, None],                                 # 18
        m.ccd_includemargin.astype(dtype)[:, None],    # 19
        m.ccd_margin.astype(dtype)[:, None],           # 20
        b1f[:, None], b2f[:, None],                    # 21, 22
        jnp.asarray(g1_all, dtype)[:, None],           # 23 geom1 id
        jnp.asarray(g2_all, dtype)[:, None],           # 24 geom2 id
    ], axis=1)
    # per-geom frame payload for the post-selection lane compaction:
    # gathering (N, ..., B) geom frames with per-lane indices is the one
    # pattern XLA lowers to serialized per-element gathers (measured ~12 ms
    # of the round-2 substep); two one-hot contractions — (N, npair) x
    # static table on the MXU, then (N, ngeom) x this payload — replace it
    B = d.qpos.shape[-1]
    payload_g = jnp.concatenate(
        [d.geom_xpos, d.geom_xmat.reshape(m.ngeom, 9, B)],
        axis=1)                                        # (ngeom, 12, B)
    iota_g = jnp.arange(m.ngeom, dtype=jnp.int32)[None, :, None]

    out = []
    off = 0
    for (ax1, ax2, start, n, N) in m.ccd_classes:
        seg = slice(start, start + n)
        db = ccd_gate(m, d, start, n, dtype)
        eff = db - m.ccd_includemargin[seg].astype(dtype)[:, None]
        _, top = jax.lax.top_k(-eff.T, N)      # (B, N)
        idx = top.T                            # (N, B)

        # lane compaction: static per-pair table via one (N, n) one-hot
        # MXU contraction, then per-geom frames via (N, ngeom) one-hots
        oh = (idx[:, None, :]
              == jnp.arange(n, dtype=jnp.int32)[None, :, None]
              ).astype(dtype)                  # (N, n, B)
        ts = jnp.einsum("knB,nc->kcB", oh, tab_all[seg])   # (N, 25, B)
        gg1 = jnp.round(ts[:, 23]).astype(jnp.int32)       # (N, B)
        gg2 = jnp.round(ts[:, 24]).astype(jnp.int32)
        oh1 = (gg1[:, None, :] == iota_g).astype(dtype)    # (N, ngeom, B)
        oh2 = (gg2[:, None, :] == iota_g).astype(dtype)
        f1 = jnp.einsum("kgB,gcB->kcB", oh1, payload_g)    # (N, 12, B)
        f2 = jnp.einsum("kgB,gcB->kcB", oh2, payload_g)
        p1, R1 = f1[:, :3], f1[:, 3:].reshape(N, 3, 3, B)
        p2, R2 = f2[:, :3], f2[:, 3:].reshape(N, 3, 3, B)

        mv = lambda sl: ts[:, sl]                          # (N, c, B)
        prm1 = (mv(slice(0, 3)), mv(slice(3, 4)), mv(slice(4, 5)), ax1)
        prm2 = (mv(slice(5, 8)), mv(slice(8, 9)), mv(slice(9, 10)), ax2)
        sel = (m.ncon_max + start + idx).astype(jnp.int32)

        # warm start: match this step's lanes to the previous substep's
        # lanes of the SAME class (a pair never changes class) by slot id
        # — an (N, N, B) one-hot contraction; unmatched lanes get u0 = 0
        # and reseed from the center line inside minimize_support.
        u0 = None
        if d.ccd_warm_u.shape[0]:
            old_id = d.ccd_warm_id[off:off + N]            # (N, B)
            old_u = d.ccd_warm_u[off:off + N].astype(dtype)
            hit = (sel[:, None, :] == old_id[None, :, :]).astype(dtype)
            u0 = jnp.einsum("koB,ocB->kcB", hit, old_u)
        dist, pos, nrm, nu = ccd_mod.narrowphase(
            p1, R1, prm1, p2, R2, prm2, iters=m.ccd_iters, u0=u0,
            with_nu=True)

        col = lambda i: ts[:, i]               # (N, B)
        # manifold multiplicity folds into the row regularizer: nu
        # coincident MuJoCo contacts == one row at invw/nu (ccd.manifold_nu)
        stat = jnp.stack([col(10), col(11), col(17), col(18) / nu, col(19),
                          col(20), col(21), col(22), col(23), col(24),
                          jnp.full_like(col(0), -1.0),
                          jnp.zeros_like(col(0))], axis=1)
        simp = mv(slice(12, 17))               # (N, 5, B)
        out.append((dist, pos, nrm, stat, simp, sel, ts))
        off += N
    return out


def collision(m: Model, d: Data) -> Data:
    """Narrowphase + top-K active-island selection -> selected Contact.

    Selection is per condim group (static layout from constraint.efc_meta)
    by effective distance (dist - includemargin). All per-env row moves use
    one-hot einsum contractions: contractions against B-independent static
    tables compile to MXU matmuls, and contractions against (ncand, c, B)
    payloads stream the candidate arrays exactly once.
    """
    if m.ncon_max == 0 and m.ccd_budget == 0:
        return d
    from flybody_tpu.physics.constraint import _kbi, efc_meta

    meta = efc_meta(m)
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    sel_l, dist_l, pos_l, nrm_l, stat_l, simp_l = [], [], [], [], [], []
    if m.ncon_max:
        dist_all, pos_all, nrm_all = _narrowphase(m, d)
        table, solimp_t = _slot_table(m, dtype)
        con_dim = np.asarray(m.con_dim)
        incmargin = m.con_includemargin.astype(dtype)
    for cd, K in meta.analytic_groups:
        slots = np.nonzero(con_dim == cd)[0]
        dist_g = dist_all[slots]
        if len(slots) > K:
            eff = dist_g - incmargin[slots][:, None]
            _, top = jax.lax.top_k(-eff.T, K)       # (B, K)
            sel_local = top.T                       # (K, B)
            oh = (sel_local[:, None, :]
                  == jnp.arange(len(slots))[None, :, None]).astype(dtype)
            # one streaming payload + one static MXU payload: the one-hot
            # is the dominant read at ~1k candidate slots — read it twice,
            # not five times
            dyn = jnp.concatenate(
                [dist_g[:, None], pos_all[slots], nrm_all[slots]], axis=1)
            dsel = jnp.einsum("ksB,scB->kcB", oh, dyn)   # (K, 7, B)
            stat = jnp.einsum("ksB,sc->kcB", oh,
                              jnp.concatenate(
                                  [table[slots], solimp_t[slots]], axis=1))
            dist_l.append(dsel[:, 0])
            pos_l.append(dsel[:, 1:4])
            nrm_l.append(dsel[:, 4:7])
            stat_l.append(stat[:, :12])
            simp_l.append(stat[:, 12:])
            sel_l.append(jnp.asarray(slots, jnp.int32)[sel_local])
        else:
            dist_l.append(dist_g)
            pos_l.append(pos_all[slots])
            nrm_l.append(nrm_all[slots])
            stat_l.append(jnp.broadcast_to(table[slots][..., None],
                                           (len(slots), 12, B)))
            simp_l.append(jnp.broadcast_to(solimp_t[slots][..., None],
                                           (len(slots), 5, B)))
            sel_l.append(jnp.broadcast_to(
                jnp.asarray(slots, jnp.int32)[:, None], (len(slots), B)))

    ccd_warm = None
    if m.ccd_budget > 0:
        warm_id_l, warm_u_l, lane_tab_l = [], [], []
        for (cds, cdp, cdn, cst, csi, csel, cts) in _ccd_stage(m, d, dtype):
            dist_l.append(cds)
            pos_l.append(cdp)
            nrm_l.append(cdn)
            stat_l.append(cst)
            simp_l.append(csi)
            sel_l.append(csel)
            warm_id_l.append(csel)
            warm_u_l.append(cdn)
            lane_tab_l.append(cts)
        ccd_warm = (jnp.concatenate(warm_id_l, axis=0),
                    jnp.concatenate(warm_u_l, axis=0),
                    jnp.concatenate(lane_tab_l, axis=0))

    sel = jnp.concatenate(sel_l, axis=0)
    dist = jnp.concatenate(dist_l, axis=0)
    pos = jnp.concatenate(pos_l, axis=0)
    nrm = jnp.concatenate(nrm_l, axis=0)
    stat = jnp.concatenate(stat_l, axis=0)          # (Ksum, 8, B)
    simp = jnp.concatenate(simp_l, axis=0)          # (Ksum, 5, B)

    mu = stat[:, 2]
    invw = stat[:, 3]
    margin = stat[:, 4]
    marginfull = stat[:, 5]
    b1 = jnp.round(stat[:, 6]).astype(jnp.int32)
    b2 = jnp.round(stat[:, 7]).astype(jnp.int32)
    g1 = jnp.round(stat[:, 8]).astype(jnp.int32)
    g2 = jnp.round(stat[:, 9]).astype(jnp.int32)
    typ = jnp.round(stat[:, 10]).astype(jnp.int32)
    sub = jnp.round(stat[:, 11]).astype(jnp.int32)
    solref = stat[:, 0:2]
    pos_c = dist - margin
    k_, b_, imp = _kbi((stat[:, 0], stat[:, 1]),
                       tuple(simp[:, i] for i in range(5)), pos_c,
                       tsmin=2.0 * m.opt.timestep)
    R = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
    frame = _make_frame(nrm)

    contact = Contact(
        sel=sel, dist=dist, pos=pos, frame=frame, k=k_, b=b_, R=R,
        mu=mu, invw=invw, margin=margin, marginfull=marginfull,
        b1=b1, b2=b2, g1=g1, g2=g2, typ=typ, sub=sub,
        solref=solref, solimp=simp)
    if ccd_warm is not None:
        return d.replace(contact=contact, ccd_warm_id=ccd_warm[0],
                         ccd_warm_u=ccd_warm[1].astype(d.ccd_warm_u.dtype),
                         ccd_lane_tab=ccd_warm[2].astype(
                             d.ccd_lane_tab.dtype))
    return d.replace(contact=contact)


def collision_update(m: Model, d: Data) -> Data:
    """Geometry/impedance refresh for the ALREADY-SELECTED contact lanes.

    The cheap half of the Model.col_refresh split: no gates, no top-K, no
    candidate-wide narrowphase, no lane compaction. Per lane (identity
    stored in d.contact.{g1,g2,typ,sub} and d.ccd_lane_tab):

    * analytic lanes: one-hot gather the two geom frames/sizes, evaluate
      every analytic type-group's closed form on the lane set (a handful
      of lanes x a handful of type groups), and mask-select by the
      lane's (typ, sub);
    * ccd lanes: rerun the exact-convex narrowphase on the cached lane
      support params with the lane's own previous direction as warm
      start (no lane matching);
    * impedance: re-evaluate k/b/R from the stored solref/solimp at the
      new penetration.

    The selected SET lags by at most col_refresh-1 substeps; geometry
    and forces are always current.
    """
    from flybody_tpu.physics import ccd as ccd_mod
    from flybody_tpu.physics.constraint import _kbi, efc_meta

    if m.ncon_max == 0 and m.ccd_budget == 0:
        return d
    meta = efc_meta(m)
    dtype = d.qpos.dtype
    B = d.qpos.shape[-1]
    con = d.contact
    con_dim = np.asarray(m.con_dim)
    _, _, slot_typ, _ = _slot_identity(m)
    groups, _ = _pair_groups(m)
    from flybody_tpu.physics.io_mj import _PAIR_NCON
    group_list = [(key, _PAIR_NCON[key]) for key in groups]

    geom_payload = jnp.concatenate(
        [d.geom_xpos, d.geom_xmat.reshape(m.ngeom, 9, B)], axis=1)
    iota_g = jnp.arange(m.ngeom, dtype=jnp.int32)[None, :, None]
    sizes_t = m.geom_size.astype(dtype)        # (ngeom, 3)

    dist_l, pos_l, nrm_l = [], [], []
    row = 0
    for cd, K in meta.analytic_groups:
        slots = np.nonzero(con_dim == cd)[0]
        nr = min(K, len(slots))
        rows = slice(row, row + nr)
        row += nr
        lg1, lg2 = con.g1[rows], con.g2[rows]
        ltyp, lsub = con.typ[rows], con.sub[rows]
        oh1 = (lg1[:, None, :] == iota_g).astype(dtype)   # (nr, ngeom, B)
        oh2 = (lg2[:, None, :] == iota_g).astype(dtype)
        f1 = jnp.einsum("kgB,gcB->kcB", oh1, geom_payload)
        f2 = jnp.einsum("kgB,gcB->kcB", oh2, geom_payload)
        p1, M1 = f1[:, :3], f1[:, 3:].reshape(nr, 3, 3, B)
        p2, M2 = f2[:, :3], f2[:, 3:].reshape(nr, 3, 3, B)
        s1 = jnp.einsum("kgB,gc->kcB", oh1, sizes_t)
        s2 = jnp.einsum("kgB,gc->kcB", oh2, sizes_t)

        dist = jnp.full((nr, B), 1e10, dtype=dtype)
        pos = jnp.zeros((nr, 3, B), dtype=dtype)
        nrm = jnp.zeros((nr, 3, B), dtype=dtype).at[:, 2].set(1.0)
        for tid, (key, kk) in enumerate(group_list):
            # static reachability: does this type group contribute slots
            # to this condim group at all?
            if not np.any(slot_typ[slots] == tid):
                continue
            fn = _dispatch(m, key[0], key[1])
            dd, pp, nn = fn(p1, M1, s1, p2, M2, s2)  # (nr, kk, *, B)
            is_t = ltyp == tid
            for j in range(kk):
                msk = is_t & (lsub == j)
                dist = jnp.where(msk, dd[:, j], dist)
                pos = jnp.where(msk[:, None], pp[:, j], pos)
                nrm = jnp.where(msk[:, None], nn[:, j], nrm)
        dist_l.append(dist)
        pos_l.append(pos)
        nrm_l.append(nrm)

    new_warm_u = None
    invw_ccd_l = []
    if m.ccd_budget > 0:
        warm_u_l = []
        off = 0
        for (ax1, ax2, start, n, N) in m.ccd_classes:
            ts = d.ccd_lane_tab[off:off + N].astype(dtype)
            gg1 = jnp.round(ts[:, 23]).astype(jnp.int32)
            gg2 = jnp.round(ts[:, 24]).astype(jnp.int32)
            oh1 = (gg1[:, None, :] == iota_g).astype(dtype)
            oh2 = (gg2[:, None, :] == iota_g).astype(dtype)
            f1 = jnp.einsum("kgB,gcB->kcB", oh1, geom_payload)
            f2 = jnp.einsum("kgB,gcB->kcB", oh2, geom_payload)
            p1, R1 = f1[:, :3], f1[:, 3:].reshape(N, 3, 3, B)
            p2, R2 = f2[:, :3], f2[:, 3:].reshape(N, 3, 3, B)
            mv = lambda sl: ts[:, sl]
            prm1 = (mv(slice(0, 3)), mv(slice(3, 4)), mv(slice(4, 5)), ax1)
            prm2 = (mv(slice(5, 8)), mv(slice(8, 9)), mv(slice(9, 10)), ax2)
            u0 = d.ccd_warm_u[off:off + N].astype(dtype)
            # every update-substep lane is warm-started from ITS OWN
            # previous direction (no lane matching), so fewer PGD
            # iterations converge: measured 1.9e-6 m max error at 4
            # warm iters vs 4.8e-8 at 8 cold (tools/ccd_iter_sweep.py)
            cds, cdp, cdn, cnu = ccd_mod.narrowphase(
                p1, R1, prm1, p2, R2, prm2,
                iters=max(4, m.ccd_iters - 3), u0=u0, with_nu=True)
            dist_l.append(cds)
            pos_l.append(cdp)
            nrm_l.append(cdn)
            warm_u_l.append(cdn)
            invw_ccd_l.append(ts[:, 18] / cnu)
            off += N
        new_warm_u = jnp.concatenate(warm_u_l, axis=0)

    dist = jnp.concatenate(dist_l, axis=0)
    pos = jnp.concatenate(pos_l, axis=0)
    nrm = jnp.concatenate(nrm_l, axis=0)
    # manifold multiplicity re-evaluated at the new penetration for ccd
    # lanes (ccd.manifold_nu); analytic lanes keep their selection invw
    invw = con.invw
    if invw_ccd_l:
        n_ccd = sum(x.shape[0] for x in invw_ccd_l)
        invw = jnp.concatenate(
            [con.invw[:-n_ccd]] + invw_ccd_l, axis=0).astype(con.invw.dtype)
    pos_c = dist - con.margin
    k_, b_, imp = _kbi((con.solref[:, 0], con.solref[:, 1]),
                       tuple(con.solimp[:, i] for i in range(5)), pos_c,
                       tsmin=2.0 * m.opt.timestep)
    R = jnp.maximum((1.0 - imp) / imp * invw, 1e-12)
    contact = con.replace(dist=dist, pos=pos, frame=_make_frame(nrm),
                          k=k_, b=b_, R=R, invw=invw)
    if new_warm_u is not None:
        return d.replace(contact=contact,
                         ccd_warm_u=new_warm_u.astype(d.ccd_warm_u.dtype))
    return d.replace(contact=contact).replace(contact=contact)
