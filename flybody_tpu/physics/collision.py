"""Collision detection: static candidate pairs + batched narrowphase.

TPU-first design: broadphase is *compile-time* — the candidate pair list is
enumerated once from the static model (contype/conaffinity masks, weld and
parent-child exclusion, same rules as MuJoCo's filter) and grouped by geom
type pair. At runtime each group is one vmapped closed-form narrowphase
kernel; every candidate pair owns fixed contact slots, inactive slots are
masked by dist >= includemargin downstream. No dynamic shapes anywhere.

Supported primitive pairs cover the fly + arenas: plane/{sphere, capsule,
ellipsoid, box}, hfield/{sphere, capsule}, sphere/{sphere, capsule},
capsule/capsule.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Contact, Data, Model


def _make_frame(n):
    """Orthonormal frame rows (n, t1, t2) from a unit normal."""
    # pick the axis least aligned with n
    a = jnp.where(jnp.abs(n[0]) < 0.5,
                  jnp.array([1.0, 0.0, 0.0], n.dtype),
                  jnp.array([0.0, 1.0, 0.0], n.dtype))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


# Each narrowphase fn: (pos1, mat1, size1, pos2, mat2, size2) ->
#   (dist (k,), pos (k,3), normal (k,3)) with k static contacts.


def _plane_sphere(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    d = jnp.dot(n, p2 - p1)
    dist = d - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    axis = m2[:, 2]
    r, hl = s2[0], s2[1]
    dists, poss = [], []
    for sgn in (1.0, -1.0):
        c = p2 + sgn * hl * axis
        d = jnp.dot(n, c - p1) - r
        dists.append(d)
        poss.append(c - n * (r + 0.5 * d))
    return (jnp.stack(dists), jnp.stack(poss),
            jnp.broadcast_to(n, (2, 3)))


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    nl = m2.T @ n
    sn = s2 * nl
    denom = jnp.maximum(jnp.linalg.norm(s2 * sn), 1e-12)
    support_l = -(s2 * sn) / jnp.maximum(jnp.linalg.norm(sn), 1e-12)
    # deepest point along -n: local = -s^2 nl / |s nl|
    support_l = -(s2 * s2 * nl) / jnp.maximum(jnp.linalg.norm(s2 * nl), 1e-12)
    sp = p2 + m2 @ support_l
    d = jnp.dot(n, sp - p1)
    pos = sp - 0.5 * d * n
    del denom
    return d[None], pos[None], n[None]


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
    """Plane vs cylinder: deepest rim points of both caps + one extra
    lower-cap rim point (stabilizes the near-upright case)."""
    n = m1[:, 2]
    a = m2[:, 2]
    r, h = s2[0], s2[1]
    na = jnp.dot(n, a)
    # in-plane direction of steepest descent on the cap circles
    u = n - na * a
    u_norm = jnp.linalg.norm(u)
    # fallback direction when axis is parallel to the normal
    alt = jnp.where(jnp.abs(a[0]) < 0.5,
                    jnp.array([1.0, 0.0, 0.0], a.dtype),
                    jnp.array([0.0, 1.0, 0.0], a.dtype))
    alt = alt - jnp.dot(alt, a) * a
    alt = alt / jnp.maximum(jnp.linalg.norm(alt), 1e-12)
    u = jnp.where(u_norm > 1e-9, u / jnp.maximum(u_norm, 1e-12), alt)
    w = jnp.cross(a, u)
    # lower cap = the one deeper along -n
    sgn = jnp.where(na > 0, -1.0, 1.0)
    c_low = p2 + sgn * h * a
    c_high = p2 - sgn * h * a
    pts = jnp.stack([
        c_low - r * u,
        c_high - r * u,
        c_low - r * (-0.5 * u + 0.8660254 * w),
    ])
    d = pts @ n - jnp.dot(n, p1)
    pos = pts - 0.5 * d[:, None] * n
    return d, pos, jnp.broadcast_to(n, (3, 3))


def _plane_box(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    corners = jnp.array([[sx, sy, sz]
                         for sx in (-1., 1.) for sy in (-1., 1.)
                         for sz in (-1., 1.)], dtype=p2.dtype) * s2
    pts = p2 + corners @ m2.T
    d = pts @ n - jnp.dot(n, p1)
    # 4 deepest corners
    idx = jnp.argsort(d)[:4]
    d4 = d[idx]
    pos = pts[idx] - 0.5 * d4[:, None] * n
    return d4, pos, jnp.broadcast_to(n, (4, 3))


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
    dvec = p2 - p1
    L = jnp.linalg.norm(dvec)
    n = dvec / jnp.maximum(L, 1e-12)
    dist = L - s1[0] - s2[0]
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return dist[None], pos[None], n[None]


def _closest_on_seg(p, a, b):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
    axis = m2[:, 2]
    a, b = p2 - s2[1] * axis, p2 + s2[1] * axis
    c = _closest_on_seg(p1, a, b)
    return _sphere_sphere(p1, m1, s1, c, m2, jnp.array([s2[0], 0., 0.],
                                                       dtype=s2.dtype))


def _sphere_box(p1, m1, s1, p2, m2, s2):
    r = s1[0]
    c = m2.T @ (p1 - p2)                      # sphere center, box frame
    q = jnp.clip(c, -s2, s2)                   # closest point on box
    dvec = c - q
    L = jnp.linalg.norm(dvec)
    outside = L > 1e-9
    # inside: push along the face with minimum penetration
    pen = s2 - jnp.abs(c)
    axis = jnp.argmin(pen)
    sign = jnp.sign(c[axis] + 1e-30)
    n_in = jnp.zeros(3, dtype=c.dtype).at[axis].set(sign)
    n_local = jnp.where(outside, dvec / jnp.maximum(L, 1e-12), n_in)
    dist = jnp.where(outside, L - r, -(pen[axis] + r))
    q_surf = jnp.where(outside, q, c + n_in * pen[axis])
    n = m2 @ n_local
    pos_w = p2 + m2 @ q_surf
    pos = pos_w + 0.5 * dist * (-n)
    # normal must point g1(sphere) -> g2(box)
    return dist[None], pos[None], (-n)[None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
    """Capsule vs box: sphere-box tests at both caps + the segment point
    nearest the box center; keep the 2 deepest. Approximate but adequate
    for the arena geoms used by the tasks."""
    axis = m1[:, 2]
    r = jnp.array([s1[0], 0., 0.], dtype=s1.dtype)
    e1, e2 = p1 - s1[1] * axis, p1 + s1[1] * axis
    mid = _closest_on_seg(p2, e1, e2)
    ds, ps, ns = [], [], []
    for c in (e1, e2, mid):
        dd, pp, nn = _sphere_box(c, m1, r, p2, m2, s2)
        ds.append(dd[0]); ps.append(pp[0]); ns.append(nn[0])
    d = jnp.stack(ds)
    idx = jnp.argsort(d)[:2]
    return d[idx], jnp.stack(ps)[idx], jnp.stack(ns)[idx]


def _ellipsoid_surface_point(c, R, s, p):
    """Approximate closest point on an ellipsoid to world point p, plus the
    outward surface normal there. Scaled-space (ellipsoid -> unit sphere)
    projection: exact for spheres, good for mild aspect ratios (the fly's
    thorax/head collision ellipsoids are near-spherical)."""
    local = R.T @ (p - c)
    z = local / jnp.maximum(s, 1e-12)
    zn = jnp.linalg.norm(z)
    q_local = (z / jnp.maximum(zn, 1e-12)) * s
    # outward normal of the ellipsoid at q_local: grad(x^2/s^2) ~ q/s^2
    n_local = q_local / jnp.maximum(s * s, 1e-12)
    n_local = n_local / jnp.maximum(jnp.linalg.norm(n_local), 1e-12)
    inside = zn < 1.0
    return c + R @ q_local, R @ n_local, inside


def _sphere_ellipsoid(p1, m1, s1, p2, m2, s2):
    q, n, inside = _ellipsoid_surface_point(p2, m2, s2, p1)
    # signed distance of sphere center along the local normal
    d_c = jnp.dot(n, p1 - q)
    d_c = jnp.where(inside, -jnp.abs(d_c), d_c)
    dist = d_c - s1[0]
    # normal points g1(sphere) -> g2(ellipsoid)
    pos = p1 - n * (s1[0] + 0.5 * dist)
    return dist[None], pos[None], (-n)[None]


def _capsule_ellipsoid(p1, m1, s1, p2, m2, s2):
    """Capsule vs ellipsoid: fixed-point alternation between the segment
    and the (approximate) ellipsoid surface projection."""
    axis = m1[:, 2]
    A, B = p1 - s1[1] * axis, p1 + s1[1] * axis
    p = p1
    for _ in range(4):
        q, n, inside = _ellipsoid_surface_point(p2, m2, s2, p)
        p = _closest_on_seg(q, A, B)
    q, n, inside = _ellipsoid_surface_point(p2, m2, s2, p)
    d_c = jnp.dot(n, p - q)
    d_c = jnp.where(inside, -jnp.abs(d_c), d_c)
    dist = d_c - s1[0]
    pos = p - n * (s1[0] + 0.5 * dist)
    return dist[None], pos[None], (-n)[None]


def _ellipsoid_ellipsoid(p1, m1, s1, p2, m2, s2):
    """Ellipsoid pair via alternating surface projections (approximate)."""
    p = p1
    for _ in range(4):
        q2, n2, in2 = _ellipsoid_surface_point(p2, m2, s2, p)
        q1, n1, in1 = _ellipsoid_surface_point(p1, m1, s1, q2)
        p = q1
    q2, n2, in2 = _ellipsoid_surface_point(p2, m2, s2, q1)
    gapv = jnp.dot(n2, q1 - q2)
    overlap = in1 | in2
    dist = jnp.where(overlap, -jnp.abs(gapv), gapv)
    pos = 0.5 * (q1 + q2)
    return dist[None], pos[None], (-n2)[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
    # closest points between two segments (branchless, clamped)
    a1 = m1[:, 2] * s1[1]
    a2 = m2[:, 2] * s2[1]
    P1, Q1 = p1 - a1, p1 + a1
    P2, Q2 = p2 - a2, p2 + a2
    d1 = Q1 - P1
    d2 = Q2 - P2
    r = P1 - P2
    A = jnp.dot(d1, d1)
    E = jnp.dot(d2, d2)
    B = jnp.dot(d1, d2)
    C = jnp.dot(d1, r)
    F = jnp.dot(d2, r)
    denom = jnp.maximum(A * E - B * B, 1e-12)
    s = jnp.clip((B * F - C * E) / denom, 0.0, 1.0)
    t = jnp.clip((B * s + F) / jnp.maximum(E, 1e-12), 0.0, 1.0)
    s = jnp.clip((B * t - C) / jnp.maximum(A, 1e-12), 0.0, 1.0)
    c1 = P1 + s * d1
    c2 = P2 + t * d2
    zero = jnp.array([0., 0., 0.], dtype=s1.dtype)
    return _sphere_sphere(c1, m1, jnp.array([s1[0], 0., 0.], dtype=s1.dtype),
                          c2, m2, jnp.array([s2[0], 0., 0.], dtype=s2.dtype))


def _hfield_height_normal(m: Model, hid, xy_local, size):
    """Bilinear height and normal of heightfield (local frame)."""
    data = m.hfield_data[hid]
    nr, nc = m.hfield_nrow, m.hfield_ncol
    sx, sy, zt = size[0], size[1], size[2]
    # grid coords: x in [-sx, sx] -> col [0, nc-1]; y -> row
    fx = (xy_local[0] / sx + 1.0) * 0.5 * (nc - 1)
    fy = (xy_local[1] / sy + 1.0) * 0.5 * (nr - 1)
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
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)])
    n = n / jnp.linalg.norm(n)
    return h, n


def _make_hfield_sphere(m: Model, hid):
    def fn(p1, m1, s1, p2, m2, s2):
        local = m1.T @ (p2 - p1)
        h, nl = _hfield_height_normal(m, hid, local[:2], m.hfield_size[hid])
        n = m1 @ nl
        dist = (local[2] - h) * nl[2] - s2[0]
        pos = p2 - n * (s2[0] + 0.5 * dist)
        return dist[None], pos[None], n[None]
    return fn


def _make_hfield_capsule(m: Model, hid):
    sph = _make_hfield_sphere(m, hid)
    def fn(p1, m1, s1, p2, m2, s2):
        axis = m2[:, 2]
        outs = [sph(p1, m1, s1, p2 + sgn * s2[1] * axis, m2,
                    jnp.array([s2[0], 0., 0.], dtype=s2.dtype))
                for sgn in (1.0, -1.0)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]),
                jnp.concatenate([o[2] for o in outs]))
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
        (T.GEOM_SPHERE, T.GEOM_ELLIPSOID): _sphere_ellipsoid,
        (T.GEOM_SPHERE, T.GEOM_BOX): _sphere_box,
        (T.GEOM_CAPSULE, T.GEOM_CAPSULE): _capsule_capsule,
        (T.GEOM_CAPSULE, T.GEOM_ELLIPSOID): _capsule_ellipsoid,
        (T.GEOM_CAPSULE, T.GEOM_BOX): _capsule_box,
        (T.GEOM_ELLIPSOID, T.GEOM_ELLIPSOID): _ellipsoid_ellipsoid,
    }
    if (t1, t2) in table:
        return table[(t1, t2)]
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_SPHERE:
        return _make_hfield_sphere(m, 0)
    if t1 == T.GEOM_HFIELD and t2 == T.GEOM_CAPSULE:
        return _make_hfield_capsule(m, 0)
    raise NotImplementedError(f"collision pair {(t1, t2)}")


def collision(m: Model, d: Data) -> Data:
    """Narrowphase over all static candidate pairs -> contact slots."""
    if m.ncon_max == 0:
        return d
    from flybody_tpu.physics.io_mj import _PAIR_NCON

    g1s = np.asarray(m.pair_geom1)
    g2s = np.asarray(m.pair_geom2)
    ptypes = np.asarray(m.pair_type)

    # group pair indices by type pair
    groups: dict[tuple, list[int]] = {}
    for k in range(len(g1s)):
        groups.setdefault((int(ptypes[k, 0]), int(ptypes[k, 1])), []).append(k)

    slot_of_pair = np.concatenate(
        [[0], np.cumsum([_PAIR_NCON[(int(ptypes[k, 0]), int(ptypes[k, 1]))]
                         for k in range(len(g1s))])]).astype(int)

    dtype = d.qpos.dtype
    ncon = m.ncon_max
    dist = jnp.full((ncon,), 1e10, dtype=dtype)
    pos = jnp.zeros((ncon, 3), dtype=dtype)
    frame = jnp.zeros((ncon, 3, 3), dtype=dtype)

    for (t1, t2), pair_idx in groups.items():
        fn = _dispatch(m, t1, t2)
        k = _PAIR_NCON[(t1, t2)]
        pg1 = g1s[pair_idx]
        pg2 = g2s[pair_idx]
        p1, M1, S1 = d.geom_xpos[pg1], d.geom_xmat[pg1], m.geom_size[pg1]
        p2, M2, S2 = d.geom_xpos[pg2], d.geom_xmat[pg2], m.geom_size[pg2]
        dd, pp, nn = jax.vmap(fn)(p1, M1, S1, p2, M2, S2)
        ff = jax.vmap(jax.vmap(_make_frame))(nn)
        slots = np.concatenate([np.arange(slot_of_pair[pi],
                                          slot_of_pair[pi] + k)
                                for pi in pair_idx])
        dist = dist.at[slots].set(dd.reshape(-1))
        pos = pos.at[slots].set(pp.reshape(-1, 3))
        frame = frame.at[slots].set(ff.reshape(-1, 3, 3))

    # combined contact params are slot-constant: they live in Model.con_*
    return d.replace(contact=Contact(dist=dist, pos=pos, frame=frame))
