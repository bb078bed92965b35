"""Exact convex narrowphase: support minimization over the unit sphere.

Replaces MuJoCo's native GJK+EPA (mjc_Convex; reference semantics are
exercised through dm_control wherever fly self-collisions happen, see
/root/reference/vnl_ray/fruitfly/assets/fruitfly.xml collision classes)
with a TPU-native algorithm that has no simplex/polytope bookkeeping, no
dynamic topology, and a fixed iteration count.

For convex bodies S1, S2 with Minkowski difference D = S1 - S2 and
support h_D(u) = h_1(u) + h_2(-u),

    signed_distance(S1, S2) = -min_{|u|=1} h_D(u)

in BOTH regimes: if the bodies are separated the minimum is -distance
(attained at the separating-axis direction); if they penetrate it is
+depth (attained at the minimum-translation direction). One spherical
minimization therefore subsumes GJK (distance) and EPA (penetration).
In both regimes the optimal u points from geom1 toward geom2 — the
MuJoCo contact-normal convention (after the t1<=t2 type swap).

The gradient of f(u) = h_D(u) is the support-point difference itself
(envelope theorem), so the smooth part is projected gradient on S^2 with
Barzilai-Borwein steps. f is non-smooth exactly where a segment/disk
axis of either shape is orthogonal to u — which is the GENERIC contact
direction for side/face contacts — so pure PGD stalls there. The kink
set is known in closed form per shape (at most one flat axis each for
the primitive inventory), giving a complete candidate enumeration:

    - one unconstrained PGD run on S^2        (smooth contacts)
    - one PGD run per flat axis, constrained to the great circle u.a=0
                                              (side contacts; f restricted
                                               to the circle is smooth
                                               except at the poles below)
    - direct evaluation at +-axis (disk poles: cylinder face contacts)
      and +-normalize(a1 x a2)                (crossed side contacts =
                                               both kinks active)

and the minimum over all candidates. Each run is branch-free and fully
batched over (lanes, B).

Shapes are parametrized as a Minkowski sum  Ellipsoid(a) + Segment(h) +
r * Ball  covering every convex MuJoCo primitive with one branch-free
support formula:

    sphere    r=size[0]
    capsule   h=size[1], r=size[0]
    ellipsoid a=size
    cylinder  a=(size[0], size[0], 0), h=size[1]

(Boxes stay on the analytic narrowphase paths in collision.py.) The ball
radius is carried analytically: supports act on the "core" shape and
dist = core_dist - r1 - r2, which makes sphere- and capsule-involving
pairs exact with fast convergence, and keeps their cores (point/segment)
separated in every shallow-contact configuration.

Witnesses: x1 = s1(u*) + r1 u*, x2 = s2(-u*) - r2 u*. Where the support
set is not a single point (cylinder rim/face, segment flats) a short
alternating-projection pass between the two support sets recovers the
centered witness pair (MuJoCo's EPA returns an arbitrary face point in
the same situations).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _n3(v, eps=1e-12):
    return jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True) + eps)


def _dot(a, b):
    return jnp.sum(a * b, axis=-2, keepdims=True)


def support_core(u_local, ell, seg_h):
    """Support point of Ellipsoid(ell)+Segment(seg_h) in the geom frame.
    u_local (..., 3, B); ell (..., 3, 1|B), seg_h (..., 1, 1|B).
    Degenerate ellipsoid axes (zeros -> disk/point) are handled by the
    eps in the norm."""
    au = ell * u_local
    s_ell = ell * au / _n3(au)
    ez = jnp.zeros_like(u_local).at[..., 2, :].set(1.0)
    s_seg = seg_h * jnp.sign(u_local[..., 2:3, :]) * ez
    return s_ell + s_seg


class _Pair:
    """Closure bundle for one batched pair lane-set."""

    def __init__(self, p1, R1, g1p, p2, R2, g2p):
        self.p1, self.R1, self.g1p = p1, R1, g1p
        self.p2, self.R2, self.g2p = p2, R2, g2p

        def rad(gp):
            ell, seg_h = gp
            return jnp.max(ell, axis=-2, keepdims=True) + seg_h
        c = p1 - p2
        self.c = c
        scale = rad(g1p) + rad(g2p) + _n3(c)
        self.eta0 = 1.0 / jnp.maximum(scale, 1e-9)

    def sup(self, u):
        ul1 = jnp.einsum("...jiB,...jB->...iB", self.R1, u)
        ul2 = jnp.einsum("...jiB,...jB->...iB", self.R2, -u)
        s1l = support_core(ul1, *self.g1p)
        s2l = support_core(ul2, *self.g2p)
        s1 = self.p1 + jnp.einsum("...ijB,...jB->...iB", self.R1, s1l)
        s2 = self.p2 + jnp.einsum("...ijB,...jB->...iB", self.R2, s2l)
        return s1, s2

    def f(self, u, s1, s2):
        return _dot(u, s1 - s2)[..., 0, :]


def _pgd(pair: _Pair, u0, iters: int, proj_axis=None):
    """Projected-gradient descent of f on S^2, optionally constrained to
    the great circle orthogonal to proj_axis. Returns (u, f, s1, s2)."""
    eta0 = pair.eta0

    def project(u):
        if proj_axis is not None:
            u = u - _dot(u, proj_axis) * proj_axis
        return u / _n3(u)

    u = project(u0)

    def tangrad(u, g):
        r = g - _dot(u, g) * u
        if proj_axis is not None:
            r = r - _dot(r, proj_axis) * proj_axis
        return r

    def body(carry, _):
        u, u_prev, r_prev, eta = carry
        s1, s2 = pair.sup(u)
        r = tangrad(u, s1 - s2)
        du = u - u_prev
        dr = r - r_prev
        num = jnp.sum(du * du, axis=-2, keepdims=True)
        den = jnp.sum(du * dr, axis=-2, keepdims=True)
        eta_bb = num / jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
        eta_new = jnp.where((den > 1e-30) & (num > 0.0),
                            jnp.clip(eta_bb, 0.05 * eta0, 20.0 * eta0),
                            eta)
        u_next = project(u - eta_new * r)
        return (u_next, u, r, eta_new), None

    s1, s2 = pair.sup(u)
    r0 = tangrad(u, s1 - s2)
    u1 = project(u - eta0 * r0)
    carry = (u1, u, r0, jnp.broadcast_to(eta0, r0[..., :1, :].shape))
    (u, _, _, _), _ = jax.lax.scan(body, carry, None, length=iters)
    s1, s2 = pair.sup(u)
    # one half-step polish damps any terminal two-cycle
    r = tangrad(u, s1 - s2)
    u_d = project(u - 0.5 * eta0 * r)
    s1d, s2d = pair.sup(u_d)
    better = pair.f(u_d, s1d, s2d) < pair.f(u, s1, s2)
    bm = better[..., None, :]
    u = jnp.where(bm, u_d, u)
    s1 = jnp.where(bm, s1d, s1)
    s2 = jnp.where(bm, s2d, s2)
    return u, pair.f(u, s1, s2), s1, s2


def minimize_support(p1, R1, g1p, axis1_flat, p2, R2, g2p, axis2_flat,
                     iters: int = 32, u0=None):
    """Minimize f over S^2 with the kink-aware candidate set.

    axis_i_flat: None (smooth shape) or bool whether shape i contributes
    a flat axis (its local z, i.e. R_i[:, 2]); static per lane-set.
    u0: optional warm-start directions (..., 3, B) — e.g. the previous
    substep's converged u for the same pair; lanes where u0 is ~0 fall
    back to the center-line seed. Returns (u*, f*, s1*, s2*)."""
    pair = _Pair(p1, R1, g1p, p2, R2, g2p)
    # start pointing geom1 -> geom2 (the optimal u in both regimes for
    # near-contact pairs); u0 = p1 - p2 would sit on the antipodal
    # MAXIMUM, a stationary point PGD cannot leave. The small fixed
    # jitter breaks exactly-axis-aligned stationary starts.
    u0c = -pair.c + jnp.asarray([1e-7, 2e-7, 3e-7],
                                pair.c.dtype)[..., :, None]
    if u0 is not None:
        has_warm = jnp.sum(u0 * u0, axis=-2, keepdims=True) > 0.25
        u0 = jnp.where(has_warm, u0, u0c)
    else:
        u0 = u0c

    cands = [_pgd(pair, u0, iters)]

    axes = []
    if axis1_flat:
        axes.append(R1[..., :, 2, :])
    if axis2_flat:
        axes.append(R2[..., :, 2, :])

    for a in axes:
        cands.append(_pgd(pair, u0, iters, proj_axis=a))
        # disk poles (cylinder face contacts): direct evaluations
        for sgn in (1.0, -1.0):
            u = sgn * a
            s1, s2 = pair.sup(u)
            cands.append((u, pair.f(u, s1, s2), s1, s2))
    if len(axes) == 2:
        x = jnp.cross(axes[0], axes[1], axis=-2)
        xnorm = _n3(x)
        xn = x / xnorm
        # axes are unit vectors: |a1 x a2| = sin(angle). _n3's eps floors
        # the norm at 1e-6, so the threshold must sit above that.
        degenerate = xnorm[..., 0, :] < 1e-5
        for sgn in (1.0, -1.0):
            u = sgn * xn
            s1, s2 = pair.sup(u)
            f = jnp.where(degenerate, jnp.inf, pair.f(u, s1, s2))
            cands.append((u, f, s1, s2))

    bu, bf, bs1, bs2 = cands[0]
    for u, f, s1, s2 in cands[1:]:
        m = f < bf
        mm = m[..., None, :]
        bu = jnp.where(mm, u, bu)
        bs1 = jnp.where(mm, s1, bs1)
        bs2 = jnp.where(mm, s2, bs2)
        bf = jnp.where(m, f, bf)
    return bu, bf, bs1, bs2


def _refine_witnesses(u, s1, s2, R1, g1p, R2, g2p):
    """Center the witness pair on non-unique support sets.

    The support SET at u is a point except where a flat axis is
    orthogonal to u; there it is a segment (cylinder side line, capsule
    flat) or a disk (cylinder face). Each set is approximated by the
    segment along its direction of largest extent (for the disk: the
    in-plane direction toward the other witness, which is exact for
    closest-point purposes) and a short alternating-projection pass
    centers the pair."""
    tol = 1e-5

    def sup_set(R, gp, u_world, s_w, other):
        ell, seg_h = gp
        ul = jnp.einsum("...jiB,...jB->...iB", R, u_world)
        un = _n3(ul)
        zaxis = R[..., :, 2, :]
        # segment flat: u_z ~ 0
        flat_z = jnp.abs(ul[..., 2:3, :]) < tol * un
        w_seg = jnp.where(flat_z, seg_h, 0.0)
        # degenerate-ellipsoid disk (cylinder face): u along the zero
        # axis; the relevant direction is the in-plane projection of the
        # vector toward the other witness
        disk = (ell[..., 0:1, :] > 0) & (ell[..., 2:3, :] <= 0) \
            & (jnp.sqrt(ul[..., 0:1, :]**2 + ul[..., 1:2, :]**2)
               < tol * un)
        w_disk = jnp.where(disk, ell[..., 0:1, :], 0.0)
        rad_dir = other - s_w
        rad_dir = rad_dir - _dot(rad_dir, zaxis) * zaxis
        rad_dir = rad_dir / _n3(rad_dir)
        use_disk = w_disk > w_seg
        d = jnp.where(use_disk, rad_dir, zaxis)
        w = jnp.maximum(w_disk, w_seg)
        return d, w

    d1, w1 = sup_set(R1, g1p, u, s1, s2)
    d2, w2 = sup_set(R2, g2p, -u, s2, s1)
    # keep refinement inside the support plane (orthogonal to u)
    d1 = d1 - _dot(d1, u) * u
    d2 = d2 - _dot(d2, u) * u
    n1 = _n3(d1)
    n2 = _n3(d2)
    w1 = jnp.where(n1 > 1e-9, w1, 0.0)
    w2 = jnp.where(n2 > 1e-9, w2, 0.0)
    d1 = d1 / n1
    d2 = d2 / n2

    def clamp_seg(c0, d, w, x):
        t = jnp.clip(_dot(x - c0, d), -w, w)
        return c0 + t * d

    x1, x2 = s1, s2
    for _ in range(3):
        x1 = clamp_seg(s1, d1, w1, x2)
        x2 = clamp_seg(s2, d2, w2, x1)
    return x1, x2


def narrowphase(p1, R1, param1, p2, R2, param2, iters: int = 32,
                refine: bool = True, u0=None):
    """Full convex narrowphase for a batch of lanes.

    param_i = (ell (...,3,1|B), seg (...,1,1|B), radius (...,1,1|B),
    axis_flat: bool). Returns (dist (..., B), pos (..., 3, B),
    normal (..., 3, B)); the normal points from geom1 toward geom2
    (MuJoCo convention after the t1<=t2 swap)."""
    ell1, seg1, r1, ax1 = param1
    ell2, seg2, r2, ax2 = param2
    g1p = (ell1, seg1)
    g2p = (ell2, seg2)
    u, f, s1, s2 = minimize_support(p1, R1, g1p, ax1, p2, R2, g2p, ax2,
                                    iters, u0=u0)
    if refine:
        s1, s2 = _refine_witnesses(u, s1, s2, R1, g1p, R2, g2p)
    core = -f                                  # signed core distance
    dist = core - (r1 + r2)[..., 0, :]
    # u* points from geom1 toward geom2 in both regimes
    n = u
    x1 = s1 + r1 * n
    x2 = s2 - r2 * n
    pos = 0.5 * (x1 + x2)
    return dist, pos, n


def geom_core_params(gtype: int, size) -> np.ndarray:
    """Static [ell(3), seg(1), radius(1), axis_flat(1)] for a geom."""
    from flybody_tpu.physics import types as T
    s = np.asarray(size, np.float64)
    out = np.zeros(6)
    if gtype == T.GEOM_SPHERE:
        out[4] = s[0]
    elif gtype == T.GEOM_CAPSULE:
        out[4] = s[0]
        out[3] = s[1]
        out[5] = 1.0
    elif gtype == T.GEOM_ELLIPSOID:
        out[0:3] = s[:3]
    elif gtype == T.GEOM_CYLINDER:
        out[0] = out[1] = s[0]
        out[3] = s[1]
        out[5] = 1.0
    else:
        raise NotImplementedError(f"ccd geom type {gtype}")
    return out
