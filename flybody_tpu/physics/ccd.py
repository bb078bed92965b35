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
    if iters <= 16:
        # unrolled: scan's per-iteration kernel launches dominate the
        # production narrowphase (tiny (lanes, 3, B) bodies); unrolling
        # lets XLA fuse the whole run into a handful of kernels
        for _ in range(iters):
            carry, _ = body(carry, None)
        u = carry[0]
    else:
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

    # Riemannian Newton polish. f is flat to SECOND order in u at u*, so
    # BB-PGD can stall ~5e-3 rad from the optimum in the ill-conditioned
    # basins of deep anisotropic-ellipsoid contacts while the |dist|
    # error stays ~1e-6 — and the CONTACT NORMAL drives the solver
    # forces (a 5.5e-3 rad head/thorax normal error was the walking
    # lockstep's 8% outlier). The ellipsoid support Hessian is closed
    # form (segment flats contribute zero a.e.), so two Newton steps on
    # the sphere land on u* at quadratic rate; accept-if-better keeps
    # kinked lanes safe.
    def _ell_hess_quad(R, ell, u, t1, t2):
        """(t_i^T H t_j) entries of the ellipsoid-part support Hessian
        H = (diag(ell^2) - q q^T / w^2) / w in the geom frame."""
        ul = jnp.einsum("...jiB,...jB->...iB", R, u)
        t1l = jnp.einsum("...jiB,...jB->...iB", R, t1)
        t2l = jnp.einsum("...jiB,...jB->...iB", R, t2)
        e2 = ell * ell
        w2 = jnp.sum(e2 * ul * ul, axis=-2, keepdims=True)
        w = jnp.sqrt(w2 + 1e-30)

        def quad(x, y):
            axy = jnp.sum(e2 * x * y, axis=-2, keepdims=True)
            qx = jnp.sum(e2 * ul * x, axis=-2, keepdims=True)
            qy = jnp.sum(e2 * ul * y, axis=-2, keepdims=True)
            return ((axy - qx * qy / w2) / w)[..., 0, :]

        return quad(t1l, t1l), quad(t1l, t2l), quad(t2l, t2l)

    ell1, seg1 = pair.g1p
    ell2, seg2 = pair.g2p
    for _ in range(2):
        # tangent basis at bu
        ax = jnp.abs(bu[..., 0:1, :])
        ex = jnp.zeros_like(bu).at[..., 0, :].set(1.0)
        ey = jnp.zeros_like(bu).at[..., 1, :].set(1.0)
        alt = jnp.where(ax < 0.5, ex, ey)
        t1 = jnp.cross(bu, alt, axis=-2)
        t1 = t1 / _n3(t1)
        t2 = jnp.cross(bu, t1, axis=-2)
        g = bs1 - bs2                           # Euclidean grad of f
        g1_ = jnp.sum(g * t1, axis=-2)
        g2_ = jnp.sum(g * t2, axis=-2)
        a11a, a12a, a22a = _ell_hess_quad(pair.R1, ell1, bu, t1, t2)
        a11b, a12b, a22b = _ell_hess_quad(pair.R2, ell2, bu, t1, t2)
        # spherical Hessian of the degree-1 homogeneous f: H_t - f I
        h11 = a11a + a11b - bf
        h12 = a12a + a12b
        h22 = a22a + a22b - bf
        det = h11 * h22 - h12 * h12
        ok = jnp.abs(det) > 1e-20
        det = jnp.where(ok, det, 1.0)
        x1 = (-g1_ * h22 + g2_ * h12) / det
        x2 = (-g2_ * h11 + g1_ * h12) / det
        # clip the step (far-from-quadratic guard)
        sn = jnp.sqrt(x1 * x1 + x2 * x2) + 1e-30
        sc = jnp.where(sn > 0.2, 0.2 / sn, 1.0) * ok
        u_c = bu + (x1 * sc)[..., None, :] * t1 + (x2 * sc)[..., None, :] * t2
        u_c = u_c / _n3(u_c)
        s1c, s2c = pair.sup(u_c)
        f_c = pair.f(u_c, s1c, s2c)
        m = f_c < bf
        mm = m[..., None, :]
        bu = jnp.where(mm, u_c, bu)
        bs1 = jnp.where(mm, s1c, bs1)
        bs2 = jnp.where(mm, s2c, bs2)
        bf = jnp.where(m, f_c, bf)
    return bu, bf, bs1, bs2


def _refine_witnesses(u, s1, s2, p1, R1, g1p, p2, R2, g2p):
    """Center the witness pair on non-unique support sets.

    The support SET at u is a point except where a flat axis is
    orthogonal to u; there it is a segment (cylinder side line, capsule
    flat) or a disk (cylinder face). Each set is approximated by the
    segment along its direction of largest extent (for the disk: the
    in-plane direction toward the other witness, which is exact for
    closest-point purposes) and a short alternating-projection pass
    centers the pair.

    The clamp segment is centered at the SUPPORT-SET CENTER, not at the
    raw support point: where the segment direction is degenerate
    (u _|_ axis) the support lands on an arbitrary ENDPOINT
    (sign(u_z ~ 0)), and clamping around it covers only half the true
    line — the round-4 witness sat ~70 um off MuJoCo's on deep crossed
    femur/abdomen contacts (exact tangency point verified vs MuJoCo in
    tools/ probes)."""
    tol = 1e-5

    def sup_set(p, R, gp, u_world, s_w, other):
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
        # support-set center: strip the degenerate component of the
        # support point (axial for a segment flat, radial for a disk)
        ax = _dot(s_w - p, zaxis)
        c_seg = s_w - ax * zaxis
        c_disk = p + ax * zaxis
        c = jnp.where(use_disk, c_disk, c_seg)
        c = jnp.where(w > 0, c, s_w)
        return d, w, c

    d1, w1, c1 = sup_set(p1, R1, g1p, u, s1, s2)
    d2, w2, c2 = sup_set(p2, R2, g2p, -u, s2, s1)
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

    x1, x2 = c1, c2
    for _ in range(6):
        x1 = clamp_seg(c1, d1, w1, x2)
        x2 = clamp_seg(c2, d2, w2, x1)
    return x1, x2


def manifold_nu(u, dist, R1, param1, R2, param2):
    """Empirical manifold multiplicity of MuJoCo's native convex collider.

    MuJoCo's mjc_Convex (the narrowphase the reference model hits for all
    ellipsoid/cylinder self-contacts, via dm_control -> MuJoCo C) emits a
    CLUSTER of nu nearly-coincident contacts sharing one dist whenever
    both shapes present a flat/edge feature at the contact direction —
    measured behavior (tools/probe_manifolds.py + minimal-pair scans,
    MuJoCo 3.10):

      * any smooth shape involved (sphere/ellipsoid/capsule end):  nu = 1
        at every depth and orientation;
      * capsule SIDE (u _|_ axis) or cylinder side/rim/face counts as a
        flat feature; two active flats -> nu = 3 (side/edge cluster,
        normals fanned +-1e-3 rad), or nu = 4 when a cylinder FACE is
        active (rim points included);
      * narrow (crossed-axes) clusters collapse back to 1 below
        |dist| ~ 0.2 * R_flat (R_flat = largest radius among the flat
        shapes); wide overlaps (near-parallel axes, faces) persist.

    Since every cluster shares one dist/normal, nu stacked rows are
    EXACTLY one row with regularizer R/nu through the dual solver (cone
    projection is scale-invariant), so the engine folds nu into the
    contact-row regularizer instead of emitting extra rows.

    Returns nu (..., B) in {1, 3, 4} as a float array.
    """
    ell1, seg1, r1, _ = param1
    ell2, seg2, r2, _ = param2

    def feats(R, ell, seg, rad):
        a = R[..., :, 2, :]                    # world axis (local z)
        c = jnp.abs(_dot(a, u))[..., 0, :]     # |cos(angle to u)|
        disk = (ell[..., 0, :] > 0) & (ell[..., 2, :] <= 0)
        has_seg = seg[..., 0, :] > 0
        side = has_seg & (c < 0.02)
        face = disk & (c > 0.999)
        rim = disk & ~face & ~side
        flat = side | face | rim
        # lateral radius of the flat feature (cylinder radius or the
        # capsule ball radius) for the depth-collapse gate
        rflat = jnp.where(disk, ell[..., 0, :], rad[..., 0, :])
        return flat, face, side, rflat, a

    flat1, face1, side1, rf1, a1 = feats(R1, ell1, seg1, r1)
    flat2, face2, side2, rf2, a2 = feats(R2, ell2, seg2, r2)
    both = flat1 & flat2
    any_face = face1 | face2
    rmax = jnp.maximum(jnp.where(flat1, rf1, 0.0),
                       jnp.where(flat2, rf2, 0.0))
    # near-parallel side-side overlaps are wide (line contacts) and do
    # not collapse with depth; crossed ones do
    cx = jnp.cross(a1, a2, axis=-2)
    parallel = jnp.sum(cx * cx, axis=-2) < 0.09   # sin^2 < 0.3^2
    wide = (side1 & side2 & parallel) | any_face
    keep = both & (dist < 0.0) & (wide | (-dist < 0.2 * rmax))
    nu = jnp.where(keep, jnp.where(any_face, 4.0, 3.0), 1.0)
    return nu.astype(u.dtype)


def narrowphase(p1, R1, param1, p2, R2, param2, iters: int = 32,
                refine: bool = True, u0=None, with_nu: bool = False):
    """Full convex narrowphase for a batch of lanes.

    param_i = (ell (...,3,1|B), seg (...,1,1|B), radius (...,1,1|B),
    axis_flat: bool). Returns (dist (..., B), pos (..., 3, B),
    normal (..., 3, B)); the normal points from geom1 toward geom2
    (MuJoCo convention after the t1<=t2 swap). With ``with_nu`` also
    returns the manifold multiplicity (see manifold_nu)."""
    ell1, seg1, r1, ax1 = param1
    ell2, seg2, r2, ax2 = param2
    g1p = (ell1, seg1)
    g2p = (ell2, seg2)
    u, f, s1, s2 = minimize_support(p1, R1, g1p, ax1, p2, R2, g2p, ax2,
                                    iters, u0=u0)
    if refine:
        s1, s2 = _refine_witnesses(u, s1, s2, p1, R1, g1p, p2, R2, g2p)
    core = -f                                  # signed core distance
    dist = core - (r1 + r2)[..., 0, :]
    # u* points from geom1 toward geom2 in both regimes
    n = u
    x1 = s1 + r1 * n
    x2 = s2 - r2 * n
    pos = 0.5 * (x1 + x2)
    if with_nu:
        nu = manifold_nu(u, dist, R1, param1, R2, param2)
        return dist, pos, n, nu
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
