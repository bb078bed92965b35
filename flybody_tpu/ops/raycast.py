"""On-device eye-camera rendering: jittable heightfield/primitive raycaster.

The reference renders the fly's 32x32 eye cameras with EGL (reference
fruitfly.py:676-708 MJCFCamera observables) — a host GPU dependency that
cannot live inside a TPU step. Here eye observables are produced by a
vectorized raycaster in pure JAX (SURVEY.md §7 design delta 5): each pixel
marches a ray against the terrain heightfield + ground plane and returns a
shaded intensity. Exact parity with GL output is not a goal (validated
statistically); the information content (obstacle bearing/distance) is.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def camera_rays(fovy_deg: float, width: int, height: int, dtype=jnp.float32):
    """(H, W, 3) camera-frame ray directions (x right, y up, -z forward)."""
    tanv = np.tan(np.deg2rad(fovy_deg) / 2)
    aspect = width / height
    u = (2 * (np.arange(width) + 0.5) / width - 1) * tanv * aspect
    v = (1 - 2 * (np.arange(height) + 0.5) / height) * tanv
    uu, vv = np.meshgrid(u, v)
    d = np.stack([uu, vv, -np.ones_like(uu)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d, dtype)


def hfield_height_fn(hfield_data, hfield_size, hfield_pos):
    """Returns h(x, y): world-frame terrain height via bilinear lookup."""
    nrow, ncol = hfield_data.shape
    sx, sy, zt = hfield_size[0], hfield_size[1], hfield_size[2]

    def h(x, y):
        lx = x - hfield_pos[0]
        ly = y - hfield_pos[1]
        fx = jnp.clip((lx / sx + 1.0) * 0.5 * (ncol - 1), 0.0, ncol - 1.001)
        fy = jnp.clip((ly / sy + 1.0) * 0.5 * (nrow - 1), 0.0, nrow - 1.001)
        ix = jnp.floor(fx).astype(jnp.int32)
        iy = jnp.floor(fy).astype(jnp.int32)
        tx, ty = fx - ix, fy - iy
        h00 = hfield_data[iy, ix]
        h01 = hfield_data[iy, ix + 1]
        h10 = hfield_data[iy + 1, ix]
        h11 = hfield_data[iy + 1, ix + 1]
        hh = ((1 - ty) * ((1 - tx) * h00 + tx * h01)
              + ty * ((1 - tx) * h10 + tx * h11))
        inside = (jnp.abs(lx) <= sx) & (jnp.abs(ly) <= sy)
        return jnp.where(inside, hh * zt + hfield_pos[2], hfield_pos[2])
    return h


def terrain_hit(cam_pos, d_world, height_fn, max_dist: float = 10.0,
                n_steps: int = 48):
    """(H, W) first terrain-hit distance (inf where no hit)."""
    dtype = cam_pos.dtype
    ts = jnp.linspace(0.05, max_dist, n_steps, dtype=dtype)
    pts = cam_pos[None, None, None, :] + ts[None, None, :, None] \
        * d_world[:, :, None, :]                          # (H, W, S, 3)
    terrain = height_fn(pts[..., 0], pts[..., 1])         # (H, W, S)
    below = pts[..., 2] < terrain
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)
    return jnp.where(any_hit, ts[first], jnp.inf)


# ---------------------------------------------------------------------------
# analytic ray-primitive intersections (all closed-form, batched over
# pixels x geoms; SURVEY §7 delta 5: eyes must see the fly body, the ball
# and obstacle geoms, not terrain only)

_INF = 1e10


def _ray_sphere_t(o, d, r):
    """o, d: (..., 3) ray in the sphere frame; -> (...,) entry distance."""
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - r * r
    disc = b * b - c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    t = jnp.where(t > 0, t, -b + sq)
    return jnp.where(ok & (t > 0), t, _INF)


def _ray_ellipsoid_t(o, d, size):
    """Scale space into the unit sphere (exact)."""
    os_ = o / size
    ds = d / size
    n = jnp.linalg.norm(ds, axis=-1)
    t = _ray_sphere_t(os_, ds / jnp.maximum(n[..., None], 1e-12), 1.0)
    # keep the miss sentinel out of the rescaling
    return jnp.where(t >= _INF, _INF, t / jnp.maximum(n, 1e-12))


def _ray_capsule_t(o, d, r, hl):
    """Capsule along local z with half-length hl, radius r."""
    # infinite-cylinder part
    ox, oy = o[..., 0], o[..., 1]
    dx, dy = d[..., 0], d[..., 1]
    a = dx * dx + dy * dy
    b = ox * dx + oy * dy
    c = ox * ox + oy * oy - r * r
    disc = b * b - a * c
    ok = (disc >= 0) & (a > 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = jnp.where(ok, (-b - sq) / jnp.maximum(a, 1e-12), _INF)
    z = o[..., 2] + t_cyl * d[..., 2]
    t_cyl = jnp.where((t_cyl > 0) & (jnp.abs(z) <= hl), t_cyl, _INF)
    # cap spheres
    zhat = jnp.zeros_like(o).at[..., 2].set(1.0)
    hl_v = jnp.broadcast_to(jnp.asarray(hl)[..., None], o.shape) \
        if jnp.ndim(hl) else hl
    top = o - zhat * hl_v
    bot = o + zhat * hl_v
    t_top = _ray_sphere_t(top, d, r)
    t_bot = _ray_sphere_t(bot, d, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))


def _ray_box_t(o, d, size):
    """Axis-aligned slab method in the box frame."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1 = (-size - o) * inv
    t2 = (size - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin > 0, tmin, tmax)
    return jnp.where(hit & (t > 0), t, _INF)


def make_scene_raycaster(model, geom_ids):
    """Static partition of `geom_ids` by type -> a function
    (cam_pos, d_world, geom_xpos, geom_xmat) -> (H, W) nearest primitive
    hit distance. geom_xpos/geom_xmat are the per-env (ngeom, 3)/(ngeom,
    3, 3) views; sizes come from the static model."""
    from flybody_tpu.physics import types as T

    gt = np.asarray(model.geom_type)
    size = np.asarray(model.geom_size)
    groups = {}
    for code, name in ((T.GEOM_SPHERE, "sphere"),
                       (T.GEOM_CAPSULE, "capsule"),
                       (T.GEOM_ELLIPSOID, "ellipsoid"),
                       (T.GEOM_BOX, "box"),
                       (T.GEOM_CYLINDER, "cylinder")):
        ids = np.asarray([g for g in geom_ids if gt[g] == code], np.int32)
        if len(ids):
            groups[name] = (ids, jnp.asarray(size[ids]))

    def cast(cam_pos, d_world, geom_xpos, geom_xmat):
        H, W = d_world.shape[:2]
        best = jnp.full((H, W), _INF, d_world.dtype)
        for name, (ids, gsize) in groups.items():
            gp = geom_xpos[ids]                       # (G, 3)
            gm = geom_xmat[ids]                       # (G, 3, 3)
            # rays into each geom frame: (G, H, W, 3)
            rel = cam_pos[None] - gp                  # (G, 3)
            o = jnp.einsum("gij,gi->gj", gm, rel)     # R^T (p - c)
            dl = jnp.einsum("gij,hwi->ghwj", gm, d_world)
            ob = o[:, None, None, :]
            if name == "sphere":
                t = _ray_sphere_t(ob, dl, gsize[:, 0, None, None])
            elif name == "ellipsoid":
                t = _ray_ellipsoid_t(ob, dl, gsize[:, None, None, :])
            elif name == "capsule":
                t = _ray_capsule_t(ob, dl, gsize[:, 0, None, None],
                                   gsize[:, 1, None, None])
            elif name == "cylinder":
                # cylinder ~ capsule with flat-cap error below pixel scale
                t = _ray_capsule_t(ob, dl, gsize[:, 0, None, None],
                                   gsize[:, 1, None, None])
            else:  # box
                t = _ray_box_t(ob, dl, gsize[:, None, None, :])
            best = jnp.minimum(best, jnp.min(t, axis=0))
        return best

    return cast, bool(groups)


def shade(t_hit, d_world, max_dist: float):
    """Distance -> intensity in [0, 255]: closer = brighter, sky gradient
    where nothing is hit (the looming/bearing cues of the GL eyes)."""
    hit = jnp.isfinite(t_hit) & (t_hit < max_dist)
    return jnp.where(
        hit, 255.0 * jnp.clip(1.0 - t_hit / max_dist, 0.0, 1.0),
        40.0 + 80.0 * jnp.clip(d_world[..., 2], 0, 1))


def render_eye(cam_pos, cam_mat, rays, height_fn, max_dist: float = 10.0,
               n_steps: int = 48, scene_cast=None, geom_xpos=None,
               geom_xmat=None):
    """Render one eye: terrain march + analytic primitive hits; returns
    (H, W) intensity in [0, 255].

    With `scene_cast` (from make_scene_raycaster) the image includes
    primitive-geom silhouettes — the fly's own body, the ball, obstacle
    geoms (reference GL cameras see the full scene, fruitfly.py:676-708).
    """
    dtype = cam_pos.dtype
    d_world = jnp.einsum("ij,hwj->hwi", cam_mat, rays)   # (H, W, 3)
    t = terrain_hit(cam_pos, d_world, height_fn, max_dist, n_steps) \
        if height_fn is not None else jnp.full(rays.shape[:2], jnp.inf,
                                               dtype)
    if scene_cast is not None:
        t_prim = scene_cast(cam_pos, d_world, geom_xpos, geom_xmat)
        t = jnp.minimum(t, t_prim)
    return shade(t, d_world, max_dist).astype(dtype)
