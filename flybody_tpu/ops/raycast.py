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

import jax
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


def render_eye(cam_pos, cam_mat, rays, height_fn, max_dist: float = 10.0,
               n_steps: int = 48):
    """March rays against the terrain; returns (H, W) intensity in [0, 255].

    Intensity encodes inverse hit distance (closer terrain = brighter),
    plus a horizon/sky gradient — the same cues (looming, bearing) that the
    GL-rendered eyes provide for the visual flight task.
    """
    dtype = cam_pos.dtype
    H, W, _ = rays.shape
    d_world = jnp.einsum("ij,hwj->hwi", cam_mat, rays)   # (H, W, 3)
    ts = jnp.linspace(0.05, max_dist, n_steps, dtype=dtype)
    pts = cam_pos[None, None, None, :] + ts[None, None, :, None] \
        * d_world[:, :, None, :]                          # (H, W, S, 3)
    terrain = height_fn(pts[..., 0], pts[..., 1])         # (H, W, S)
    below = pts[..., 2] < terrain
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)
    t_hit = ts[first]
    brightness = jnp.where(any_hit,
                           255.0 * jnp.clip(1.0 - t_hit / max_dist, 0.0, 1.0),
                           40.0 + 80.0 * jnp.clip(d_world[..., 2], 0, 1))
    return brightness.astype(dtype)
