"""Batched quaternion operations in JAX.

Fully jittable / vmappable / differentiable re-design of the quaternion math
layer of the reference framework (reference: vnl_ray/quaternions.py). The API
surface (function names, argument conventions, broadcasting behavior) matches
the reference so task/reward code can be ported 1:1, but every implementation
here is functional jnp code: no in-place mutation, and all edge cases are
handled with `jnp.where` masking so the functions can run under `jit`.

Quaternion convention: wxyz (scalar first), matching MuJoCo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small epsilon used to make normalizations safe under jit (no NaN gradients).
_EPS = 1e-12


def _safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = True) -> jax.Array:
    """Norm that is safe to evaluate (and differentiate) at zero."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))


def get_quat(theta, rot_axis=(0.0, 0.0, 1.0)) -> jax.Array:
    """Unit quaternion for a given angle (radians) and rotation axis (3,)."""
    axis = jnp.asarray(rot_axis, dtype=jnp.result_type(float))
    axis = axis / _safe_norm(axis)
    half = jnp.asarray(theta) / 2
    return jnp.concatenate(
        [jnp.cos(half)[None], jnp.sin(half) * axis], axis=-1
    )


def random_quat(key: jax.Array) -> jax.Array:
    """Normalized random quaternion (uniform axis, uniform angle in [0, 2pi))."""
    k1, k2 = jax.random.split(key)
    theta = 2 * jnp.pi * jax.random.uniform(k1)
    axis = 2 * jax.random.uniform(k2, (3,)) - 1
    return axis_angle_to_quat(axis, theta)


def mult_quat(quat1: jax.Array, quat2: jax.Array) -> jax.Array:
    """Hamilton product quat1 * quat2; any leading batch dims, broadcasting."""
    q1, q2 = jnp.asarray(quat1), jnp.asarray(quat2)
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )


def conj_quat(quat: jax.Array) -> jax.Array:
    """Quaternion conjugate: negate the vector part."""
    quat = jnp.asarray(quat)
    return quat * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def reciprocal_quat(quat: jax.Array) -> jax.Array:
    """Reciprocal: mult_quat(quat, reciprocal_quat(quat)) == [1, 0, 0, 0]."""
    quat = jnp.asarray(quat)
    sq = jnp.sum(quat * quat, axis=-1, keepdims=True)
    return conj_quat(quat) / jnp.maximum(sq, _EPS)


def get_dquat(quat1: jax.Array, quat2: jax.Array) -> jax.Array:
    """Delta quaternion: mult_quat(dquat, quat1) == quat2."""
    return mult_quat(quat2, reciprocal_quat(quat1))


def get_dquat_local(quat1: jax.Array, quat2: jax.Array) -> jax.Array:
    """Delta quaternion in quat1's local frame."""
    return mult_quat(reciprocal_quat(quat1), quat2)


def rotate_vec_with_quat(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotate vector(s) by unit quaternion(s): vec' = q vec q^-1.

    Implemented with the expanded Rodrigues form (no quaternion products of
    augmented vectors) — fewer flops, and broadcasting falls out naturally.
    """
    vec, quat = jnp.asarray(vec), jnp.asarray(quat)
    w = quat[..., :1]
    u = quat[..., 1:]
    # Normalize so non-unit quats behave like the reference (scale cancels).
    s2 = jnp.sum(quat * quat, axis=-1, keepdims=True)
    uv = jnp.cross(u, vec)
    uuv = jnp.cross(u, uv)
    return vec + 2 * (w * uv + uuv) / jnp.maximum(s2, _EPS)


def get_egocentric_vec(
    root_xpos: jax.Array, site_xpos: jax.Array, root_quat: jax.Array
) -> jax.Array:
    """(site_xpos - root_xpos) expressed in the root's local frame."""
    return rotate_vec_with_quat(site_xpos - root_xpos, conj_quat(root_quat))


def vec_world_to_local(
    world_vec: jax.Array, root_quat: jax.Array, hover_up_dir_quat=None
) -> jax.Array:
    """World-frame vector expressed in the root's (optionally re-framed) local frame."""
    q = conj_quat(root_quat)
    if hover_up_dir_quat is not None:
        hover = jnp.broadcast_to(jnp.asarray(hover_up_dir_quat), q.shape)
        q = mult_quat(conj_quat(hover), q)
    return rotate_vec_with_quat(world_vec, q)


def vec_global_to_local(vec: jax.Array, body_quat: jax.Array) -> jax.Array:
    """Vector in global coordinates -> body-local frame."""
    return rotate_vec_with_quat(vec, reciprocal_quat(body_quat))


def log_quat(quat: jax.Array) -> jax.Array:
    """Quaternion logarithm (general, non-unit quats supported)."""
    quat = jnp.asarray(quat)
    norm_q = _safe_norm(quat)
    norm_v = _safe_norm(quat[..., 1:])
    angle = jnp.arccos(jnp.clip(quat[..., :1] / norm_q, -1.0, 1.0))
    return jnp.concatenate(
        [jnp.log(norm_q), quat[..., 1:] / norm_v * angle], axis=-1
    )


def quat_z2vec(vec: jax.Array) -> jax.Array:
    """Unit quaternion rotating the z-axis onto `vec` (edge cases handled)."""
    vec = jnp.asarray(vec)
    dtype = jnp.result_type(vec.dtype, float)
    vec = vec.astype(dtype)
    # Detect the degenerate case x == y == 0 (covers 0, +z, -z).
    degenerate = jnp.all(vec[..., :2] == 0.0, axis=-1, keepdims=True)
    # Placeholder direction for degenerate rows so math below stays finite.
    safe_vec = jnp.where(degenerate, jnp.asarray([1.0, 0.0, 0.0], dtype), vec)
    unit = safe_vec / _safe_norm(safe_vec)
    axis = jnp.stack(
        [-unit[..., 1], unit[..., 0], jnp.zeros_like(unit[..., 0])], axis=-1
    )
    axis = axis / _safe_norm(axis)
    angle = jnp.arccos(jnp.clip(unit[..., 2:3], -1.0, 1.0))
    quat = jnp.concatenate([jnp.cos(angle / 2), jnp.sin(angle / 2) * axis], axis=-1)
    # Degenerate rows: -z -> 180deg about x, otherwise identity.
    neg_z = degenerate & (vec[..., 2:3] < 0)
    quat = jnp.where(degenerate, jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), quat)
    quat = jnp.where(neg_z, jnp.asarray([0.0, 1.0, 0.0, 0.0], dtype), quat)
    return quat


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> unit quaternion; axis need not be normalized."""
    axis = jnp.asarray(axis)
    angle = jnp.asarray(angle)
    axis = axis / _safe_norm(axis)
    half = angle[..., None] / 2
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_dist_short_arc(quat1: jax.Array, quat2: jax.Array) -> jax.Array:
    """Shortest geodesic angle between two unit quaternions, in [0, pi)."""
    q1 = jnp.asarray(quat1)
    q2 = jnp.asarray(quat2)
    q1 = q1 / _safe_norm(q1)
    q2 = q2 / _safe_norm(q2)
    x = 2 * jnp.sum(q1 * q2, axis=-1) ** 2 - 1
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def joint_orientation_quat(xaxis: jax.Array, qpos: jax.Array) -> jax.Array:
    """Joint orientation quat from world-frame joint axis and joint angle."""
    return mult_quat(axis_angle_to_quat(xaxis, qpos), quat_z2vec(xaxis))


def quat_to_angvel(quat: jax.Array, dt=1.0) -> jax.Array:
    """Orientation-difference quaternion -> angular velocity (mju_quat2Vel)."""
    quat = jnp.asarray(quat)
    sin_a_2 = _safe_norm(quat[..., 1:])
    axis = quat[..., 1:] / sin_a_2
    speed = 2 * jnp.arctan2(sin_a_2, quat[..., :1])
    speed = jnp.where(speed > jnp.pi, speed - 2 * jnp.pi, speed)
    return speed * axis / dt


def quat_seq_to_angvel(quats: jax.Array, dt=1.0, local_ref_frame: bool = False):
    """Sequence of orientation quats (T, 4) -> angular velocities (T-1, 3)."""
    quats = jnp.asarray(quats)
    dquats = get_dquat(quats[:-1], quats[1:])
    ang_vel = quat_to_angvel(dquats, dt=dt)
    if local_ref_frame:
        ang_vel = vec_global_to_local(ang_vel, quats[:-1])
    return ang_vel


# ---------------------------------------------------------------------------
# Conversions used by the physics engine (not in the reference API).
# ---------------------------------------------------------------------------


def quat_to_mat(quat: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix, batched over leading dims."""
    quat = jnp.asarray(quat)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(quat.shape[:-1] + (3, 3))


def mat_to_quat(mat: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (wxyz), branch-free."""
    m = jnp.asarray(mat)
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions; pick the numerically best with where().
    qw = jnp.sqrt(jnp.maximum(1 + tr, _EPS)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2], _EPS)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2], _EPS)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2], _EPS)) / 2
    q0 = jnp.stack([qw,
                    (m[..., 2, 1] - m[..., 1, 2]) / (4 * qw),
                    (m[..., 0, 2] - m[..., 2, 0]) / (4 * qw),
                    (m[..., 1, 0] - m[..., 0, 1]) / (4 * qw)], axis=-1)
    q1 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / (4 * qx),
                    qx,
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qx),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qx)], axis=-1)
    q2 = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / (4 * qy),
                    (m[..., 0, 1] + m[..., 1, 0]) / (4 * qy),
                    qy,
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qy)], axis=-1)
    q3 = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / (4 * qz),
                    (m[..., 0, 2] + m[..., 2, 0]) / (4 * qz),
                    (m[..., 1, 2] + m[..., 2, 1]) / (4 * qz),
                    qz], axis=-1)
    # Select per-element: prefer trace-based unless a diagonal dominates.
    cond0 = (tr > 0)[..., None]
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    pick1 = ((d0 >= d1) & (d0 >= d2))[..., None]
    pick2 = (d1 >= d2)[..., None]
    q = jnp.where(cond0, q0, jnp.where(pick1, q1, jnp.where(pick2, q2, q3)))
    q = q / _safe_norm(q)
    # Canonical sign: w >= 0 (MuJoCo convention for mju_mat2Quat is not signed,
    # but a canonical sign keeps comparisons stable).
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_integrate(quat: jax.Array, angvel: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by angular velocity (local frame), like
    MuJoCo's mju_quatIntegrate: q' = q * exp(0.5 * dt * [0, w])."""
    angle = _safe_norm(angvel) * dt
    axis = angvel / _safe_norm(angvel)
    dq = jnp.concatenate(
        [jnp.cos(angle / 2), jnp.sin(angle / 2) * axis], axis=-1
    )
    out = mult_quat(quat, dq)
    return out / _safe_norm(out)
