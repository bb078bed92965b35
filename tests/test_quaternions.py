"""Property tests for the JAX quaternion core.

Validated against independent ground truths: scipy rotations, MuJoCo's
mju_* routines, and algebraic identities — mirroring the behavior of the
reference numpy library (vnl_ray/quaternions.py) without reusing it.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from flybody_tpu.math import quaternions as q

rng = np.random.default_rng(0)


def rand_quats(shape=(32,), normalize=True):
    quats = rng.normal(size=shape + (4,))
    if normalize:
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return quats


def scipy_quat(wxyz):
    """wxyz -> scipy Rotation."""
    arr = np.asarray(wxyz)
    return R.from_quat(np.concatenate([arr[..., 1:], arr[..., :1]], axis=-1))


def test_mult_quat_matches_scipy():
    q1, q2 = rand_quats(), rand_quats()
    got = np.asarray(q.mult_quat(q1, q2))
    want = (scipy_quat(q1) * scipy_quat(q2)).as_quat()
    want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
    # Sign ambiguity: compare up to sign.
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-10)


def test_mult_quat_nonunit_and_broadcast():
    q1 = rng.normal(size=(5, 4))
    q2 = rng.normal(size=(4,))
    got = np.asarray(q.mult_quat(q1, q2))
    for i in range(5):
        want = np.empty(4)
        a1, b1, c1, d1 = q1[i]
        a2, b2, c2, d2 = q2
        want[0] = a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2
        want[1] = a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2
        want[2] = a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2
        want[3] = a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2
        np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_reciprocal_identity():
    quats = rng.normal(size=(16, 4)) * 3.0
    prod = np.asarray(q.mult_quat(quats, q.reciprocal_quat(quats)))
    want = np.tile([1.0, 0, 0, 0], (16, 1))
    np.testing.assert_allclose(prod, want, atol=1e-9)


def test_rotate_vec_matches_mujoco():
    quats = rand_quats((20,))
    vecs = rng.normal(size=(20, 3))
    got = np.asarray(q.rotate_vec_with_quat(vecs, quats))
    for i in range(20):
        want = np.zeros(3)
        mujoco.mju_rotVecQuat(want, vecs[i], quats[i])
        np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_rotate_vec_nonunit_quat_scale_cancels():
    quats = rand_quats((8,)) * 2.7
    vecs = rng.normal(size=(8, 3))
    got = np.asarray(q.rotate_vec_with_quat(vecs, quats))
    unit = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    want = np.asarray(q.rotate_vec_with_quat(vecs, unit))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_rotate_vec_broadcast_both_ways():
    quat = rand_quats(())
    vecs = rng.normal(size=(2, 7, 3))
    got = np.asarray(q.rotate_vec_with_quat(vecs, quat))
    assert got.shape == (2, 7, 3)
    vec = rng.normal(size=(3,))
    quats = rand_quats((2, 7))
    got = np.asarray(q.rotate_vec_with_quat(vec, quats))
    assert got.shape == (2, 7, 3)


def test_egocentric_vec():
    root = rng.normal(size=(4, 3))
    site = rng.normal(size=(4, 3))
    quat = rand_quats((4,))
    got = np.asarray(q.get_egocentric_vec(root, site, quat))
    want = scipy_quat(quat).inv().apply(site - root)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_log_quat():
    quats = rng.normal(size=(10, 4)) * 1.5
    got = np.asarray(q.log_quat(quats))
    # exp(log(q)) == q check via scipy-free math.
    for i in range(10):
        nq = np.linalg.norm(quats[i])
        v = quats[i][1:]
        nv = np.linalg.norm(v)
        want = np.concatenate(
            [[np.log(nq)], v / nv * np.arccos(quats[i][0] / nq)]
        )
        np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_quat_z2vec_rotates_z_to_vec():
    vecs = rng.normal(size=(25, 3))
    quats = np.asarray(q.quat_z2vec(vecs))
    z = np.array([0.0, 0, 1])
    got = np.asarray(q.rotate_vec_with_quat(z, quats))
    want = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_quat_z2vec_edge_cases():
    vecs = np.array([[0.0, 0, 0], [0, 0, 1], [0, 0, -1], [0, 0, 2.5]])
    quats = np.asarray(q.quat_z2vec(vecs))
    np.testing.assert_allclose(quats[0], [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(quats[1], [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(quats[2], [0, 1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(quats[3], [1, 0, 0, 0], atol=1e-12)
    assert not np.any(np.isnan(quats))


def test_quat_z2vec_jittable():
    vecs = jnp.asarray(rng.normal(size=(4, 3)))
    jitted = jax.jit(q.quat_z2vec)
    np.testing.assert_allclose(
        np.asarray(jitted(vecs)), np.asarray(q.quat_z2vec(vecs)), atol=1e-12
    )


def test_axis_angle_to_quat():
    axes = rng.normal(size=(12, 3))
    angles = rng.uniform(-np.pi, np.pi, size=(12,))
    got = np.asarray(q.axis_angle_to_quat(axes, angles))
    unit = axes / np.linalg.norm(axes, axis=-1, keepdims=True)
    want = R.from_rotvec(unit * angles[:, None]).as_quat()
    want = np.concatenate([want[..., 3:], want[..., :3]], axis=-1)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-10)


def test_quat_dist_short_arc():
    q1 = rand_quats((30,))
    # Rotate q1 by a known small angle about a random axis.
    angle = 0.3
    axis = rng.normal(size=(30, 3))
    dq = np.asarray(q.axis_angle_to_quat(axis, np.full(30, angle)))
    q2 = np.asarray(q.mult_quat(dq, q1))
    got = np.asarray(q.quat_dist_short_arc(q1, q2))
    np.testing.assert_allclose(got, angle, atol=1e-8)
    # Identical quats (incl. sign flip) have distance 0.
    np.testing.assert_allclose(
        np.asarray(q.quat_dist_short_arc(q1, -q1)), 0.0, atol=1e-6
    )


def test_quat_to_angvel_matches_mujoco():
    quats = rand_quats((15,))
    dt = 0.002
    got = np.asarray(q.quat_to_angvel(quats, dt))
    for i in range(15):
        want = np.zeros(3)
        mujoco.mju_quat2Vel(want, quats[i], dt)
        np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_quat_seq_to_angvel_roundtrip():
    # Integrate a constant angular velocity, then recover it.
    w = np.array([0.3, -1.1, 0.7])
    dt = 0.01
    T = 50
    quats = [np.array([1.0, 0, 0, 0])]
    for _ in range(T - 1):
        quats.append(np.asarray(q.quat_integrate(quats[-1], w, dt)))
    quats = np.stack(quats)
    # quat_integrate applies angvel in the local frame; for recovery in the
    # global frame use local_ref_frame=True which matches local integration.
    got = np.asarray(q.quat_seq_to_angvel(quats, dt=dt, local_ref_frame=True))
    np.testing.assert_allclose(got, np.tile(w, (T - 1, 1)), atol=1e-6)


def test_joint_orientation_quat():
    # A joint along z with angle a == rotation about z by a.
    a = 0.77
    got = np.asarray(q.joint_orientation_quat(np.array([0.0, 0, 1]), a))
    want = np.array([np.cos(a / 2), 0, 0, np.sin(a / 2)])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_quat_mat_roundtrip():
    quats = rand_quats((40,))
    mats = np.asarray(q.quat_to_mat(quats))
    want = scipy_quat(quats).as_matrix()
    np.testing.assert_allclose(mats, want, atol=1e-10)
    back = np.asarray(q.mat_to_quat(mats))
    sign = np.sign(np.sum(back * quats, axis=-1, keepdims=True))
    np.testing.assert_allclose(back, sign * quats, atol=1e-8)


def test_quat_integrate_matches_mujoco():
    quats = rand_quats((10,))
    vels = rng.normal(size=(10, 3))
    dt = 0.005
    got = np.asarray(q.quat_integrate(quats, vels, dt))
    for i in range(10):
        want = quats[i].copy()
        mujoco.mju_quatIntegrate(want, vels[i], dt)
        sign = np.sign(np.dot(got[i], want))
        np.testing.assert_allclose(got[i], sign * want, atol=1e-9)


def test_everything_vmaps_and_jits():
    quats = jnp.asarray(rand_quats((8, 5)))
    vecs = jnp.asarray(rng.normal(size=(8, 5, 3)))
    f = jax.jit(jax.vmap(q.rotate_vec_with_quat))
    out = f(vecs, quats)
    assert out.shape == (8, 5, 3)
    g = jax.jit(jax.vmap(q.quat_dist_short_arc))
    assert g(quats, quats).shape == (8, 5)
