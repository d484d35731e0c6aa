"""Golden tests for SO(3) ops: roundtrips, first-frame-zero convention, and
parity against an independent float64 numpy derivation."""

import numpy as np
import jax.numpy as jnp

from video_gen_evals_tpu.ops import (
    axis_angle_to_matrix,
    log_so3,
    rotmat_delta,
    axis_angle_delta,
)


def _np_rodrigues(a):
    """Independent float64 Rodrigues for cross-checking."""
    theta = max(np.linalg.norm(a), 1e-8)
    k = a / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def test_rodrigues_matches_numpy(rng):
    a = rng.normal(size=(50, 3)).astype(np.float32)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(a)))
    for i in range(50):
        np.testing.assert_allclose(R[i], _np_rodrigues(a[i].astype(np.float64)), atol=1e-5)


def test_rodrigues_is_rotation(rng):
    a = rng.normal(size=(100, 3)).astype(np.float32) * 2.0
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(a)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_log_roundtrip(rng):
    # angles away from 0 and pi where the log map is well-conditioned
    axis = rng.normal(size=(200, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.1, 3.0, size=(200, 1))
    a = (axis * theta).astype(np.float32)
    R = axis_angle_to_matrix(jnp.asarray(a))
    a2 = np.asarray(log_so3(R))
    np.testing.assert_allclose(a2, a, atol=1e-3)


def test_rotmat_delta_first_frame_zero(rng):
    a = rng.normal(size=(10, 5, 3)).astype(np.float32)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(a)))  # [10,5,3,3]
    w = np.asarray(rotmat_delta(jnp.asarray(R)))
    np.testing.assert_allclose(w[0], 0.0, atol=1e-6)


def test_rotmat_delta_recovers_relative_rotation(rng):
    # two frames differing by a known rotation about z
    angle = 0.3
    aa = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, angle]], dtype=np.float32)
    R = axis_angle_to_matrix(jnp.asarray(aa))[:, None]  # [2,1,3,3]
    w = np.asarray(rotmat_delta(R))
    np.testing.assert_allclose(w[1, 0], [0.0, 0.0, angle], atol=1e-4)


def test_axis_angle_delta_shape_and_zero_row(rng):
    aa = rng.normal(size=(7, 9)).astype(np.float32)  # 3 joints
    w = np.asarray(axis_angle_delta(jnp.asarray(aa)))
    assert w.shape == (7, 9)
    np.testing.assert_allclose(w[0], 0.0, atol=1e-6)


def test_axis_angle_delta_constant_sequence_is_zero(rng):
    one = rng.normal(size=(1, 6)).astype(np.float32)
    aa = np.repeat(one, 5, axis=0)
    w = np.asarray(axis_angle_delta(jnp.asarray(aa)))
    np.testing.assert_allclose(w, 0.0, atol=1e-5)
