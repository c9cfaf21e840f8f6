"""SE(3) math tests."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import se3


def test_exp_identity():
    T = np.asarray(se3.exp(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_exp_pure_translation():
    T = np.asarray(se3.exp(jnp.array([0.1, -0.2, 0.3, 0, 0, 0])))
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-7)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)


def test_exp_pure_rotation_z():
    th = 0.3
    T = np.asarray(se3.exp(jnp.array([0, 0, 0, 0, 0, th])))
    expect = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]])
    np.testing.assert_allclose(T[:3, :3], expect, atol=1e-6)


def test_exp_matches_scipy():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(3)
    for _ in range(5):
        w = rng.normal(size=3) * 0.5
        T = np.asarray(se3.exp(jnp.asarray(np.concatenate([[0, 0, 0], w]))))
        R = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)


def test_inverse():
    T = np.asarray(se3.exp(jnp.array([0.1, 0.2, 0.3, 0.2, -0.1, 0.4])))
    Ti = np.asarray(se3.inverse(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-6)


def test_camera_matrix_roundtrip():
    k = jnp.array([481.2, -480.0, 320.0, 240.0])
    K = np.asarray(se3.camera_matrix(k))
    Ki = np.asarray(se3.inverse_camera_matrix(k))
    np.testing.assert_allclose(K @ Ki, np.eye(4), atol=1e-6)
