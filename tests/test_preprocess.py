"""Preprocessing kernel tests (model: preprocessing.cpp behavior)."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import se3
from supereight_tpu.ops import preprocess


def test_mm2meters_subsamples():
    mm = (np.arange(8 * 8).reshape(8, 8) * 100).astype(np.uint16)
    out = np.asarray(preprocess.mm2meters(jnp.asarray(mm), (4, 4)))
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out[0, 0], mm[0, 0] / 1000.0)
    np.testing.assert_allclose(out[1, 2], mm[2, 4] / 1000.0)


def test_bilateral_preserves_flat_regions():
    d = np.full((16, 16), 2.0, np.float32)
    out = np.asarray(preprocess.bilateral_filter(jnp.asarray(d)))
    np.testing.assert_allclose(out, d, atol=1e-6)


def test_bilateral_keeps_zeros_and_edges():
    d = np.full((16, 16), 2.0, np.float32)
    d[:, 8:] = 3.0       # sharp edge, range sigma 0.1 -> no mixing
    d[0, 0] = 0.0
    out = np.asarray(preprocess.bilateral_filter(jnp.asarray(d)))
    assert out[0, 0] == 0.0
    np.testing.assert_allclose(out[5, 6], 2.0, atol=1e-4)
    np.testing.assert_allclose(out[5, 9], 3.0, atol=1e-4)


def test_half_sample_robust_rejects_outliers():
    d = np.full((8, 8), 1.0, np.float32)
    d[0, 1] = 5.0  # jump larger than e_d from its 2x2 center (d[0,0])
    out = np.asarray(preprocess.half_sample_robust(jnp.asarray(d), 0.3))
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out[0, 0], 1.0)


def test_depth2vertex_back_projection():
    k = jnp.array([100.0, 100.0, 8.0, 6.0])
    inv_k = se3.inverse_camera_matrix(k)
    d = np.zeros((12, 16), np.float32)
    d[6, 8] = 2.0   # principal point -> vertex on the z axis
    d[6, 13] = 1.0
    v = np.asarray(preprocess.depth2vertex(jnp.asarray(d), inv_k))
    np.testing.assert_allclose(v[6, 8], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(v[6, 13], [(13 - 8) / 100.0, 0, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(v[0, 0], [0, 0, 0])


def test_vertex2normal_plane():
    # vertices of a z = const plane -> normals along -z (y-down camera)
    h, w = 8, 8
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="xy")
    v = np.stack([xs, ys, np.full_like(xs, 2.0)], axis=-1)
    n, ok = preprocess.vertex2normal(jnp.asarray(v), neg_y=False)
    n = np.asarray(n)
    assert bool(ok[4, 4])
    np.testing.assert_allclose(np.abs(n[4, 4, 2]), 1.0, atol=1e-6)


def test_vertex2normal_invalid_propagates():
    v = np.ones((6, 6, 3), np.float32)
    v[3, 3, 2] = 0.0
    n, ok = preprocess.vertex2normal(jnp.asarray(v), neg_y=False)
    ok = np.asarray(ok)
    assert not ok[3, 3]
    # neighbours that reference the invalid vertex are invalid too
    assert not ok[3, 2] and not ok[3, 4] and not ok[2, 3] and not ok[4, 3]
    assert np.asarray(n)[3, 3, 0] == -2.0
