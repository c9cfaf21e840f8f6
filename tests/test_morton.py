"""Morton key tests (model: se_core/test/utils/morton_unittest.cpp)."""

import numpy as np

from supereight_tpu.core import morton


def _ref_encode(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_roundtrip_exhaustive_small():
    xs, ys, zs = np.meshgrid(np.arange(16), np.arange(16), np.arange(16),
                             indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    codes = np.asarray(morton.encode_v(coords))
    dec = np.asarray(morton.decode_v(codes))
    np.testing.assert_array_equal(dec, coords)


def test_against_bitwise_reference():
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 1024, size=(256, 3))
    codes = np.asarray(morton.encode_v(pts.astype(np.int32)))
    expect = np.array([_ref_encode(*p) for p in pts], dtype=np.uint32)
    np.testing.assert_array_equal(codes, expect)


def test_order_is_z_major():
    # z bit lands above y above x, matching compute_morton
    assert int(morton.encode(1, 0, 0)) == 1
    assert int(morton.encode(0, 1, 0)) == 2
    assert int(morton.encode(0, 0, 1)) == 4
    assert int(morton.encode(1, 1, 1)) == 7
