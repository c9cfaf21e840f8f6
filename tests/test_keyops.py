"""Key-algebra tests (model: se_core/test/octree/octree_unittest.cpp:36-120
and algorithms/unique_unittest.cpp)."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import keyops, morton

MAX_DEPTH = 6   # 64^3 voxel map


def enc(x, y, z):
    return jnp.asarray(morton.encode(jnp.uint32(x), jnp.uint32(y),
                                     jnp.uint32(z)))


def test_parent_and_child_id():
    # voxel (5, 3, 7) at finest level; parent chain coordinates halve
    code = enc(5, 3, 7)
    pcode, plevel = keyops.parent(code, MAX_DEPTH, MAX_DEPTH)
    assert int(plevel) == MAX_DEPTH - 1
    np.testing.assert_array_equal(np.asarray(morton.decode_v(pcode)),
                                  [4, 2, 6])
    cid = keyops.child_id(code, MAX_DEPTH, MAX_DEPTH)
    # child id bits = (x&1) | (y&1)<<1 | (z&1)<<2 = 1 | 2 | 4
    assert int(cid) == 0b111


def test_descendant():
    anc = enc(8, 8, 8)       # octant of side 8 at level 3
    inside = enc(10, 13, 9)
    outside = enc(17, 8, 8)
    assert bool(keyops.descendant(inside, anc, 3, MAX_DEPTH))
    assert not bool(keyops.descendant(outside, anc, 3, MAX_DEPTH))


def test_face_neighbour():
    code = enc(8, 8, 8)      # level-3 octant, side 8
    n, ok = keyops.face_neighbour(code, 3, MAX_DEPTH, axis=0, direction=1)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(morton.decode_v(n)),
                                  [16, 8, 8])
    n, ok = keyops.face_neighbour(enc(0, 0, 0), 3, MAX_DEPTH, axis=1,
                                  direction=-1)
    assert not bool(ok)      # leaves the map


def test_siblings():
    code = enc(8, 8, 8)
    sibs = np.asarray(keyops.siblings(code, 3, MAX_DEPTH))
    assert sibs.shape == (8,)
    coords = np.asarray(morton.decode_v(jnp.asarray(sibs)))
    # parent octant spans [0,16)^3 at side-8 children
    assert set(map(tuple, coords)) == {
        (x, y, z) for x in (0, 8) for y in (0, 8) for z in (0, 8)}


def test_far_corner():
    # child 7 of its parent: far corner = opposite corner of the octant
    code = enc(8, 8, 8)
    fc = np.asarray(keyops.far_corner(code, 3, MAX_DEPTH))
    np.testing.assert_array_equal(fc, [16, 16, 16])


def test_unique():
    codes = jnp.asarray(np.array([1, 1, 2, 5, 5, 5, 9], np.uint32))
    valid = jnp.ones(7, bool)
    mask = np.asarray(keyops.unique(codes, valid))
    np.testing.assert_array_equal(mask, [1, 0, 1, 1, 0, 0, 1])


def test_filter_ancestors():
    # an octant key directly followed by its (deeper) descendant is dropped
    codes = jnp.asarray(np.array([0, 0, 64], np.uint32))
    levels = jnp.asarray(np.array([2, 6, 6], np.int32))
    valid = jnp.ones(3, bool)
    mask = np.asarray(keyops.filter_ancestors(codes, levels, valid,
                                              MAX_DEPTH))
    np.testing.assert_array_equal(mask, [0, 1, 1])


def test_unique_multiscale():
    # equal codes at several levels: keep the last (finest) of the run
    codes = jnp.asarray(np.array([4, 4, 4, 9], np.uint32))
    levels = jnp.asarray(np.array([2, 3, 6, 6], np.int32))
    valid = jnp.ones(4, bool)
    mask = np.asarray(keyops.unique_multiscale(codes, levels, valid))
    np.testing.assert_array_equal(mask, [0, 0, 1, 1])
