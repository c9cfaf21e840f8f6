"""Block-map structure tests.

Models the reference's octree structure tests
(se_core/test/multiscale/multiscale_unittest.cpp:58-105,
allocation/alloc_unittest.cpp): alloc + get/set roundtrip, pool iteration,
coarse-value fallback.
"""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import map as m
from supereight_tpu.fields import TSDF

GEOM = m.MapGeometry(size=64, dim=2.0, capacity=128)


def _alloc(state, coords):
    touched = jnp.zeros((GEOM.blocks_per_side,) * 3, bool)
    coords = np.asarray(coords)
    touched = touched.at[coords[:, 0], coords[:, 1], coords[:, 2]].set(True)
    return m.allocate_blocks(GEOM, state, touched)


def test_alloc_and_roundtrip():
    state = m.make_map(GEOM, TSDF)
    state = _alloc(state, [[0, 0, 0], [3, 2, 1]])
    assert int(state.n_blocks) == 2

    v = jnp.array([[0, 0, 0], [25, 17, 8], [5, 5, 5]], jnp.int32)
    state = m.set_voxels(state, v, jnp.array([0.5, -0.25, 0.125]),
                         jnp.array([1.0, 2.0, 3.0]))
    x, y = m.get_voxel(GEOM, state, TSDF, v)
    np.testing.assert_allclose(np.asarray(x), [0.5, -0.25, 0.125])
    np.testing.assert_allclose(np.asarray(y), [1.0, 2.0, 3.0])


def test_unallocated_reads_init():
    state = m.make_map(GEOM, TSDF)
    x, y = m.get_voxel(GEOM, state, TSDF, jnp.array([[10, 10, 10]]))
    assert float(x[0]) == 1.0 and float(y[0]) == 0.0
    # out of bounds also reads init
    x, y = m.get_voxel(GEOM, state, TSDF, jnp.array([[-1, 0, 0], [64, 0, 0]]))
    assert float(x[0]) == 1.0 and float(x[1]) == 1.0


def test_set_to_unallocated_is_dropped():
    state = m.make_map(GEOM, TSDF)
    state = m.set_voxels(state, jnp.array([[9, 9, 9]]), jnp.array([0.5]),
                         jnp.array([1.0]))
    x, _ = m.get_voxel(GEOM, state, TSDF, jnp.array([[9, 9, 9]]))
    assert float(x[0]) == 1.0


def test_allocation_is_idempotent():
    state = m.make_map(GEOM, TSDF)
    state = _alloc(state, [[1, 1, 1]])
    slot_before = int(state.slot[1, 1, 1])
    state = _alloc(state, [[1, 1, 1], [2, 2, 2]])
    assert int(state.n_blocks) == 2
    assert int(state.slot[1, 1, 1]) == slot_before


def test_capacity_overflow_drops_extras():
    geom = m.MapGeometry(size=64, dim=2.0, capacity=3)
    state = m.make_map(geom, TSDF)
    touched = jnp.ones((geom.blocks_per_side,) * 3, bool)
    state = m.allocate_blocks(geom, state, touched)
    assert int(state.n_blocks) == 3
    assert int((state.slot >= 0).sum()) == 3


def test_new_blocks_are_active():
    state = m.make_map(GEOM, TSDF)
    state = _alloc(state, [[4, 4, 4]])
    slot = int(state.slot[4, 4, 4])
    assert bool(state.active[slot])


def test_coarse_fallback_levels():
    state = m.make_map(GEOM, TSDF)
    state = _alloc(state, [[0, 0, 0]])
    # neighbour block (sibling of allocated one): parent node exists, so its
    # level-0 coarse slot exists; write a sentinel there and read through
    mip0 = state.mip_x[0].at[1, 0, 0].set(-7.0)
    state = state._replace(mip_x=(mip0,) + state.mip_x[1:])
    assert bool(state.mip_alloc[0][1, 0, 0])
    x, _ = m.get_with_coarse(GEOM, state, TSDF, jnp.array([[9, 3, 3]]))
    assert float(x[0]) == -7.0
    # far-away block: only the children-of-root level exists -> init value
    x, _ = m.get_with_coarse(GEOM, state, TSDF, jnp.array([[60, 60, 60]]))
    assert float(x[0]) == 1.0
    top = GEOM.num_levels - 2
    assert bool(state.mip_alloc[top].all())


def test_morton_keys_follow_block_coords():
    state = m.make_map(GEOM, TSDF)
    state = _alloc(state, [[1, 2, 3]])
    keys = np.asarray(m.morton_keys(state))
    slot = int(state.slot[1, 2, 3])
    from supereight_tpu.core import morton
    assert keys[slot] == int(morton.encode(1, 2, 3))
