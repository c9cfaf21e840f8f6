"""Collision / AABB / functor tests (model:
se_core/test/geometry/*_unittest.cpp, functor/axisaligned_unittest.cpp)."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import functor, geometry, map as m
from supereight_tpu.core.geometry import CollisionStatus
from supereight_tpu.fields import TSDF

GEOM = m.MapGeometry(size=64, dim=2.0, capacity=64)


def test_aabb_aabb():
    assert bool(geometry.aabb_aabb_collision([0, 0, 0], [2, 2, 2],
                                             [1, 1, 1], [3, 3, 3]))
    assert not bool(geometry.aabb_aabb_collision([0, 0, 0], [1, 1, 1],
                                                 [2, 2, 2], [3, 3, 3]))
    assert bool(geometry.aabb_aabb_inclusion([0, 0, 0], [4, 4, 4],
                                             [1, 1, 1], [2, 2, 2]))
    assert not bool(geometry.aabb_aabb_inclusion([0, 0, 0], [4, 4, 4],
                                                 [3, 3, 3], [5, 5, 5]))


def _map_with_block(value, weight):
    state = m.make_map(GEOM, TSDF)
    touched = jnp.zeros((8, 8, 8), bool).at[1, 1, 1].set(True)
    state = m.allocate_blocks(GEOM, state, touched)
    g = np.arange(8, 16)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    v = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    state = m.set_voxels(state, jnp.asarray(v),
                         jnp.full(len(v), value), jnp.full(len(v), weight))
    return state


def test_collision_states():
    # occupied region (sdf < 0, observed)
    state = _map_with_block(-0.5, 10.0)
    st = int(geometry.collides_with(GEOM, state, TSDF, (9, 9, 9),
                                    (12, 12, 12)))
    assert st == CollisionStatus.OCCUPIED
    # observed free region
    state = _map_with_block(0.8, 10.0)
    st = int(geometry.collides_with(GEOM, state, TSDF, (9, 9, 9),
                                    (12, 12, 12)))
    assert st == CollisionStatus.EMPTY
    # unallocated, never observed -> unseen
    st = int(geometry.collides_with(GEOM, state, TSDF, (40, 40, 40),
                                    (44, 44, 44)))
    assert st == CollisionStatus.UNSEEN
    # occupied dominates mixed boxes
    state = _map_with_block(-0.5, 10.0)
    st = int(geometry.collides_with(GEOM, state, TSDF, (9, 9, 9),
                                    (30, 12, 12)))
    assert st == CollisionStatus.OCCUPIED


def test_axis_aligned_functor_whole_map():
    state = _map_with_block(0.5, 1.0)

    def double(x, y, vox):
        return x * 2.0, y + 1.0

    state2 = functor.axis_aligned_map(GEOM, state, double)
    x, y = m.get_voxel(GEOM, state2, TSDF, jnp.array([[9, 9, 9]]))
    assert float(x[0]) == 1.0 and float(y[0]) == 2.0


def test_axis_aligned_functor_box_scoped():
    state = _map_with_block(0.5, 1.0)

    def zero(x, y, vox):
        return jnp.zeros_like(x), y

    state2 = functor.axis_aligned_map(GEOM, state, zero,
                                      bbox_min=(8, 8, 8),
                                      bbox_max=(10, 16, 16))
    x, _ = m.get_voxel(GEOM, state2, TSDF,
                       jnp.array([[9, 9, 9], [12, 9, 9]]))
    assert float(x[0]) == 0.0
    assert float(x[1]) == 0.5  # outside the box, untouched
