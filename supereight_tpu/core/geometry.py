"""Geometric queries over the map: AABB tests and occupancy collision.

Behavioral reference: se_core/include/se/geometry/aabb_collision.hpp
(axis-overlap / inclusion tests) and octree_collision.hpp (map-vs-AABB
collision with the {occupied, unseen, empty} state machine,
octree_collision.hpp:37-171).

The reference classifies an AABB by explicit-stack octree DFS; with the
dense pool the same classification is a batched scan over the voxels (or
coarse octants) the box covers, with unallocated regions classified by
the finest existing coarse value — the behavior of ``collides_with``'s
"unallocated child -> parent value" rule.
"""

import enum

import jax.numpy as jnp

from supereight_tpu.core import map as m


class CollisionStatus(enum.IntEnum):
    """Ref collision_status, octree_collision.hpp:37-41."""
    OCCUPIED = 2
    UNSEEN = 1
    EMPTY = 0


def axis_overlap(a_center, a_half, b_center, b_half):
    """Separating-axis overlap of two 1D intervals
    (ref aabb_collision.hpp:36-50)."""
    return jnp.abs(b_center - a_center) <= (a_half + b_half)


def aabb_aabb_collision(a_min, a_max, b_min, b_max):
    """Box-box overlap test (ref aabb_collision.hpp:59-65)."""
    a_min = jnp.asarray(a_min, jnp.float32)
    a_max = jnp.asarray(a_max, jnp.float32)
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    ac, ah = (a_min + a_max) / 2, (a_max - a_min) / 2
    bc, bh = (b_min + b_max) / 2, (b_max - b_min) / 2
    return jnp.all(axis_overlap(ac, ah, bc, bh), axis=-1)


def aabb_aabb_inclusion(a_min, a_max, b_min, b_max):
    """True if box b is fully inside box a (ref aabb_collision.hpp:67-73)."""
    return jnp.all((jnp.asarray(b_min) >= jnp.asarray(a_min))
                   & (jnp.asarray(b_max) <= jnp.asarray(a_max)), axis=-1)


def _status_from_value(x, y, occupied_pred):
    """Per-sample {occupied, unseen, empty} classification.

    Matches the reference's rules: unobserved (weight/timestamp == 0) is
    UNSEEN; otherwise occupied_pred(x) decides OCCUPIED vs EMPTY."""
    unseen = y == 0
    occ = occupied_pred(x)
    return jnp.where(unseen, CollisionStatus.UNSEEN,
                     jnp.where(occ, CollisionStatus.OCCUPIED,
                               CollisionStatus.EMPTY)).astype(jnp.int32)


def collides_with(geom, state, field, bbox_min_vox, bbox_max_vox,
                  occupied_pred=None):
    """Classify the voxel AABB [min, max) against the map
    (ref collides_with, octree_collision.hpp:110-171).

    Priority matches the reference's state machine (49-65): any OCCUPIED
    sample dominates; else any UNSEEN; else EMPTY.
    Coordinates are integer voxels; max is exclusive.
    """
    if occupied_pred is None:
        def occupied_pred(x):
            return x < 0.0 if field.name == "tsdf" else x > 0.0

    lo = jnp.asarray(bbox_min_vox, jnp.int32)
    hi = jnp.asarray(bbox_max_vox, jnp.int32)
    # sample every voxel in the box (static bound = box size at trace time)
    sx, sy, sz = (int(hi[0] - lo[0]), int(hi[1] - lo[1]),
                  int(hi[2] - lo[2]))
    gx, gy, gz = jnp.meshgrid(jnp.arange(sx), jnp.arange(sy),
                              jnp.arange(sz), indexing="ij")
    v = jnp.stack([gx, gy, gz], axis=-1) + lo
    x, y = m.get_with_coarse(geom, state, field, v)
    status = _status_from_value(x, y, occupied_pred)
    any_occupied = jnp.any(status == CollisionStatus.OCCUPIED)
    any_unseen = jnp.any(status == CollisionStatus.UNSEEN)
    return jnp.where(any_occupied, CollisionStatus.OCCUPIED,
                     jnp.where(any_unseen, CollisionStatus.UNSEEN,
                               CollisionStatus.EMPTY)).astype(jnp.int32)
