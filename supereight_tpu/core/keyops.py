"""Octant key algebra over (morton, level) pairs.

Behavioral reference: se::keyops (se_core/include/se/octant_ops.hpp) and
the sorted-key compaction algorithms (se_core/include/se/algorithms/
unique.hpp). The pooled map does not need pointer insertion, but the key
algebra remains the vocabulary for serialization, sharding by morton
range, and multi-scale allocation, and is kept API-compatible.

A key here is a pair (code: uint32 morton over block/voxel coords,
level: int32), the unpacked form of the reference's packed 64-bit
``morton | level`` keys (octree_defines.h:44-80). ``max_depth`` is the
tree depth of a single voxel (log2 of the map size).
"""

import jax.numpy as jnp

from supereight_tpu.core import morton


def code_at_level(code, level, max_depth):
    """Mask a voxel-level morton code down to octant granularity at
    ``level`` (ref compute_prefix / MASK table, octree_defines.h:58-80).

    Level 0 = root, level max_depth = single voxel.
    """
    level = jnp.asarray(level)
    shift = 3 * (jnp.asarray(max_depth) - level)
    mask = ~jnp.uint32(0) << shift.astype(jnp.uint32)
    return jnp.asarray(code, jnp.uint32) & mask


def parent(code, level, max_depth):
    """Key of the parent octant (ref keyops::parent, octant_ops.hpp:95-99)."""
    plevel = jnp.asarray(level) - 1
    return code_at_level(code, plevel, max_depth), plevel


def child_id(code, level, max_depth):
    """Which of its parent's 8 children an octant is
    (ref child_id, octant_ops.hpp:107-113)."""
    shift = 3 * (jnp.asarray(max_depth) - jnp.asarray(level))
    return ((jnp.asarray(code, jnp.uint32) >> shift.astype(jnp.uint32))
            & jnp.uint32(7)).astype(jnp.int32)


def descendant(code, ancestor_code, ancestor_level, max_depth):
    """True if ``code`` lies inside the ancestor octant
    (ref descendant, octant_ops.hpp:81-88)."""
    return code_at_level(code, ancestor_level, max_depth) == \
        code_at_level(ancestor_code, ancestor_level, max_depth)


def face_neighbour(code, level, max_depth, axis, direction):
    """Same-level neighbour across a face (ref face_neighbour,
    octant_ops.hpp:64-73, the p4est algorithm 5 — here via coordinate
    arithmetic, which the dense grid makes exact).

    Returns (code, valid); invalid when the neighbour leaves the map.
    """
    side_log = jnp.asarray(max_depth) - jnp.asarray(level)
    step = (jnp.int32(1) << side_log).astype(jnp.int32)
    coords = morton.decode_v(code)
    delta = jnp.zeros_like(coords).at[..., axis].set(
        jnp.where(direction > 0, step, -step))
    n = coords + delta
    size = jnp.int32(1) << jnp.asarray(max_depth)
    valid = jnp.all((n >= 0) & (n < size), axis=-1)
    return morton.encode_v(jnp.clip(n, 0, size - 1)), valid


def siblings(code, level, max_depth):
    """All 8 children of the parent (ref siblings, octant_ops.hpp:175-183).
    Returns codes of shape [..., 8]."""
    pcode = code_at_level(code, jnp.asarray(level) - 1, max_depth)
    shift = 3 * (jnp.asarray(max_depth) - jnp.asarray(level))
    ids = jnp.arange(8, dtype=jnp.uint32)
    return pcode[..., None] | (ids << shift.astype(jnp.uint32))


def far_corner(code, level, max_depth):
    """Corner of the octant farthest from its parent's centre
    (ref far_corner, octant_ops.hpp:121-129): the corner shared with
    siblings in the same parent octant."""
    cid = child_id(code, level, max_depth)
    side = (jnp.int32(1) << (jnp.asarray(max_depth)
                             - jnp.asarray(level))).astype(jnp.int32)
    coords = morton.decode_v(code)
    offs = jnp.stack([(cid & 1), (cid >> 1) & 1, (cid >> 2) & 1],
                     axis=-1) * side
    return coords + offs


def unique(sorted_codes, valid):
    """Mask of first occurrences in a sorted key array
    (ref algorithms::unique, unique.hpp:36-47) — compaction itself is a
    cumsum-scatter in the caller, as in core.map.allocate_blocks."""
    prev = jnp.concatenate([sorted_codes[:1] ^ jnp.uint32(1),
                            sorted_codes[:-1]])
    return valid & (sorted_codes != prev)


def filter_ancestors(sorted_codes, levels, valid, max_depth):
    """Keep only the deepest key of each ancestor chain
    (ref filter_ancestors, unique.hpp:49-61): with keys sorted by code,
    an ancestor directly precedes its descendants; drop a key whose
    successor is its own descendant."""
    nxt_code = jnp.concatenate([sorted_codes[1:], sorted_codes[-1:]])
    nxt_level = jnp.concatenate([levels[1:], levels[-1:]])
    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
    strict_anc = nxt_valid & (nxt_level > levels) \
        & (code_at_level(nxt_code, levels, max_depth) == sorted_codes)
    return valid & ~strict_anc


def unique_multiscale(sorted_codes, levels, valid):
    """Per-code dedup keeping the finest level
    (ref unique_multiscale, unique.hpp:63-79). Assumes sort by
    (code, level) ascending; the last entry of a code run has the finest
    level, so keep entries whose successor differs in code."""
    nxt = jnp.concatenate([sorted_codes[1:],
                           sorted_codes[-1:] ^ jnp.uint32(1)])
    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
    return valid & ((sorted_codes != nxt) | ~nxt_valid)
