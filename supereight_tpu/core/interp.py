"""Trilinear interpolation and central-difference gradients over the block map.

Matches the reference's sampling semantics: field values are anchored at
integer voxel coordinates and interpolated between them
(ref: se_core/include/se/octree.hpp:542-563 ``interp``), with unallocated
stencil corners reading the field's ``empty()`` value
(ref: interp_gather.hpp:43-103) and gradient stencils reading ``init``
(ref: octree.hpp:652-737 ``grad`` which uses ``get``-with-init).

The reference specializes the 8-corner gather by which block faces the
stencil crosses (the crossmask switch, interp_gather.hpp:105-237) to save
pointer descents. With dense slot addressing every corner is an O(1)
gather, so no specialization is needed — the batched gather of 8 corners
per query point is a single XLA gather op.
"""

import jax.numpy as jnp

from supereight_tpu.core import map as m

# Corner offsets in the same order as interp_offsets (interp_gather.hpp:39-41).
_OFFSETS = jnp.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.int32)


def _gather_corners(geom, state, field, base, channel, fill):
    """Fetch the 8 corner values of the 2x2x2 stencil at ``base`` [..., 3]."""
    corners = base[..., None, :] + _OFFSETS          # [..., 8, 3]
    return m.get_voxel_channel(geom, state, field, corners, channel,
                               fill=fill[channel])


def interp(geom, state, field, pos, channel=0):
    """Trilinear interpolation at continuous voxel coords ``pos`` [..., 3].

    Matches Octree::interp (octree.hpp:542-563): base = floor(pos) clamped
    at 0, missing corners read empty().
    """
    base = jnp.floor(pos).astype(jnp.int32)
    factor = pos - jnp.floor(pos)
    lower = jnp.maximum(base, 0)
    p = _gather_corners(geom, state, field, lower, channel, field.empty)
    fx, fy, fz = factor[..., 0], factor[..., 1], factor[..., 2]
    c00 = p[..., 0] * (1 - fx) + p[..., 1] * fx
    c10 = p[..., 2] * (1 - fx) + p[..., 3] * fx
    c01 = p[..., 4] * (1 - fx) + p[..., 5] * fx
    c11 = p[..., 6] * (1 - fx) + p[..., 7] * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def grad(geom, state, field, pos, channel=0):
    """Field gradient at continuous voxel coords ``pos`` [..., 3].

    Matches Octree::grad (octree.hpp:652-737): trilinearly-interpolated
    central differences with index clamping at the map boundary, scaled by
    0.5 * voxel_size (metric gradient of the raw field value). Missing
    samples read the field's init value.
    """
    base = jnp.floor(pos).astype(jnp.int32)
    factor = pos - jnp.floor(pos)
    size = geom.size
    lo_lo = jnp.maximum(base - 1, 0)
    lo_up = jnp.maximum(base, 0)
    up_lo = jnp.minimum(base + 1, size - 1)
    up_up = jnp.minimum(base + 2, size - 1)
    lower, upper = lo_up, up_lo

    def fetch(ix, iy, iz):
        v = jnp.stack([ix, iy, iz], axis=-1)
        x, y = m.get_voxel(geom, state, field, v)
        return x if channel == 0 else y

    fx, fy, fz = factor[..., 0], factor[..., 1], factor[..., 2]

    # Axis 0 (x): difference along x at the 8 (y, z) corner combinations.
    def dx(yc, zc):
        return ((fetch(up_lo[..., 0], yc, zc) - fetch(lo_lo[..., 0], yc, zc))
                * (1 - fx)
                + (fetch(up_up[..., 0], yc, zc) - fetch(lo_up[..., 0], yc, zc))
                * fx)

    gx = ((dx(lower[..., 1], lower[..., 2]) * (1 - fy)
           + dx(upper[..., 1], lower[..., 2]) * fy) * (1 - fz)
          + (dx(lower[..., 1], upper[..., 2]) * (1 - fy)
             + dx(upper[..., 1], upper[..., 2]) * fy) * fz)

    def dy(xc, zc):
        return ((fetch(xc, up_lo[..., 1], zc) - fetch(xc, lo_lo[..., 1], zc))
                * (1 - fy)
                + (fetch(xc, up_up[..., 1], zc) - fetch(xc, lo_up[..., 1], zc))
                * fy)

    gy = ((dy(lower[..., 0], lower[..., 2]) * (1 - fx)
           + dy(upper[..., 0], lower[..., 2]) * fx) * (1 - fz)
          + (dy(lower[..., 0], upper[..., 2]) * (1 - fx)
             + dy(upper[..., 0], upper[..., 2]) * fx) * fz)

    def dz(xc, yc):
        return ((fetch(xc, yc, up_lo[..., 2]) - fetch(xc, yc, lo_lo[..., 2]))
                * (1 - fz)
                + (fetch(xc, yc, up_up[..., 2]) - fetch(xc, yc, lo_up[..., 2]))
                * fz)

    gz = ((dz(lower[..., 0], lower[..., 1]) * (1 - fx)
           + dz(upper[..., 0], lower[..., 1]) * fx) * (1 - fy)
          + (dz(lower[..., 0], upper[..., 1]) * (1 - fx)
             + dz(upper[..., 0], upper[..., 1]) * fx) * fy)

    g = jnp.stack([gx, gy, gz], axis=-1)
    return g * (0.5 * geom.voxel_size)
