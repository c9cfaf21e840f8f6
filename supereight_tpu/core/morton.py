"""3D Morton (Z-order) codes, vectorized for JAX.

Semantics match the reference's key algebra (ref:
se_core/include/se/utils/morton_utils.hpp:37-72 and
se_core/include/se/octant_ops.hpp) but operate on *block-grid*
coordinates packed into uint32 (10 bits per axis, block grids up to
1024^3), the natural key width for a pooled block map.  The reference's
64-bit (morton | level) keys are only needed where a level tag rides
along (multi-scale allocation); we keep the level as a separate integer
instead of packing it into low bits.

Morton order is the canonical z-major interleave: bit k of x lands at
bit 3k, y at 3k+1, z at 3k+2 — identical to compute_morton
(morton_utils.hpp:62-72), so serialized keys sort in the same order as
the reference's.
"""

import jax.numpy as jnp


def expand_bits(x):
    """Spread the low 10 bits of each lane of ``x`` to every third bit.

    uint32 in, uint32 out. Mirrors ``expand`` (morton_utils.hpp:37-45).
    """
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def compact_bits(x):
    """Inverse of :func:`expand_bits` (mirrors ``compact``, morton_utils.hpp:47-55)."""
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def encode(x, y, z):
    """Morton-encode integer coordinates (each < 1024) into uint32."""
    return (
        expand_bits(x)
        | (expand_bits(y) << 1)
        | (expand_bits(z) << 2)
    )


def encode_v(coords):
    """Morton-encode an int array of shape [..., 3]."""
    return encode(coords[..., 0], coords[..., 1], coords[..., 2])


def decode(code):
    """Decode a uint32 Morton code into (x, y, z) int32 arrays."""
    code = jnp.asarray(code, jnp.uint32)
    x = compact_bits(code)
    y = compact_bits(code >> 1)
    z = compact_bits(code >> 2)
    return (
        x.astype(jnp.int32),
        y.astype(jnp.int32),
        z.astype(jnp.int32),
    )


def decode_v(code):
    """Decode uint32 Morton codes into an int32 array of shape [..., 3]."""
    x, y, z = decode(code)
    return jnp.stack([x, y, z], axis=-1)
