"""TSDF (KinectFusion-style signed distance) field plugin.

Behavioral reference: voxel_traits<SDF> (volume_traits.hpp:41-51), the
fusion functor sdf_update (se_denseslam/src/kfusion/mapping_impl.hpp:35-65)
and the sphere-traced raycast (kfusion/rendering_impl.hpp:34-74).
Payload: x = signed distance clamped to [-1, 1] (in units of mu),
y = integer fusion weight capped at MAX_WEIGHT.
"""

import jax.numpy as jnp

from supereight_tpu.constants import MAX_WEIGHT
from supereight_tpu.fields.base import FieldSpec

TSDF = FieldSpec(
    name="tsdf",
    init=(1.0, 0.0),
    empty=(1.0, -1.0),
    multiscale_alloc=False,
    invert_normals=True,
)


def update(old_x, old_y, pos_cam, depth_sample, mu, valid):
    """Fuse one depth observation into TSDF voxels (ref sdf_update, 35-65).

    pos_cam: voxel position in the camera frame — a (x, y, z) tuple of
    component arrays (TPU shape discipline, se3.transform_c).
    Returns (new_x, new_y, wrote) with the running weighted mean of the
    truncated SDF along the pixel ray; non-writes pass old values through.
    """
    px, py_, pz = pos_cam
    # distance along the ray to the voxel's depth plane, scaled to ray length
    ray_scale = jnp.sqrt(1.0 + (px / pz) ** 2 + (py_ / pz) ** 2)
    diff = (depth_sample - pz) * ray_scale
    write = valid & (depth_sample > 0) & (diff > -mu)
    sdf = jnp.minimum(1.0, diff / mu)
    new_x = jnp.clip((old_y * old_x + sdf) / (old_y + 1.0), -1.0, 1.0)
    new_y = jnp.minimum(old_y + 1.0, MAX_WEIGHT)
    return (jnp.where(write, new_x, old_x),
            jnp.where(write, new_y, old_y),
            write)
