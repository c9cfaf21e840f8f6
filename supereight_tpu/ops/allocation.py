"""Voxel-block allocation from depth frames.

Behavioral reference: kfusion/alloc_impl.hpp (TSDF: allocate the +/- band
around each depth sample) and bfusion/alloc_impl.hpp (occupancy: march the
whole camera->surface ray, allocating coarser octants further from the
surface band).

TPU design: the reference's atomic append-to-list + sort + unique
(octree.hpp:792-817) becomes a dense boolean scatter — every marched
sample sets a bit in a [B,B,B] block-touched grid (dedup for free), and
``core.map.allocate_blocks`` turns the grid into pool slots with one
prefix sum. Because the occupancy step schedule depends only on distance
travelled (compute_stepsize, bfusion/alloc_impl.hpp:37-45), the sample
ladder is *static*, so the whole multi-scale march is one fixed-shape
gather/scatter program.
"""

import math

import jax
import jax.numpy as jnp

from supereight_tpu.constants import BLOCK_SIDE
from supereight_tpu.core import se3
from supereight_tpu.core import map as m


def _pixel_rays(depth, pose, k):
    """World-space surface points and ray directions toward the camera.

    Mirrors the shared preamble of both allocators: worldVertex =
    pose * invK * ((x+.5)d, (y+.5)d, d), direction = normalize(cam - wv).
    """
    h, w = depth.shape
    inv_k = se3.inverse_camera_matrix(k)
    kpose = jnp.matmul(pose, inv_k, precision=jax.lax.Precision.HIGHEST)
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([px * depth, py * depth, depth], axis=-1)
    world_vertex = se3.transform(kpose, pix)
    camera = pose[:3, 3]
    direction = camera - world_vertex
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.where(norm == 0, 1.0, norm)
    return world_vertex, direction, camera


def _scatter_touched(geom, positions, valid):
    """Scatter sample positions (world meters, [..., 3]) into a block mask."""
    b = geom.blocks_per_side
    voxel = jnp.floor(positions * geom.inv_voxel_size).astype(jnp.int32)
    inb = jnp.all((voxel >= 0) & (voxel < geom.size), axis=-1) & valid
    bc = voxel // BLOCK_SIDE
    bc = jnp.where(inb[..., None], bc, b)  # out-of-range -> dropped
    touched = jnp.zeros((b, b, b), bool)
    return touched.at[bc[..., 0].reshape(-1), bc[..., 1].reshape(-1),
                      bc[..., 2].reshape(-1)].set(True, mode="drop")


def tsdf_touched_mask(geom, depth, pose, k, mu: float):
    """Blocks intersected by the +/- 2*mu band around each depth sample
    (ref buildAllocationList, kfusion/alloc_impl.hpp:53-118).

    The reference samples every voxel along the band; since only the set
    of touched 8^3 *blocks* matters, sampling every 2 voxels halves the
    scatter volume while still hitting every block the ray spends >2
    voxels in (a corner-clipped block can be picked up a frame later)."""
    band = 2.0 * mu
    num_steps = int(math.ceil(band * geom.inv_voxel_size / 2.0))
    world_vertex, direction, _ = _pixel_rays(depth, pose, k)
    origin = world_vertex - (band * 0.5) * direction
    step = band / num_steps
    s = jnp.arange(num_steps, dtype=jnp.float32) * step
    positions = origin[..., None, :] + s[:, None] * direction[..., None, :]
    valid = (depth > 0)[..., None] & jnp.ones(num_steps, bool)
    return _scatter_touched(geom, positions, valid)


def ofusion_step_ladder(geom, band: float, max_dist: float):
    """Static (travelled-distance, mip-level) schedule of the occupancy
    ray march (ref compute_stepsize + step_to_depth,
    bfusion/alloc_impl.hpp:37-51).

    Depth 'max_depth' maps to voxel steps handled at block level (ref
    clamps allocation depth to the leaves level); 10x/30x voxel steps land
    on mip levels 1 and 2 (octant sides 16 and 64... sides 16 and 32).
    """
    voxel = geom.voxel_size
    travelled = []
    levels = []
    t = 0.0
    while t < max_dist:
        travelled.append(t)
        if t < band:
            step, lvl = voxel, 0
        elif t < band * 1.5:
            step, lvl = 10.0 * voxel, 1
        else:
            step, lvl = 30.0 * voxel, 2
        # level of the *next* sample derives from this step size
        # (the first sample is always at block level, tree_depth=max_depth)
        levels.append(lvl)
        t += step
    # level[i] applies to sample i+1; sample 0 is block level.
    sample_levels = [0] + levels[:-1]
    return travelled, sample_levels


def ofusion_touched_masks(geom, depth, pose, k, mu: float,
                          max_dist: float = None):
    """Per-level touched masks for occupancy allocation
    (ref buildOctantList, bfusion/alloc_impl.hpp:53-129).

    Returns (block_touched [B,B,B], extra_levels tuple for
    ``refresh_mip_alloc`` with masks at levels 1 and 2).
    """
    band = 6.0 * mu
    if max_dist is None:
        max_dist = geom.dim * math.sqrt(3.0)
    travelled, sample_levels = ofusion_step_ladder(geom, band, max_dist)

    world_vertex, direction, camera = _pixel_rays(depth, pose, k)
    origin = world_vertex - (band * 0.5) * direction
    dist = jnp.linalg.norm(camera - origin, axis=-1)

    b = geom.blocks_per_side
    masks = {0: jnp.zeros((b, b, b), bool),
             1: jnp.zeros((b // 2,) * 3, bool),
             2: jnp.zeros((b // 4,) * 3, bool)}
    trav = jnp.asarray(travelled, jnp.float32)
    for lvl in sorted(set(sample_levels)):
        sel = [i for i, l in enumerate(sample_levels) if l == lvl]
        ts = trav[jnp.asarray(sel)]
        positions = (origin[..., None, :]
                     + ts[:, None] * direction[..., None, :])
        valid = ((depth > 0)[..., None]
                 & (ts[None, None, :] < dist[..., None]))
        voxel = jnp.floor(positions * geom.inv_voxel_size).astype(jnp.int32)
        inb = jnp.all((voxel >= 0) & (voxel < geom.size), axis=-1) & valid
        side_blocks = b >> lvl
        oc = voxel // (BLOCK_SIDE << lvl)
        oc = jnp.where(inb[..., None], oc, side_blocks)
        masks[lvl] = masks[lvl].at[
            oc[..., 0].reshape(-1), oc[..., 1].reshape(-1),
            oc[..., 2].reshape(-1)].set(True, mode="drop")

    extra = [None] * geom.num_levels
    if geom.num_levels > 1:
        extra[1] = masks[1]
    if geom.num_levels > 2:
        extra[2] = masks[2]
    return masks[0], tuple(extra)


def allocate_tsdf(geom, state, depth, pose, k, mu: float):
    """Full TSDF allocation step: band march -> block pool update."""
    touched = tsdf_touched_mask(geom, depth, pose, k, mu)
    return m.allocate_blocks(geom, state, touched)


def allocate_ofusion(geom, state, depth, pose, k, mu: float):
    """Full occupancy allocation step: multi-scale march -> pool + mips."""
    touched, extra = ofusion_touched_masks(geom, depth, pose, k, mu)
    state = m.allocate_blocks(geom, state, touched)
    return m.refresh_mip_alloc(geom, state, state.slot >= 0,
                               extra_levels=extra)
