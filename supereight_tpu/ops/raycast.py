"""Sparse-map raycasting: vertex/normal map extraction.

Behavioral reference: raycastKernel (se_denseslam/src/rendering.cpp:50-90)
driving the field-specific marchers kfusion/rendering_impl.hpp:34-74
(TSDF sphere tracing with unknown-space skipping) and
bfusion/rendering_impl.hpp:35-68 (occupancy constant-step march).

TPU design (see CLAUDE.md "TPU perf laws": gathers are SERIAL, ~7 ns per
gathered ROW from fast-zone (≤96 MB) tables; 8-16-wide rows amortize to
~3.4-4.6 ns/row — so the design minimizes gathered rows and keeps every
marching table under the ~96 MB fast-gather threshold):

* ``nav`` — one i32 [B^3] grid (1 MB): the pool slot for allocated block
  cells, minus the capped chebyshev block-distance for empty cells. ONE
  gather per probe yields both addressing and the safe empty-space jump,
  replacing the reference's octree ray iterator
  (ray_iterator.hpp:116-226).
* ``strips`` — the pool re-rowed as x-lines, a PAIR of
  [(cap+1)*64, 8] tables (brick x-line; next-x brick's x-line — see
  build_strips; f32 rows up to 16k bricks, bf16 above — strips_dtype):
  weight-0 voxels carry an UNKNOWN sentinel, row block 0
  is the sentinel brick for unallocated cells. A march probe is
  nav-gather + one left-row gather + vectorized lane select; a
  trilinear stencil needs 4 row-index computations with (left, right)
  fetch pairs per (y,z) corner and (x, x+1) lane-selected in registers,
  the sentinel decoding to the field's init fill.
  One fetch set yields BOTH the value and the trilinear cell gradient;
  the hit refinement is a Newton step along the ray on that fetch and
  the surface normal is the same cell gradient. (Deviation from the
  reference's bracket interpolation + 4^3-ladder gradient
  (octree.hpp:652-737), documented: inside a cell the trilinear Newton
  step equals the reference's zero-crossing solve, and the cell gradient
  is the exact gradient of the interpolant; the bf16 fallback for
  big tables adds <1 mm surface noise. The exact reference gradient
  remains in core/interp.py for the Volume API and tests.)
* Rays march in lockstep, fully unrolled on TPU (rolled on CPU —
  utils/loops.bounded_steps), in a compaction cascade: a short
  full-image pass, then unfinished rays compact into geometrically
  smaller batches for longer budgets. Serial gathers cost rows-per-step,
  so narrowing the live set is what early exit becomes here. Depth
  priming (prime_from_depth) starts rays one truncation band before the
  predicted surface, which is what makes the first pass short.
"""

import functools
import os

import jax
import jax.numpy as jnp

from supereight_tpu.constants import (BLOCK_SIDE, FAR_PLANE, INVALID,
                                      NEAR_PLANE, SURF_BOUNDARY)
from supereight_tpu.core import se3
from supereight_tpu.utils.loops import bounded_steps, lane_select

MAX_JUMP = 6   # cap of the chebyshev block-distance transform

def ray_directions_c(view, width, height):
    """Per-pixel world-space ray dir components (ref rendering.cpp:62-65);
    view = raycast_pose @ invK. Returns three [h, w] arrays."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    dx, dy, dz = se3.rotate_c(view, px, py, jnp.ones_like(px))
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv


def ray_directions(view, width, height):
    """Stacked [h, w, 3] wrapper (rendering paths)."""
    dx, dy, dz = ray_directions_c(view, width, height)
    return jnp.stack([dx, dy, dz], axis=-1)


def ray_box_range_c(origin, dx, dy, dz, dim, near=NEAR_PLANE, far=FAR_PLANE):
    """Clip rays against the map cube [0, dim]^3 and the near/far planes.

    ``origin`` is the (shared) camera position, a length-3 vector.
    """
    def axis(o, d):
        inv = 1.0 / jnp.where(d == 0, 1e-12, d)
        a, b = -o * inv, (dim - o) * inv
        return jnp.minimum(a, b), jnp.maximum(a, b)

    lo_x, hi_x = axis(origin[0], dx)
    lo_y, hi_y = axis(origin[1], dy)
    lo_z, hi_z = axis(origin[2], dz)
    tmin = jnp.maximum(jnp.maximum(lo_x, lo_y), lo_z)
    tmax = jnp.minimum(jnp.minimum(hi_x, hi_y), hi_z)
    return jnp.maximum(tmin, near), jnp.minimum(tmax, far)


def _sentinel(field):
    """Unknown-space sentinel; values >= sentinel/2 decode as unknown.

    TSDF x is clamped to [-1, 1] (volume_traits.hpp:41-51) -> 2.
    OFusion log-odds are clamped to +-1000 (volume_traits.hpp:74-81)
    -> 4096. Both are exactly representable in bf16.
    """
    return 2.0 if field.name == "tsdf" else 4096.0


def block_distance(geom, state, max_jump: int = MAX_JUMP):
    """Chebyshev distance (blocks, capped) to the nearest allocated block:
    ``max_jump - 1`` dense 3^3 min-dilations of the allocation mask."""
    occupied = (state.slot >= 0)
    d = jnp.where(occupied, 0, max_jump).astype(jnp.float32)
    for _ in range(max_jump - 1):
        neigh = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        d = jnp.minimum(d, neigh + 1.0)
    return d


def coarse_cell_grid(geom, state):
    """Finest existing coarse (mip) value per block cell: ([B,B,B] f32,
    [B,B,B] bool exists). Mirrors Octree::get's descent-stops-at-missing-
    child coarse fallback (octree.hpp:333-355) at block granularity.
    Existence requires an updated value (data.y > 0 — the gate the
    reference occupancy raycast applies, bfusion/rendering_impl.hpp:52).
    """
    b = geom.blocks_per_side
    val = jnp.zeros((b, b, b), jnp.float32)
    have = jnp.zeros((b, b, b), bool)
    for lvl in range(geom.num_levels):
        r = 1 << lvl
        ex = state.mip_alloc[lvl] & (state.mip_y[lvl] > 0)
        mx = state.mip_x[lvl]
        if r > 1:
            ex = jnp.repeat(jnp.repeat(jnp.repeat(ex, r, 0), r, 1), r, 2)
            mx = jnp.repeat(jnp.repeat(jnp.repeat(mx, r, 0), r, 1), r, 2)
        take = ex & ~have
        val = jnp.where(take, mx, val)
        have = have | take
    return val, have


def build_nav(geom, state, field=None, bucket=None):
    """i32 [B^3] navigation grid, ONE gather per probe decodes everything.

    * allocated cells: the pool slot (>= 0);
    * empty cells: -(1 + e) with packed e =
        bits 0-2   chebyshev block distance to the nearest allocated
                   block (capped at MAX_JUMP) — the safe empty-space jump,
        bit  3     (OFusion only) a coarse mip value exists here and is
                   free space (log-odds <= SURF_BOUNDARY),
        bits 4+    (OFusion only) the coarse log-odds magnitude,
                   quantized to 1/16 (value = -(e >> 4) / 16).

    The coarse payload is what lets the occupancy march treat allocated
    free space as KNOWN (reference marches it via Octree::get's coarse
    fallback, bfusion/rendering_impl.hpp:50-57) while still jumping it at
    block granularity: a >0 crossing can only occur inside the ±band
    blocks (the occupancy allocator places blocks over the whole surface
    band, bfusion/alloc_impl.hpp:75-95), so sampling each traversed cell
    once is exact. Coarse cells with positive log-odds are left UNKNOWN
    (no crossing outside blocks — documented deviation).
    """
    d = block_distance(geom, state).astype(jnp.int32)
    e = d  # dist in bits 0-2 (d >= 1 for empty cells)
    if field is not None and field.name == "ofusion":
        cval, have = coarse_cell_grid(geom, state)
        known_free = have & (cval <= SURF_BOUNDARY)
        q = jnp.round(jnp.clip(-cval, 0.0, 1000.0) * 16.0).astype(jnp.int32)
        e = e + jnp.where(known_free, 8 + (q << 4), 0)
    ok = state.slot >= 0
    if bucket is not None and bucket < geom.capacity:
        # slots beyond the strips bucket have no table row: read as
        # UNKNOWN (e stays 0 for them -> fine 1-block steps) rather than
        # fetching another block's strip. The fused step sizes the
        # bucket above the live count, so this only guards mid-frame
        # growth past the bucket.
        ok = ok & (state.slot < bucket)
    return jnp.where(ok, state.slot, -(1 + e)).reshape(-1)


def strips_dtype(n_bricks):
    """Strip-table dtype rule, shared by the single-chip table
    (build_strips) and the distributed halo table
    (parallel/dist_step.py) so the two raycast paths always march at
    the same precision (the frame-by-frame dist == single invariant,
    tests/test_dist.py).

    f32 rows by default: removing the bf16 convert from the probe
    gathers measured 32.7 -> 36.8 fps at the bench config (r4). Above
    ~16k brick rows the f32 table (4 KB/block) would cross the ~96 MB
    fast-gather zone (CLAUDE.md law 1), so big tables fall back to
    bf16 (<1 mm surface noise, the r3 default). SE_TPU_STRIPS_BF16=1
    forces bf16 everywhere (diagnostic).
    """
    if os.environ.get("SE_TPU_STRIPS_BF16") == "1" or n_bricks > 16384:
        return jnp.bfloat16
    return jnp.float32


def build_strips(geom, state, field, bucket=None):
    """[(bucket+1)*64, 16] marching/interp strips (dtype from
    strips_dtype): each row is a
    brick's x-line (lanes 0-7, strip id y + 8z) concatenated with the
    NEXT-x brick's same x-line (lanes 8-15; sentinel at map edge /
    unallocated), so both a march probe and an (x, x+1) trilinear pair
    are ONE row fetch. Row block 0 is the sentinel "unallocated" brick.

    ``bucket`` (static, default capacity) bounds the table to the first
    ``bucket`` pool slots: the pool allocates slots monotonically
    (core/map.py bump allocation) so every live slot is < n_blocks, and
    build cost scales with the table height — building over the full
    36864-slot capacity costs ~6.7 ms/frame at 512^3 while an 8192
    bucket costs ~1.5 ms. Callers must pass a bucket >= n_blocks (the
    fused step derives both this and the integration worklist budget
    from the live block count, parallel/step.integration_budget).

    (An 8-lane two-table split was measured end to end in r3: it halves
    nothing — the dominant cost is the layout copy XLA inserts to put
    the gather operand in its preferred {0,1} layout, identical for both
    forms — while doubling the trilinear stencil's fetches, 4.4 ms ->
    9.3 ms. The interleaved single table wins.)

    Values are MARCH-encoded: weight-0 voxels carry the UNKNOWN
    sentinel (the reference's y == 0 check, kfusion raycast unknown
    skip); interpolation decodes sentinel -> the field's init x, which
    equals the reference's empty()/init fill (octree.hpp:542-563,
    652-737) AND the stored value of never-updated voxels. The bf16
    fallback adds <1 mm surface noise (documented deviation).
    """
    cap = geom.capacity if bucket is None else min(bucket, geom.capacity)
    b = geom.blocks_per_side
    unk = _sentinel(field)
    dt = strips_dtype(cap)
    vals = jnp.where(state.data_y[:cap] == 0, unk,
                     state.data_x[:cap]).astype(dt)
    vals = jnp.concatenate(
        [jnp.full((1, vals.shape[1]), unk, dt), vals])

    # next-x brick slot per pool slot (edge / unallocated -> sentinel)
    bx = state.block_coord[:cap, 0] + 1
    by = state.block_coord[:cap, 1]
    bz = state.block_coord[:cap, 2]
    inb = bx < b
    nslot = state.slot.reshape(-1)[
        (jnp.clip(bx, 0, b - 1) * b + by) * b + bz]
    # out-of-bucket neighbors have no table row: treat as unallocated
    # (sentinel) like build_nav's probed-cell guard, instead of letting
    # vals[nslot+1] clamp into another block's voxel data (ADVICE r3)
    nslot = jnp.where(inb & (nslot < cap), nslot, -1)
    nslot = jnp.concatenate([jnp.full((1,), -1, jnp.int32), nslot])
    nvals = vals[nslot + 1]                                # [cap+1, 512]

    left = vals.reshape(cap + 1, 64, 8)
    right = nvals.reshape(cap + 1, 64, 8)
    return jnp.concatenate([left, right], axis=-1).reshape(-1, 16)


def _cell_and_strip(geom, vx, vy, vz):
    """Block-grid cell id and in-brick strip id for integer voxel coords."""
    b = geom.blocks_per_side
    cell = ((vx >> 3) * b + (vy >> 3)) * b + (vz >> 3)
    strip = (vy & 7) + ((vz & 7) << 3)
    return cell, strip


def _probe(geom, nav4, strips, unk, px, py, pz):
    """One marching probe at metric positions: nav4 gather + strip row +
    lane select. Returns (value, known, jump_dist_blocks, in_block).

    The march probes the SAME [B^3, 4] neighbour-pair nav table the
    refinement stencil uses (lane 0 = the probed cell — see
    :func:`build_nav4`): one table build per raycast instead of two,
    and a row gather costs the same as an element gather (gathers are
    per-ROW, CLAUDE.md perf laws).

    Empty cells decode the packed nav payload (see :func:`build_nav`):
    the jump distance always, and — when present — the coarse free-space
    value, which makes the cell KNOWN with that value (the occupancy
    march's coarse fallback, bfusion/rendering_impl.hpp:50-57).
    """
    size = geom.size
    vx = (px * geom.inv_voxel_size).astype(jnp.int32)
    vy = (py * geom.inv_voxel_size).astype(jnp.int32)
    vz = (pz * geom.inv_voxel_size).astype(jnp.int32)
    inb = ((vx >= 0) & (vx < size) & (vy >= 0) & (vy < size)
           & (vz >= 0) & (vz < size))
    vx = jnp.clip(vx, 0, size - 1)
    vy = jnp.clip(vy, 0, size - 1)
    vz = jnp.clip(vz, 0, size - 1)
    cell, strip = _cell_and_strip(geom, vx, vy, vz)
    nv = nav4[cell][..., 0]
    in_block = (nv >= 0) & inb
    row = strips[(jnp.maximum(nv, -1) + 1) * 64 + strip]      # [..., 16]
    val = lane_select(row[..., :8], vx & 7).astype(jnp.float32)
    e = jnp.where(nv < 0, -nv - 1, 0)
    coarse_known = ((e >> 3) & 1) == 1
    coarse_val = -(e >> 4).astype(jnp.float32) * (1.0 / 16.0)
    val = jnp.where(in_block, val,
                    jnp.where(coarse_known, coarse_val, unk))
    known = ((val < 0.5 * unk) & in_block) | (coarse_known & inb)
    dist = jnp.where(nv < 0, (e & 7).astype(jnp.float32), 0.0)
    dist = jnp.where(inb, dist, float(MAX_JUMP))
    return val, known, dist, in_block


def build_nav4(nav, blocks_per_side: int):
    """[B^3, 4] neighbour-pair nav table: row c = (nav[c], nav[c+1],
    nav[c+b], nav[c+b+1]) — the four (y, z) corner CELLS a trilinear
    stencil can touch (cell layout is z-minor, y next: +1 = z neighbour,
    +b = y neighbour). One row fetch replaces the four nav gathers of
    the refinement stencil (out-of-range shifts read -1 = unallocated).
    """
    b = blocks_per_side

    def shift(a, s):
        return jnp.concatenate([a[s:], jnp.full((s,), -1, a.dtype)])

    return jnp.stack([nav, shift(nav, 1), shift(nav, b), shift(nav, b + 1)],
                     axis=-1)


def _interp_grad(geom, nav4, strips, unk, fill, px, py, pz):
    """Trilinear value AND cell gradient from a 5-row fetch set: ONE
    nav4 row (all four stencil cells) + four strip rows.

    px/py/pz are continuous VOXEL coordinates. Returns
    (value, gx, gy, gz) with the gradient in per-voxel units — the exact
    gradient of the trilinear interpolant (Octree::interp semantics,
    octree.hpp:542-563; gradient deviation documented in the module
    docstring). Unknown-sentinel corners decode to ``fill`` (the
    field's init/empty x).
    """
    size = geom.size
    bx = jnp.floor(px)
    by = jnp.floor(py)
    bz = jnp.floor(pz)
    fx, fy, fz = px - bx, py - by, pz - bz
    ix = jnp.clip(bx.astype(jnp.int32), 0, size - 1)
    iy0 = jnp.clip(by.astype(jnp.int32), 0, size - 1)
    iz0 = jnp.clip(bz.astype(jnp.int32), 0, size - 1)
    iy1 = jnp.minimum(iy0 + 1, size - 1)
    iz1 = jnp.minimum(iz0 + 1, size - 1)
    lane = ix & 7

    cell00, _ = _cell_and_strip(geom, ix, iy0, iz0)
    row4 = nav4[cell00]                                   # [..., 4]
    ycross = ((iy0 & 7) == 7) & (iy1 != iy0)
    zcross = ((iz0 & 7) == 7) & (iz1 != iz0)
    cl = (ycross.astype(jnp.int32) << 1) | zcross.astype(jnp.int32)

    def pair(yk, zk, nv):
        strip = (yk & 7) + ((zk & 7) << 3)
        row = strips[(jnp.maximum(nv, -1) + 1) * 64 + strip]  # [..., 16]
        v0 = lane_select(row, lane).astype(jnp.float32)
        # x+1: lane + 1 — crossing into lane 8 picks the next-x brick's
        # first voxel (the interleaved layout's whole point)
        v1 = lane_select(row, lane + 1).astype(jnp.float32)
        v0 = jnp.where(v0 < 0.5 * unk, v0, fill)
        v1 = jnp.where(v1 < 0.5 * unk, v1, fill)
        return v0, v1

    v000, v100 = pair(iy0, iz0, row4[..., 0])
    v010, v110 = pair(iy1, iz0, lane_select(row4, cl & 2))
    v001, v101 = pair(iy0, iz1, lane_select(row4, cl & 1))
    v011, v111 = pair(iy1, iz1, lane_select(row4, cl))

    # x-lerped corner values of the (y, z) face
    c00 = v000 * (1 - fx) + v100 * fx
    c10 = v010 * (1 - fx) + v110 * fx
    c01 = v001 * (1 - fx) + v101 * fx
    c11 = v011 * (1 - fx) + v111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz

    dx00 = v100 - v000
    dx10 = v110 - v010
    dx01 = v101 - v001
    dx11 = v111 - v011
    gx = ((dx00 * (1 - fy) + dx10 * fy) * (1 - fz)
          + (dx01 * (1 - fy) + dx11 * fy) * fz)
    gy = (c10 - c00) * (1 - fz) + (c11 - c01) * fz
    gz = c1 - c0
    return val, gx, gy, gz


def _compact(n, budget, mask):
    """Fixed-budget worklist of ray indices where mask is set (-1 pads).

    top_k compaction: scatters cost per UPDATE on TPU (~0.6 ms for a
    full-image index set) while top_k over the same size is ~0.1 ms
    (CLAUDE.md perf laws)."""
    ids = jnp.arange(n, dtype=jnp.int32)
    vals, _ = jax.lax.top_k(jnp.where(mask, n - ids, 0), budget)
    return jnp.where(vals > 0, n - vals, -1)


# compaction cascades: (steps, live-fraction budget) per stage. Stage 0
# runs on all rays; later stages on geometrically fewer stragglers, so
# total gather rows stay bounded while long grazing rays still get
# ~100+ steps (the reference's per-ray loop shape). Every stage is
# UNROLLED: a rolled cond-skipped tail was measured at ~0.4 ms per step
# even with zero live rays (rolled-loop gathers pay a flat slow-path
# cost — CLAUDE.md perf laws), 25 ms for an always-skipped tail, while
# an unrolled 48-step straggler stage at 1/48 budget costs ~1 ms.
# Budgets sized from measured live-ray decay with 1.1-2x headroom; live
# rays beyond a stage budget miss for the frame AND are counted in the
# ray_overflow stat, so an undersized budget is observable rather than
# silent. Cost of a cascade = sum(budget_i * steps_i) probe rows
# (substages are unrolled — every lane pays every step). TSDF decay
# measured on the warm bench scene (tools/march_live_counts.py, r3):
# primed live of 76.8k rays: 49% after 2 steps, 27% after 4, 13.5%
# after 6, 2% after 12, 0.15% after 24, 0 by 48; cold: 60% after 6,
# 31% after 12, 8.8% after 24, 0.2% by 32. OFusion 1-voxel-crawls the
# surface-band blocks so it decays slower (measured cold: 39% after
# 16, 6% after 32, 0 by ~56).
# r4 rebalance (tools/march_scaling_r4.py): a full-width step costs
# ~1.6 ms, so stage0 drops to 2 steps (49% of primed rays finish by 2 —
# march_live_counts) and stage1 absorbs the difference at 0.50 budget;
# stage budgets run closer to the measured live decay now that the
# 4096-ray cond-skipped tail backstops misjudged frames.
_CASCADE_PRIMED_TSDF = ((2, 1.0), (4, 0.50), (6, 0.15), (16, 1.0 / 24.0),
                        (36, 1.0 / 64.0))
_CASCADE_COLD_TSDF = ((6, 1.0), (6, 0.70), (12, 0.36), (12, 0.12),
                      (28, 1.0 / 32.0))
# r5 sigma-band stepping (see _march) collapsed the primed OF decay:
# measured on the warm bench scene (tools/march_live_r5.py) 38% live
# after 4 steps, 4.9% after 6, 2.5% after 8, 1.0% after 20, 0 by 59 —
# vs the r4 1-voxel crawl's ~50% at 14. Budgets sized 1.3-3x over the
# measured decay (cost 8.35 full-width step equivalents, was 13.67);
# the 4096-ray cond-skipped tail still backstops unfamiliar scenes.
_CASCADE_PRIMED_OF = ((4, 1.0), (4, 1.0 / 2.0), (16, 1.0 / 12.0),
                      (36, 1.0 / 32.0))
# cold decay stays slow (no priming: 42% at 16, 9.7% at 32, 1.7% at
# 64) — budgets unchanged, still 1.2-2.5x over the r5 measurement.
_CASCADE_COLD_OF = ((16, 1.0), (16, 1.0 / 2.0), (32, 1.0 / 8.0),
                    (48, 1.0 / 24.0))


def camera_zcos(view, dx, dy, dz):
    """Per-ray cosine between the ray direction and the camera's optical
    axis, from the raycast ``view`` matrix (= pose @ invK): the axis is
    normalize(col0 x col1) = R[:, 2] (cross of scaled rotation columns).

    z_cam(t) = t * zcos exactly (the camera sits at the ray origin), so
    the march can evaluate the sensor noise model sigma(z) =
    clamp(noiseFactor * z^2, 2 voxel, 0.05) (bfusion/mapping_impl.hpp:
    169-171) at any marched position. The distributed halo path MUST use
    this same helper on the same view matrix (dist/single parity).
    """
    ax = view[1, 0] * view[2, 1] - view[2, 0] * view[1, 1]
    ay = view[2, 0] * view[0, 1] - view[0, 0] * view[2, 1]
    az = view[0, 0] * view[1, 1] - view[1, 0] * view[0, 1]
    inv = jax.lax.rsqrt(ax * ax + ay * ay + az * az)
    return dx * (ax * inv) + dy * (ay * inv) + dz * (az * inv)


def _march(geom, state, field, origin, dx, dy, dz, tnear, tfar, mu,
           step, largestep, max_steps, nav=None, strips=None,
           prime_t=None, pool_bucket=None, zcos=None):
    """Lockstep field march, TSDF sphere tracing or occupancy stepping.

    TSDF behavior of kfusion/rendering_impl.hpp:34-74 (marching on
    voxel samples; the reference's in-band interp switch is deferred to
    the trilinear Newton refinement in :func:`raycast` — same sub-voxel
    result, an order of magnitude fewer gather rows), PLUS a bounded-
    budget escalation the unbounded reference loop doesn't need: a ray
    whose step stays clamped at the 1-voxel floor (grazing-incidence
    crawl along a near-surface path, f ~ 0 for a meter —
    rendering_impl.hpp:60 marches these unbounded) raises its step
    floor by one voxel every 8 consecutive floor-steps, up to 4 voxels
    (<= the mu band half-width 2mu = 21 voxels at the bench config, so
    a true crossing still lands >= 1 probe per sign regime; the wider
    bracket is resolved by the Newton refinement, and at grazing
    incidence the along-ray bracket error projects onto the normal by
    sin(incidence) ~ 0). This is the r4 EVAL "4-frame overflow burst"
    fix: crawling rays finish inside the cascade instead of spilling.

    OFusion behavior of bfusion/rendering_impl.hpp:35-68 (constant step
    in known space), with multi-voxel band stepping when ``zcos`` is
    given (the r4 VERDICT redesign): inside allocated blocks the step is
    0.5 * sigma(z) = 0.5 * clamp(noiseFactor * z^2, 2 voxel, 0.05)
    (the sensor model's own transition scale, mapping_impl.hpp:169-171
    — the log-odds field cannot vary faster than sigma), clamped to
    [1 voxel, min(2.4 voxel, 2.7 * noiseFactor_band)] so at least one
    probe lands in the allocated positive shell behind the surface
    (+3 mu along-ray, bfusion/alloc_impl.hpp band; 2.56 voxels at the
    bench config). Documented deviation: the reference 1-voxel-steps
    all known space; the bracket refinement restores sub-voxel hits.

    ``prime_t`` (optional, [n]): per-ray surface-distance prediction
    from the CURRENT depth frame. When the raycast pose equals the
    frame's pose (the SLAM loop's case, DenseSLAMSystem.cpp:191-204
    raycasts right after integrating the same frame), the fused surface
    along a pixel's ray sits at its depth sample, so marching can start
    one truncation band before it instead of at the near plane.
    Intentional deviation (documented): a stale closer surface that the
    current depth sees through would be skipped; such rays yield the
    re-observed surface instead of the stale one.
    """
    n = tnear.shape[0]
    unk = _sentinel(field)
    is_tsdf = field.name == "tsdf"
    if nav is None:
        nav = build_nav(geom, state, field, bucket=pool_bucket)
    if strips is None:
        strips = build_strips(geom, state, field, bucket=pool_bucket)
    # the march and the trilinear refinement share ONE nav table (nav4);
    # XLA fuses the plain nav grid into its construction
    nav = build_nav4(nav, geom.blocks_per_side)
    bstep = BLOCK_SIDE * geom.voxel_size
    fill = 1.0 if is_tsdf else 0.0

    if prime_t is not None:
        # two-phase primed start resolved by ONE probe: try a TIGHT
        # backoff first (fused surface sits within pose-error + fusion
        # lag of the depth sample); rays whose tight start is not in
        # known positive space fall back to a full-truncation-band
        # backoff and march from there WITHOUT re-probing — their
        # start-state check is subsumed by the first cascade step (a
        # surface inside the fallback gap is by definition one the
        # current depth sees through, i.e. exactly the documented
        # priming deviation above; the re-probe cost a full-image
        # gather pair per frame).
        big = (2.0 if is_tsdf else 6.0) * mu + 2.0 * geom.voxel_size
        small = 0.5 * mu + 2.0 * geom.voxel_size
        t_tight = jnp.where(prime_t > 0,
                            jnp.maximum(tnear, prime_t - small), tnear)
        ft, kt, _, _ = _probe(geom, nav, strips, unk,
                              origin[0] + dx * t_tight,
                              origin[1] + dy * t_tight,
                              origin[2] + dz * t_tight)
        ok_tight = kt & ((ft > 0) if is_tsdf else (ft <= SURF_BOUNDARY))
        tnear = jnp.where(ok_tight, t_tight,
                          jnp.where(prime_t > 0,
                                    jnp.maximum(tnear, prime_t - big),
                                    tnear))
        v0 = jnp.where(ok_tight, ft, fill)
        go = (tnear < tfar) & ((v0 > 0) if is_tsdf
                               else (v0 <= SURF_BOUNDARY))
    else:
        f0, known0, _, _ = _probe(geom, nav, strips, unk,
                                  origin[0] + dx * tnear,
                                  origin[1] + dy * tnear,
                                  origin[2] + dz * tnear)
        v0 = jnp.where(known0, f0, fill)
        go = (tnear < tfar) & ((v0 > 0) if is_tsdf
                               else (v0 <= SURF_BOUNDARY))
    status0 = jnp.where(go, 0, 2).astype(jnp.int32)

    # static metric cap of the OFusion in-band step: never exceed 2.4
    # voxels (a probe must land in every >= 2.56-voxel shell) nor 90%
    # of the +3*noiseFactor-band allocated behind the surface (coarse
    # maps where 3*mu < a voxel keep the exact 1-voxel reference step)
    # jnp (not python min/max): mu is traced in some entry points
    # (pipeline's standalone raycast jit)
    of_cap = jnp.maximum(step, jnp.minimum(2.4 * step, 2.7 * mu))

    def make_body(dxx, dyy, dzz, tff, czz):
        def one(c):
            t, ss, f_t, f_tt, status, crawl = c
            mx, known, dist, in_block = _probe(
                geom, nav, strips, unk,
                origin[0] + dxx * t, origin[1] + dyy * t,
                origin[2] + dzz * t)
            active = status == 0
            crossed = (mx < 0) if is_tsdf else (mx > SURF_BOUNDARY)
            hit = active & known & crossed
            if is_tsdf:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & known & ~hit, mx, f_t)
                # crawl escalation, engaging only after 16 CONSECUTIVE
                # floor-clamped steps (a perpendicular final approach
                # has <= ~3; the r4 overflow-burst rays crawl 100+), so
                # ordinary hits keep the exact reference march: then
                # +1 voxel of floor per further 8 crawl steps, capped
                # at 4 voxels AND at 0.4 mu (coarse maps where mu is
                # only a few voxels would otherwise step over the
                # whole +-mu band)
                esc = jnp.maximum(crawl - 16.0, 0.0)
                floor = jnp.minimum(
                    step * (1.0 + jnp.minimum(esc * 0.125, 3.0)),
                    jnp.maximum(jnp.float32(step), 0.4 * mu))
                known_step = jnp.maximum(f_tt * mu, floor)
                fine = known
            else:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & ~hit, f_tt, f_t)
                if czz is None:
                    known_step = step
                else:
                    z = t * czz
                    sigma = jnp.clip(mu * z * z, 2.0 * step, 0.05)
                    known_step = jnp.clip(0.5 * sigma, step, of_cap)
                # coarse-known free space (known & ~in_block) is
                # value-constant per traversed cell, so it is jumped at
                # block granularity instead of 1-voxel-stepped — the
                # TPU form of the reference's constant-step march
                # through Octree::get coarse values
                # (bfusion/rendering_impl.hpp:44-58).
                fine = in_block
            jump = jnp.maximum(largestep,
                               jnp.maximum(dist - 1, 0.0) * bstep
                               + 0.5 * largestep)
            new_ss = jnp.where(fine, known_step, jump)
            adv = active & ~hit
            if is_tsdf:
                # count consecutive advancing steps where the floor is
                # the binding constraint (the grazing-crawl regime) —
                # NOT `new_ss < const`, which would reset the counter as
                # soon as the escalated floor takes effect
                crawling = adv & fine & (f_tt * mu <= floor)
                crawl = jnp.where(crawling, crawl + 1.0,
                                  jnp.where(adv, 0.0, crawl))
            ss = jnp.where(adv, new_ss, ss)
            t = jnp.where(adv, t + ss, t)
            status = jnp.where(hit, 1, status)
            status = jnp.where(adv & (t >= tff), 2, status)
            return t, ss, f_t, f_tt, status, crawl

        return one

    def stage(carry, dxx, dyy, dzz, tff, czz, steps):
        alive = lambda c: jnp.any(c[4] == 0)
        return bounded_steps(make_body(dxx, dyy, dzz, tff, czz), carry,
                             steps, alive)

    t = tnear + 0.0
    ss = jnp.full((n,), largestep if is_tsdf else step)
    f_t = jnp.full((n,), jnp.inf) if is_tsdf else jnp.zeros((n,))
    f_tt = jnp.zeros((n,))
    status = status0
    crawl = jnp.zeros((n,))

    if is_tsdf:
        cascade = (_CASCADE_PRIMED_TSDF if prime_t is not None
                   else _CASCADE_COLD_TSDF)
    else:
        cascade = (_CASCADE_PRIMED_OF if prime_t is not None
                   else _CASCADE_COLD_OF)
    first_steps, _ = cascade[0]
    t, ss, f_t, f_tt, status, crawl = stage(
        (t, ss, f_t, f_tt, status, crawl), dx, dy, dz, tfar, zcos,
        min(first_steps, max_steps))
    done_budget = first_steps

    # ---- packed substate rows --------------------------------------
    # Substages compact the live rays; gathering the per-ray
    # state/direction arrays separately costs ~1 single-f32 row each per
    # compacted ray (~60 ns total) plus 5+ scatters back — measured r4
    # (tools/march_scaling_r4.py) this compaction overhead DWARFED the
    # actual probe rows (stage1: 5.7 ms for 127k probes). Packing
    # (t, ss, f_t, f_tt, status, crawl | dx, dy, dz, tfar, zcos) into
    # one 16-wide f32 row makes compaction ONE row gather + ONE row
    # scatter per ray (~5 ns each, CLAUDE.md law 1/2). Layout: mutable
    # state in lanes 0-5, per-ray constants in lanes 6-10.
    zc = jnp.ones((n,)) if zcos is None else zcos

    def pack_state(t, ss, f_t, f_tt, status, crawl):
        return jnp.stack(
            [t, ss, f_t, f_tt, status.astype(jnp.float32), crawl,
             dx, dy, dz, tfar, zc] + [jnp.zeros((n,))] * 5, axis=-1)

    packed = pack_state(t, ss, f_t, f_tt, status, crawl)

    def substage(packed, frac, steps):
        budget = min(n, max(1024, int(n * frac)))
        wl = _compact(n, budget, packed[:, 4] == 0)
        wlc = jnp.maximum(wl, 0)
        rows = packed[wlc]                               # [budget, 16]
        sub_status = jnp.where(wl >= 0, rows[:, 4], 2.0).astype(jnp.int32)
        sub = (rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], sub_status,
               rows[:, 5])
        s_t, s_ss, s_ft, s_ftt, s_status, s_crawl = stage(
            sub, rows[:, 6], rows[:, 7], rows[:, 8], rows[:, 9],
            None if zcos is None else rows[:, 10], steps)
        new_rows = jnp.concatenate(
            [jnp.stack([s_t, s_ss, s_ft, s_ftt,
                        s_status.astype(jnp.float32), s_crawl], axis=-1),
             rows[:, 6:]], axis=-1)
        return packed.at[jnp.where(wl >= 0, wl, n)].set(new_rows,
                                                        mode="drop")

    for steps, frac in cascade[1:]:
        if done_budget >= max_steps:
            break
        packed = substage(packed, frac, min(steps, max_steps - done_budget))
        done_budget += steps

    # catch-all straggler tail (VERDICT r3 weak #4): rays still live
    # after the tuned cascade — an unfamiliar scene exceeding the
    # measured decay — compact into a small rolled-loop stage bounded
    # by max_steps instead of silently missing. The whole tail sits
    # behind ONE scalar lax.cond: on well-budgeted frames (the normal
    # case, overflow == 0) it costs a single predicate; the rolled-loop
    # gather penalty (~3.4x, CLAUDE.md law 3) only applies to the rare
    # straggler batch itself.
    tail_steps = max(0, max_steps - done_budget)

    def make_tail(budget, steps):
        def tail(packed):
            wl = _compact(n, budget, packed[:, 4] == 0)
            wlc = jnp.maximum(wl, 0)
            rows = packed[wlc]
            sub_status = jnp.where(wl >= 0, rows[:, 4],
                                   2.0).astype(jnp.int32)
            sub = (rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3],
                   sub_status, rows[:, 5])
            body = make_body(rows[:, 6], rows[:, 7], rows[:, 8],
                             rows[:, 9],
                             None if zcos is None else rows[:, 10])
            # single-body bounded while_loop: ONE probe body to compile
            # (an unrolled or chunk-unrolled tail ballooned XLA compile
            # time); rolled-loop gathers cost ~3.4x (CLAUDE.md law 3)
            # but the loop early-exits when every lane resolves
            out = jax.lax.while_loop(
                lambda c: (c[0] < steps) & jnp.any(c[1][4] == 0),
                lambda c: (c[0] + 1, body(c[1])),
                (jnp.int32(0), sub))[1]
            new_rows = jnp.concatenate(
                [jnp.stack([out[0], out[1], out[2], out[3],
                            out[4].astype(jnp.float32), out[5]], axis=-1),
                 rows[:, 6:]], axis=-1)
            return packed.at[jnp.where(wl >= 0, wl, n)].set(new_rows,
                                                            mode="drop")
        return tail

    if tail_steps > 0:
        # TWO-TIER straggler tail (r5). Tier A is sized for the grazing-
        # skim BURST: frames whose zero-depth pixels march COLD inside a
        # primed frame can put 8-28k rays into a grazing crawl along a
        # slab (the r4 250-frame eval's f75-78 burst, 49.9k misses) —
        # far beyond any narrow stage. It runs only when the live count
        # is actually burst-sized (cond on count > 4096): a wide rolled
        # loop costs ~0.2 ms per iteration, and the ~100-iteration
        # crawl would cost ~25 ms if it ran on the few-hundred-straggler
        # frames too (measured: a single always-on 32k tail was the
        # missing ~25 ms of the fused OFusion frame). Tier B is the r4
        # narrow tail for the ordinary straggler population; it runs
        # whenever anyone is live. Budget overflow is still counted.
        live0 = jnp.sum((packed[:, 4] == 0).astype(jnp.int32))
        packed = jax.lax.cond(
            live0 > 4096, make_tail(min(n, 32768), min(tail_steps, 96)),
            lambda p: p, packed)
        packed = jax.lax.cond(
            jnp.any(packed[:, 4] == 0), make_tail(min(n, 4096), tail_steps),
            lambda p: p, packed)

    t, ss, f_t, f_tt = (packed[:, 0], packed[:, 1], packed[:, 2],
                        packed[:, 3])
    status = packed[:, 4].astype(jnp.int32)

    # rays still marching after cascade + tail are beyond-budget
    # overflow: they miss for the frame, and are COUNTED so a scene
    # exceeding even the tail budget is observable (ADVICE r2).
    overflow = jnp.sum((status == 0).astype(jnp.int32))

    hit = status == 1
    # linear zero-crossing estimate from the voxel-sample bracket
    # (kfusion/rendering_impl.hpp:66-70 / bfusion 58-64 semantics)
    if is_tsdf:
        f_hi = jnp.where(jnp.isinf(f_t), 1.0, f_t)
        f_lo = f_tt
    else:
        f_hi = f_tt
        f_lo = f_t
    denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
    if is_tsdf:
        t1 = t + ss * f_lo / denom
    else:
        t1 = t - ss * (f_hi - SURF_BOUNDARY) / denom
    return (jnp.where(hit, t1, 0.0), jnp.where(hit, t, 0.0),
            jnp.where(hit, ss, 0.0), hit, overflow, nav, strips)


def prime_from_depth(depth, k):
    """Per-pixel ray-parameter prediction of the surface from a depth
    frame: t = depth * |invK (x, y, 1)| (the pixel-ray length at unit
    z). Zero where depth is missing. Feed to :func:`raycast` when the
    raycast pose equals the depth frame's pose.

    The result sits behind an optimization_barrier: when this is traced
    into the SAME program as the raycast (the fused frame step), XLA
    fuses the producer into the priming/cascade consumers and the whole
    raycast schedule degrades ~2x (r5 bisection: the identical raycast
    measured 17.4 ms with prime as a program input or barrier'd, 36.3 ms
    with it fused in — tools/slice_c_bisect.py). The barrier is an
    identity, so single/dist parity is unaffected.
    """
    h, w = depth.shape
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    ux = (px - cx) / fx
    uy = (py - cy) / fy
    t = depth * jnp.sqrt(ux * ux + uy * uy + 1.0)
    return jax.lax.optimization_barrier(
        jnp.where(depth > 0, t, 0.0).reshape(-1))


@functools.partial(jax.jit, static_argnames=("geom", "field", "frame_size",
                                             "max_steps", "with_stats",
                                             "pool_bucket"))
def raycast(geom, state, field, view, mu, frame_size, max_steps=None,
            near=NEAR_PLANE, far=FAR_PLANE, prime_t=None,
            with_stats=False, pool_bucket=None):
    """Produce vertex/normal/valid maps for tracking and rendering
    (ref raycastKernel, rendering.cpp:50-90).

    view = raycast_pose @ inverse_camera_matrix(k).
    Returns (vertex [H,W,3] world meters, normal [H,W,3], valid [H,W]),
    plus a stats dict (``ray_overflow``: rays still live past the march
    budget — they miss this frame) when ``with_stats``.

    ``max_steps`` is the true per-ray step bound: rays still live after
    the tuned compaction cascade (_CASCADE_*, with empty-space jumps of
    up to MAX_JUMP blocks per step) continue in the two-tier cond-gated
    straggler tail (32768-wide burst tier when >4096 rays are live,
    then the 4096-wide tier up to ``max_steps``). Only rays exceeding
    max_steps or both tail budgets miss the frame, counted in
    ``ray_overflow``.
    """
    w, h = frame_size
    dxi, dyi, dzi = ray_directions_c(view, w, h)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    zcos = (camera_zcos(view, dx, dy, dz)
            if field.name == "ofusion" else None)

    (vx, vy, vz, nx, ny, nz, hit, ok, overflow) = raycast_rays(
        geom, field, origin, dx, dy, dz, mu, state=state,
        max_steps=max_steps, near=near, far=far, prime_t=prime_t,
        pool_bucket=pool_bucket, zcos=zcos)

    vertex = jnp.stack([jnp.where(hit, vx, 0.0),
                        jnp.where(hit, vy, 0.0),
                        jnp.where(hit, vz, 0.0)], axis=-1).reshape(h, w, 3)
    normal = jnp.stack([nx, ny, nz], axis=-1).reshape(h, w, 3)
    if with_stats:
        return vertex, normal, ok.reshape(h, w), {"ray_overflow": overflow}
    return vertex, normal, ok.reshape(h, w)


def raycast_rays(geom, field, origin, dx, dy, dz, mu, state=None,
                 nav=None, strips=None, max_steps=None, near=NEAR_PLANE,
                 far=FAR_PLANE, prime_t=None, pool_bucket=None,
                 zcos=None):
    """Ray-level raycast core over flat direction arrays: march + Newton
    refinement + gradient normals. Either ``state`` or prebuilt
    (``nav``, ``strips``) must be given — the sharded pipeline passes the
    halo-exchanged tables here (parallel/dist_step.py) while the
    single-chip path builds them from the local map.

    ``zcos`` (optional, [n]): per-ray camera-axis cosine from
    :func:`camera_zcos`; enables the OFusion multi-voxel band stepping
    (see :func:`_march`). Omitted (e.g. free-ray tests), the occupancy
    march keeps the reference's exact 1-voxel known-space step.

    Returns (vx, vy, vz, nx, ny, nz, hit, ok, overflow) flat arrays.
    """
    if max_steps is None:
        max_steps = 2 * geom.size
    step = geom.voxel_size
    largestep = step * BLOCK_SIDE
    tnear, tfar = ray_box_range_c(origin, dx, dy, dz, geom.dim, near, far)

    t1, t_cross, ss, hit, overflow, nav4, strips = _march(
        geom, state, field, origin, dx, dy, dz, tnear, tfar, mu, step,
        largestep, max_steps, nav=nav, strips=strips, prime_t=prime_t,
        pool_bucket=pool_bucket, zcos=zcos)

    # Newton refinement + normal from ONE trilinear fetch set: value and
    # cell gradient at the bracket estimate; step along the ray to the
    # interpolant's zero crossing, clamped inside the OBSERVED bracket
    # [t_cross - ss, t_cross] (the reference's solve interpolates within
    # the sampled bracket, kfusion/rendering_impl.hpp:66-70).
    iv = geom.inv_voxel_size
    unk = _sentinel(field)
    fill = 1.0 if field.name == "tsdf" else 0.0
    v1, gx, gy, gz = _interp_grad(geom, nav4, strips, unk, fill,
                                  (origin[0] + dx * t1) * iv,
                                  (origin[1] + dy * t1) * iv,
                                  (origin[2] + dz * t1) * iv)
    deriv = (gx * dx + gy * dy + gz * dz) * iv          # d(field)/dt
    safe = jnp.abs(deriv) > 1e-6
    # both fields cross the surface at 0 (TSDF zero / SURF_BOUNDARY)
    t_hit = t1 - jnp.where(safe, v1 / jnp.where(safe, deriv, 1.0), 0.0)
    t_hit = jnp.clip(t_hit, t_cross - ss, t_cross)
    t_hit = jnp.where(hit, t_hit, 0.0)

    vx = origin[0] + dx * t_hit
    vy = origin[1] + dy * t_hit
    vz = origin[2] + dz * t_hit
    gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.where(gn == 0, 1.0, gn)
    if field.invert_normals:
        inv = -inv
    ok = hit & (gn > 0)
    nx = jnp.where(ok, gx * inv, INVALID)
    ny = jnp.where(ok, gy * inv, 0.0)
    nz = jnp.where(ok, gz * inv, 0.0)
    return vx, vy, vz, nx, ny, nz, hit, ok, overflow
