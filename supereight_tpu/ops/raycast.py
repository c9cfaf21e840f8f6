"""Sparse-map raycasting: vertex/normal map extraction.

Behavioral reference: raycastKernel (se_denseslam/src/rendering.cpp:50-90)
driving the field-specific marchers kfusion/rendering_impl.hpp:34-74
(TSDF sphere tracing with unknown-space skipping) and
bfusion/rendering_impl.hpp:35-68 (occupancy constant-step march).

TPU design (see CLAUDE.md "TPU perf laws": gathers/scatters cost ~7 ns
per ROW regardless of row width, so the design minimizes row count):

* A dense **march mirror** [B^3, 512] f32 is built per raycast with one
  block-row gather (262k rows x 2KB ~ 2 ms): allocated blocks carry
  their voxel values (weight-0 voxels -> UNKNOWN sentinel), unallocated
  cells carry ``SENT + chebyshev-block-distance`` so a single fetch
  yields both the field sample and the safe empty-space jump. This
  replaces both the reference's octree ray iterator
  (ray_iterator.hpp:116-226) and per-sample ``fetch``: every march step
  is ONE flat gather with pure-VPU decoding.
* Rays march in lockstep, fully unrolled on TPU (rolled on CPU —
  utils/loops.bounded_steps), in a compaction cascade: a short
  full-image pass, then unfinished rays compact into geometrically
  smaller batches for longer budgets. Lockstep costs rows-per-step, so
  narrowing the live set is what early exit becomes on a VPU.
* Trilinear refinement + gradients also read the mirror (the sentinel
  decodes to the field's init/empty fill arithmetically), removing all
  slot-lookup gathers from the per-pixel path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu.constants import (BLOCK_SIDE, FAR_PLANE, INVALID,
                                      NEAR_PLANE, SURF_BOUNDARY)
from supereight_tpu.core import interp as interp_mod
from supereight_tpu.core import se3
from supereight_tpu.utils.loops import bounded_steps, chunked_steps

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
    """Unknown-space sentinel base; values >= base/2 decode as unknown.

    TSDF x is clamped to [-1, 1] (volume_traits.hpp:41-51) -> base 2.
    OFusion log-odds are clamped to +-1000 (volume_traits.hpp:74-81)
    -> base 4096.
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


def build_march_mirror(geom, state, field):
    """Dense [B^3 * 512] f32 marching field (see module docstring).

    Encoding: value v with v < SENT/2 -> known voxel sample; otherwise
    v - SENT = chebyshev block distance to the nearest allocated block
    (0 for weight-0 voxels inside allocated blocks).
    """
    sent = _sentinel(field)
    march_pool = jnp.where(state.data_y == 0, sent, state.data_x)
    slot_flat = state.slot.reshape(-1)
    rows = march_pool[jnp.maximum(slot_flat, 0)]         # [B^3, 512] gather
    d = block_distance(geom, state).reshape(-1)
    empty_rows = (sent + d)[:, None]
    mirror = jnp.where((slot_flat >= 0)[:, None], rows, empty_rows)
    return mirror.reshape(-1)


def _mirror_fetch(geom, mirror, vx, vy, vz):
    """Raw mirror fetch at clipped integer voxel coords: one flat gather."""
    b = geom.blocks_per_side
    cell = ((vx >> 3) * b + (vy >> 3)) * b + (vz >> 3)
    lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
    return mirror[cell * 512 + lin]


def _sample(geom, mirror, sent, px, py, pz):
    """One marching probe at metric positions: gather + VPU decode.

    Returns (value, known, jump_dist_blocks)."""
    size = geom.size
    vx = (px * geom.inv_voxel_size).astype(jnp.int32)
    vy = (py * geom.inv_voxel_size).astype(jnp.int32)
    vz = (pz * geom.inv_voxel_size).astype(jnp.int32)
    inb = ((vx >= 0) & (vx < size) & (vy >= 0) & (vy < size)
           & (vz >= 0) & (vz < size))
    vx = jnp.clip(vx, 0, size - 1)
    vy = jnp.clip(vy, 0, size - 1)
    vz = jnp.clip(vz, 0, size - 1)
    s = _mirror_fetch(geom, mirror, vx, vy, vz)
    known = (s < 0.5 * sent) & inb
    dist = jnp.where(known, 0.0, jnp.maximum(s - sent, 0.0))
    dist = jnp.where(inb, dist, MAX_JUMP)
    return s, known, dist


def _interp_mirror(geom, mirror, sent, fill, px, py, pz):
    """Trilinear interpolation from the mirror at continuous VOXEL coords.

    Sentinel values decode to ``fill`` (the field's empty/init x — they
    coincide for both field types: TSDF 1.0, OFusion 0.0). Matches
    Octree::interp semantics (octree.hpp:542-563) with O(1) addressing.
    """
    bx = jnp.floor(px)
    by = jnp.floor(py)
    bz = jnp.floor(pz)
    fx, fy, fz = px - bx, py - by, pz - bz
    size = geom.size
    ix = jnp.maximum(bx.astype(jnp.int32), 0)
    iy = jnp.maximum(by.astype(jnp.int32), 0)
    iz = jnp.maximum(bz.astype(jnp.int32), 0)

    off = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
         [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.int32)
    sh = (8,) + (1,) * ix.ndim
    cx = ix[None] + off[:, 0].reshape(sh)
    cy = iy[None] + off[:, 1].reshape(sh)
    cz = iz[None] + off[:, 2].reshape(sh)
    inb = (cx < size) & (cy < size) & (cz < size)   # lower already >= 0
    s = _mirror_fetch(geom, mirror, jnp.minimum(cx, size - 1),
                      jnp.minimum(cy, size - 1), jnp.minimum(cz, size - 1))
    p = jnp.where((s < 0.5 * sent) & inb, s, fill)
    c00 = p[0] * (1 - fx) + p[1] * fx
    c10 = p[2] * (1 - fx) + p[3] * fx
    c01 = p[4] * (1 - fx) + p[5] * fx
    c11 = p[6] * (1 - fx) + p[7] * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


# grad stencil enumeration shared with core/interp.py
_G_IX = interp_mod._GRAD_IX
_G_IY = interp_mod._GRAD_IY
_G_IZ = interp_mod._GRAD_IZ
_G_ID = interp_mod._GRAD_ID


def _grad_mirror(geom, mirror, sent, fill, px, py, pz):
    """Field gradient from the mirror (Octree::grad, octree.hpp:652-737).

    Unknown/unallocated samples decode to ``fill`` (init x — equals the
    stored value of never-updated voxels for both field types). Returns
    (gx, gy, gz) scaled by 0.5 * voxel_size.
    """
    size = geom.size

    def ladder(b):
        return jnp.stack([jnp.maximum(b - 1, 0),
                          jnp.maximum(b, 0),
                          jnp.minimum(b + 1, size - 1),
                          jnp.minimum(b + 2, size - 1)])

    bx = jnp.floor(px)
    by = jnp.floor(py)
    bz = jnp.floor(pz)
    fx, fy, fz = px - bx, py - by, pz - bz
    lx = ladder(bx.astype(jnp.int32))
    ly = ladder(by.astype(jnp.int32))
    lz = ladder(bz.astype(jnp.int32))

    s = _mirror_fetch(geom, mirror, lx[_G_IX], ly[_G_IY], lz[_G_IZ])
    vals = jnp.where(s < 0.5 * sent, s, fill)

    def p(i, j, kk):
        return vals[_G_ID[(i, j, kk)]]

    def dx(jy, kz):
        return ((p(2, jy, kz) - p(0, jy, kz)) * (1 - fx)
                + (p(3, jy, kz) - p(1, jy, kz)) * fx)

    gx = ((dx(1, 1) * (1 - fy) + dx(2, 1) * fy) * (1 - fz)
          + (dx(1, 2) * (1 - fy) + dx(2, 2) * fy) * fz)

    def dy(ix, kz):
        return ((p(ix, 2, kz) - p(ix, 0, kz)) * (1 - fy)
                + (p(ix, 3, kz) - p(ix, 1, kz)) * fy)

    gy = ((dy(1, 1) * (1 - fx) + dy(2, 1) * fx) * (1 - fz)
          + (dy(1, 2) * (1 - fx) + dy(2, 2) * fx) * fz)

    def dz(ix, jy):
        return ((p(ix, jy, 2) - p(ix, jy, 0)) * (1 - fz)
                + (p(ix, jy, 3) - p(ix, jy, 1)) * fz)

    gz = ((dz(1, 1) * (1 - fx) + dz(2, 1) * fx) * (1 - fy)
          + (dz(1, 2) * (1 - fx) + dz(2, 2) * fx) * fy)

    sc = 0.5 * geom.voxel_size
    return gx * sc, gy * sc, gz * sc


def _compact(n, budget, mask):
    """Fixed-budget worklist of ray indices where mask is set."""
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (order < budget), order, budget)
    wl = jnp.full((budget,), -1, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return wl


# compaction cascade: (steps, live-fraction budget) per stage. Stage 0
# runs on all rays; later stages on geometrically fewer stragglers, so
# total gather rows stay ~2x the first stage while long grazing rays
# still get hundreds of steps (the reference's per-ray loop shape).
# The tail runs as cond-skipped chunks inside a rolled loop (cheap to
# compile, early-exits at chunk granularity).
_CASCADE = ((16, 1.0), (48, 0.25))
_TAIL_CHUNKS, _TAIL_CHUNK, _TAIL_FRAC = 32, 8, 0.0625


def _march(geom, state, field, origin, dx, dy, dz, tnear, tfar, mu,
           step, largestep, max_steps, mirror=None, prime_t=None):
    """Lockstep field march, TSDF sphere tracing or occupancy stepping.

    TSDF behavior of kfusion/rendering_impl.hpp:34-74 (marching on
    voxel samples; the reference's in-band interp switch is deferred to
    the bracket refinement in :func:`raycast` — same sub-voxel result,
    an order of magnitude fewer gather rows). OFusion behavior of
    bfusion/rendering_impl.hpp:35-68 (constant step in known space).

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
    sent = _sentinel(field)
    is_tsdf = field.name == "tsdf"
    if mirror is None:
        mirror = build_march_mirror(geom, state, field)
    bstep = BLOCK_SIDE * geom.voxel_size
    fill = 1.0 if is_tsdf else 0.0

    if prime_t is not None:
        backoff = (2.0 if is_tsdf else 6.0) * mu + 2.0 * geom.voxel_size
        tnear = jnp.where(prime_t > 0,
                          jnp.maximum(tnear, prime_t - backoff), tnear)

    f_t0 = _interp_mirror(geom, mirror, sent, fill,
                          (origin[0] + dx * tnear) * geom.inv_voxel_size,
                          (origin[1] + dy * tnear) * geom.inv_voxel_size,
                          (origin[2] + dz * tnear) * geom.inv_voxel_size)
    go = (tnear < tfar) & ((f_t0 > 0) if is_tsdf
                           else (f_t0 <= SURF_BOUNDARY))
    status0 = jnp.where(go, 0, 2).astype(jnp.int32)

    def stage(carry, dxx, dyy, dzz, tff, steps, chunks=None):
        def one(c):
            t, ss, f_t, f_tt, status = c
            mx, known, dist = _sample(
                geom, mirror, sent,
                origin[0] + dxx * t, origin[1] + dyy * t,
                origin[2] + dzz * t)
            active = status == 0
            crossed = (mx < 0) if is_tsdf else (mx > SURF_BOUNDARY)
            hit = active & known & crossed
            if is_tsdf:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & known & ~hit, mx, f_t)
                known_step = jnp.maximum(f_tt * mu, step)
            else:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & ~hit, f_tt, f_t)
                known_step = step
            jump = jnp.maximum(largestep,
                               jnp.maximum(dist - 1, 0.0) * bstep
                               + 0.5 * largestep)
            new_ss = jnp.where(known, known_step, jump)
            adv = active & ~hit
            ss = jnp.where(adv, new_ss, ss)
            t = jnp.where(adv, t + ss, t)
            status = jnp.where(hit, 1, status)
            status = jnp.where(adv & (t >= tff), 2, status)
            return t, ss, f_t, f_tt, status

        alive = lambda c: jnp.any(c[4] == 0)
        if chunks is None:
            return bounded_steps(one, carry, steps, alive)
        return chunked_steps(one, carry, chunks, steps, alive)

    t = tnear + 0.0
    ss = jnp.full((n,), largestep if is_tsdf else step)
    f_t = jnp.full((n,), jnp.inf) if is_tsdf else jnp.zeros((n,))
    f_tt = jnp.zeros((n,))
    status = status0

    first_steps, _ = _CASCADE[0]
    t, ss, f_t, f_tt, status = stage((t, ss, f_t, f_tt, status),
                                     dx, dy, dz, tfar,
                                     min(first_steps, max_steps))
    done_budget = first_steps

    def substage(t, ss, f_t, f_tt, status, frac, steps, chunks=None):
        budget = max(1024, int(n * frac))
        wl = _compact(n, budget, status == 0)
        wlc = jnp.maximum(wl, 0)
        sub_status = jnp.where(wl >= 0, 0, 2).astype(jnp.int32)
        sub = (t[wlc], ss[wlc], f_t[wlc], f_tt[wlc], sub_status)
        s_t, s_ss, s_ft, s_ftt, s_status = stage(
            sub, dx[wlc], dy[wlc], dz[wlc], tfar[wlc], steps,
            chunks=chunks)

        def put(full, vals):
            return full.at[jnp.where(wl >= 0, wl, n)].set(vals, mode="drop")

        return (put(t, s_t), put(ss, s_ss), put(f_t, s_ft),
                put(f_tt, s_ftt), put(status, s_status))

    for steps, frac in _CASCADE[1:]:
        if done_budget >= max_steps:
            break
        t, ss, f_t, f_tt, status = substage(
            t, ss, f_t, f_tt, status, frac,
            min(steps, max_steps - done_budget))
        done_budget += steps

    if done_budget < max_steps:
        chunks = min(_TAIL_CHUNKS,
                     -(-(max_steps - done_budget) // _TAIL_CHUNK))
        t, ss, f_t, f_tt, status = substage(
            t, ss, f_t, f_tt, status, _TAIL_FRAC, _TAIL_CHUNK,
            chunks=chunks)
    # rays still marching after the cascade (beyond-budget overflow) miss

    hit = status == 1
    iv = geom.inv_voxel_size

    def at(tv):
        return ((origin[0] + dx * tv) * iv, (origin[1] + dy * tv) * iv,
                (origin[2] + dz * tv) * iv)

    fa = _interp_mirror(geom, mirror, sent, fill, *at(t - ss))
    fb = _interp_mirror(geom, mirror, sent, fill, *at(t))
    if is_tsdf:
        use_interp = hit & (fb < 0) & (fa >= 0)
        f_hi = jnp.where(use_interp, fa,
                         jnp.where(jnp.isinf(f_t), 1.0, f_t))
        f_lo = jnp.where(use_interp, fb, f_tt)
        denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
        t_hit = t + ss * f_lo / denom
    else:
        use_interp = hit & (fb > SURF_BOUNDARY) & (fa <= SURF_BOUNDARY)
        f_hi = jnp.where(use_interp, fb, f_tt)
        f_lo = jnp.where(use_interp, fa, f_t)
        denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
        t_hit = t - ss * (f_hi - SURF_BOUNDARY) / denom
    return jnp.where(hit, t_hit, 0.0), hit, mirror


def prime_from_depth(depth, k):
    """Per-pixel ray-parameter prediction of the surface from a depth
    frame: t = depth * |invK (x, y, 1)| (the pixel-ray length at unit
    z). Zero where depth is missing. Feed to :func:`raycast` when the
    raycast pose equals the depth frame's pose.
    """
    h, w = depth.shape
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    ux = (px - cx) / fx
    uy = (py - cy) / fy
    t = depth * jnp.sqrt(ux * ux + uy * uy + 1.0)
    return jnp.where(depth > 0, t, 0.0).reshape(-1)


@functools.partial(jax.jit, static_argnames=("geom", "field", "frame_size",
                                             "max_steps"))
def raycast(geom, state, field, view, mu, frame_size, max_steps=None,
            near=NEAR_PLANE, far=FAR_PLANE, prime_t=None):
    """Produce vertex/normal/valid maps for tracking and rendering
    (ref raycastKernel, rendering.cpp:50-90).

    view = raycast_pose @ inverse_camera_matrix(k).
    Returns (vertex [H,W,3] world meters, normal [H,W,3], valid [H,W]).
    """
    w, h = frame_size
    if max_steps is None:
        max_steps = 2 * geom.size
    step = geom.voxel_size
    largestep = step * BLOCK_SIDE

    dxi, dyi, dzi = ray_directions_c(view, w, h)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = ray_box_range_c(origin, dx, dy, dz, geom.dim, near, far)

    t_hit, hit, mirror = _march(geom, state, field, origin, dx, dy, dz,
                                tnear, tfar, mu, step, largestep,
                                max_steps, prime_t=prime_t)

    vx = origin[0] + dx * t_hit
    vy = origin[1] + dy * t_hit
    vz = origin[2] + dz * t_hit
    iv = geom.inv_voxel_size
    sent = _sentinel(field)
    fill = 1.0 if field.name == "tsdf" else 0.0
    gx, gy, gz = _grad_mirror(geom, mirror, sent, fill,
                              vx * iv, vy * iv, vz * iv)
    gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.where(gn == 0, 1.0, gn)
    if field.invert_normals:
        inv = -inv
    ok = hit & (gn > 0)
    nx = jnp.where(ok, gx * inv, INVALID)
    ny = jnp.where(ok, gy * inv, 0.0)
    nz = jnp.where(ok, gz * inv, 0.0)
    vertex = jnp.stack([jnp.where(hit, vx, 0.0),
                        jnp.where(hit, vy, 0.0),
                        jnp.where(hit, vz, 0.0)], axis=-1).reshape(h, w, 3)
    normal = jnp.stack([nx, ny, nz], axis=-1).reshape(h, w, 3)
    return vertex, normal, ok.reshape(h, w)
