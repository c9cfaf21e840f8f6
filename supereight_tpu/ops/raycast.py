"""Sparse-map raycasting: vertex/normal map extraction.

Behavioral reference: raycastKernel (se_denseslam/src/rendering.cpp:50-90)
driving the field-specific marchers kfusion/rendering_impl.hpp:34-74
(TSDF sphere tracing with unknown-space skipping) and
bfusion/rendering_impl.hpp:35-68 (occupancy constant-step march).

TPU design: every pixel marches in lockstep inside one
``lax.while_loop`` over whole-image state tensors; finished rays mask
out. The reference's hierarchical ray iterator
(se_core/include/se/ray_iterator.hpp) exists purely to skip free space
to the first allocated block; here that skipping is folded INTO the
march via a per-block jump map: a single i32 grid holding *slot id* for
allocated blocks and *-(1 + chebyshev block distance to the nearest
allocated block)* for empty ones, so one gather per step yields both
the field sample and the safe empty-space jump. Ray/map-AABB clipping
replicates the commented KinectFusion preamble
(kfusion/rendering_impl.hpp:76-104) that the ray iterator subsumes.

Shape discipline (the actual TPU perf story): all per-ray state is a
flat [N] f32/i32 tensor — never [..., 3]-stacked, never a small minor
dim — and every fetch is one flat 1-D gather. See se3.transform_c.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu.constants import (BLOCK_SIDE, FAR_PLANE, INVALID,
                                      NEAR_PLANE, SURF_BOUNDARY)
from supereight_tpu.core import interp as interp_mod
from supereight_tpu.core import se3


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


def block_jump_map(geom, state, max_jump: int = 6):
    """Flat i32[B^3]: pool slot if allocated, else -(1 + chebyshev block
    distance to the nearest allocated block, capped at ``max_jump``).

    The distance comes from ``max_jump - 1`` dense 3^3 min-dilations of
    the allocation mask — a few VPU passes over the [B^3] grid,
    negligible next to the march. This replaces the reference ray
    iterator's octree descent (ray_iterator.hpp:116-226): instead of
    walking a tree to skip empty space, every ray reads how far it may
    safely jump from the same word that addresses the field sample.
    """
    occupied = state.slot >= 0
    d = jnp.where(occupied, 0, max_jump).astype(jnp.float32)
    for _ in range(max_jump - 1):
        neigh = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        d = jnp.minimum(d, neigh + 1.0)
    jump = jnp.where(occupied, state.slot, -(1 + d.astype(jnp.int32)))
    return jump.reshape(-1)


def _march_field(state):
    """Flat marching field: voxel value with +inf marking unknown space.

    One flat array so each marching step costs ONE gather; the unknown
    test (reference: data.y == 0 -> large step) and the value test ride
    the same fetch (get_fine's init {x:1, y:0} classification)."""
    return jnp.where(state.data_y == 0, jnp.inf, state.data_x).reshape(-1)


def _sample(geom, jump_flat, march_flat, px, py, pz):
    """One marching probe at metric position components.

    Returns (value, known, jump_dist_blocks): a single pair of flat
    gathers — block word (slot | -(1+dist)) then voxel value.
    """
    size, b = geom.size, geom.blocks_per_side
    vx = (px * geom.inv_voxel_size).astype(jnp.int32)
    vy = (py * geom.inv_voxel_size).astype(jnp.int32)
    vz = (pz * geom.inv_voxel_size).astype(jnp.int32)
    inb = ((vx >= 0) & (vx < size) & (vy >= 0) & (vy < size)
           & (vz >= 0) & (vz < size))
    vx = jnp.clip(vx, 0, size - 1)
    vy = jnp.clip(vy, 0, size - 1)
    vz = jnp.clip(vz, 0, size - 1)
    mt = jump_flat[((vx >> 3) * b + (vy >> 3)) * b + (vz >> 3)]
    lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
    mx = march_flat[jnp.maximum(mt, 0) * 512 + lin]
    known = (mt >= 0) & inb & ~jnp.isinf(mx)
    dist = jnp.where(mt < 0, (-1 - mt).astype(jnp.float32), 0.0)
    return mx, known, dist


def _interp_at(geom, state, field, ox, oy, oz, dx, dy, dz, t):
    v = geom.inv_voxel_size
    return interp_mod.interp_c(geom, state, field,
                               (ox + dx * t) * v, (oy + dy * t) * v,
                               (oz + dz * t) * v, channel=0)


def _compact_stragglers(shape_n, budget, unfinished):
    """Fixed-budget worklist of unfinished ray indices (two-pass
    divergence handling: lockstep marching pays the slowest ray per
    iteration, so the few long rays finish in a small dense batch)."""
    order = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
    dest = jnp.where(unfinished & (order < budget), order, budget)
    wl = jnp.full((budget,), -1, jnp.int32).at[dest].set(
        jnp.arange(shape_n, dtype=jnp.int32), mode="drop")
    return wl


def _march_tsdf(geom, state, field, origin, dx, dy, dz, tnear, tfar, mu,
                step, largestep, max_steps, jump_flat=None):
    """TSDF sphere tracing (behavior of kfusion/rendering_impl.hpp:34-74).

    Marching decisions use the voxel-sampled field (one gather/step); the
    reference switches to trilinear values inside [-0.5, 0.1] while
    marching, which we defer to the final refinement: once the crossing
    is bracketed, both bracket ends are re-evaluated with trilinear
    interpolation and the zero crossing solved linearly — same sub-voxel
    accuracy, an order of magnitude less gather traffic.

    Unknown space (unallocated blocks or weight-0 voxels) takes
    jump-map-sized steps (the reference's ray-iterator skip + its
    largestep rule); known space sphere-traces on mu-scaled values.
    """
    n = tnear.shape[0]
    march_flat = _march_field(state)
    if jump_flat is None:
        jump_flat = block_jump_map(geom, state)
    bstep = BLOCK_SIDE * geom.voxel_size

    f_t0 = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                      dx, dy, dz, tnear)
    # status: 0 = marching, 1 = hit, 2 = done/no-hit
    go = (tnear < tfar) & (f_t0 > 0)
    status0 = jnp.where(go, 0, 2).astype(jnp.int32)

    def body(dxx, dyy, dzz, tff):
        def fn(carry):
            t, ss, f_t, f_tt, status, it = carry
            mx, known, dist = _sample(
                geom, jump_flat, march_flat,
                origin[0] + dxx * t, origin[1] + dyy * t,
                origin[2] + dzz * t)
            active = status == 0

            hit = active & known & (mx < 0)
            new_f_tt = jnp.where(active & known, mx, f_tt)
            new_f_t = jnp.where(active & known & ~hit, mx, f_t)
            # on a hit the reference breaks *before* refreshing stepsize —
            # the refinement uses the step that reached the crossing
            jump = jnp.maximum(largestep,
                               jnp.maximum(dist - 1, 0.0) * bstep
                               + 0.5 * largestep)
            new_ss = jnp.where(known, jnp.maximum(new_f_tt * mu, step), jump)
            new_ss = jnp.where(active & ~hit, new_ss, ss)
            new_t = jnp.where(active & ~hit, t + new_ss, t)
            new_status = jnp.where(hit, 1, status)
            new_status = jnp.where(active & ~hit & (new_t >= tff), 2,
                                   new_status)
            return (new_t, new_ss, new_f_t, new_f_tt, new_status, it + 1)
        return fn

    def run(carry, dxx, dyy, dzz, tff, steps):
        def cond(c):
            return jnp.any(c[4] == 0) & (c[5] < steps)
        return jax.lax.while_loop(cond, body(dxx, dyy, dzz, tff), carry)

    pass1_steps = min(96, max_steps)
    carry = (tnear + 0.0,                          # t
             jnp.full((n,), largestep),            # stepsize
             jnp.full((n,), jnp.inf),              # f_t (last known sample)
             jnp.zeros((n,)), status0, jnp.int32(0))
    t, ss, f_t, f_tt, status, _ = run(carry, dx, dy, dz, tfar, pass1_steps)

    if max_steps > pass1_steps:
        budget = max(1024, n // 16)
        wl = _compact_stragglers(n, budget, (status == 0))
        wlc = jnp.maximum(wl, 0)

        sub_status = jnp.where(wl >= 0, 0, 2).astype(jnp.int32)
        sub = (t[wlc], ss[wlc], f_t[wlc], f_tt[wlc], sub_status,
               jnp.int32(0))
        s_t, s_ss, s_ft, s_ftt, s_status, _ = run(
            sub, dx[wlc], dy[wlc], dz[wlc], tfar[wlc],
            max_steps - pass1_steps)

        def put(full, vals):
            return full.at[jnp.where(wl >= 0, wl, n)].set(vals, mode="drop")

        t = put(t, s_t)
        ss = put(ss, s_ss)
        f_t = put(f_t, s_ft)
        f_tt = put(f_tt, s_ftt)
        status = put(status, s_status)
        # overflowed stragglers (beyond the budget) stay status 0 -> miss

    hit = status == 1
    # trilinear refinement at the bracket ends (the accuracy the
    # reference gets from its in-window interp switch)
    fa = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                    dx, dy, dz, t - ss)
    fb = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                    dx, dy, dz, t)
    use_interp = hit & (fb < 0) & (fa >= 0)
    f_hi = jnp.where(use_interp, fa, jnp.where(jnp.isinf(f_t), 1.0, f_t))
    f_lo = jnp.where(use_interp, fb, f_tt)
    denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
    t_hit = t + ss * f_lo / denom
    return jnp.where(hit, t_hit, 0.0), hit


def _march_ofusion(geom, state, field, origin, dx, dy, dz, tnear, tfar, mu,
                   step, largestep, max_steps, jump_flat=None):
    """Occupancy marching (behavior of bfusion/rendering_impl.hpp:35-68).

    Constant voxel step inside allocated blocks; unallocated blocks hold
    no observed voxels, so they are crossed at jump-map-sized steps (the
    reference samples them anyway and learns nothing — skipping them
    cannot change which observed samples are seen). Crossing detection on
    voxel samples, trilinear refinement at the bracket."""
    n = tnear.shape[0]
    march_flat = _march_field(state)
    if jump_flat is None:
        jump_flat = block_jump_map(geom, state)
    bstep = BLOCK_SIDE * geom.voxel_size

    f_00 = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                      dx, dy, dz, tnear)
    go = (tnear < tfar) & (f_00 <= SURF_BOUNDARY)
    status0 = jnp.where(go, 0, 2).astype(jnp.int32)

    state0 = (tnear + 0.0, jnp.full((n,), step),
              jnp.zeros((n,)), jnp.zeros((n,)), status0, jnp.int32(0))

    def cond(carry):
        return jnp.any(carry[4] == 0) & (carry[5] < max_steps)

    def body(carry):
        t, ss, f_t, f_tt, status, it = carry
        mx, known, dist = _sample(
            geom, jump_flat, march_flat,
            origin[0] + dx * t, origin[1] + dy * t, origin[2] + dz * t)
        active = status == 0
        hit = active & known & (mx > SURF_BOUNDARY)
        new_f_tt = jnp.where(active & known, mx, f_tt)
        new_f_t = jnp.where(active & ~hit, new_f_tt, f_t)
        jump = jnp.maximum(largestep,
                           jnp.maximum(dist - 1, 0.0) * bstep
                           + 0.5 * largestep)
        new_ss = jnp.where(known, step, jump)
        new_ss = jnp.where(active & ~hit, new_ss, ss)
        new_t = jnp.where(active & ~hit, t + new_ss, t)
        new_status = jnp.where(hit, 1, status)
        new_status = jnp.where(active & ~hit & (new_t >= tfar), 2,
                               new_status)
        return (new_t, new_ss, new_f_t, new_f_tt, new_status, it + 1)

    t, ss, f_t, f_tt, status, _ = jax.lax.while_loop(cond, body, state0)
    hit = status == 1
    fa = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                    dx, dy, dz, t - ss)
    fb = _interp_at(geom, state, field, origin[0], origin[1], origin[2],
                    dx, dy, dz, t)
    use_interp = hit & (fb > SURF_BOUNDARY) & (fa <= SURF_BOUNDARY)
    f_hi = jnp.where(use_interp, fb, f_tt)
    f_lo = jnp.where(use_interp, fa, f_t)
    denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
    t_hit = t - ss * (f_hi - SURF_BOUNDARY) / denom
    return jnp.where(hit, t_hit, 0.0), hit


@functools.partial(jax.jit, static_argnames=("geom", "field", "frame_size",
                                             "max_steps"))
def raycast(geom, state, field, view, mu, frame_size, max_steps=None,
            near=NEAR_PLANE, far=FAR_PLANE):
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

    jump_flat = block_jump_map(geom, state)
    marcher = _march_tsdf if field.name == "tsdf" else _march_ofusion
    t_hit, hit = marcher(geom, state, field, origin, dx, dy, dz, tnear,
                         tfar, mu, step, largestep, max_steps,
                         jump_flat=jump_flat)

    vx = origin[0] + dx * t_hit
    vy = origin[1] + dy * t_hit
    vz = origin[2] + dz * t_hit
    iv = geom.inv_voxel_size
    gx, gy, gz = interp_mod.grad_c(geom, state, field,
                                   vx * iv, vy * iv, vz * iv, channel=0)
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
