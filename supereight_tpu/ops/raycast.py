"""Sparse-map raycasting: vertex/normal map extraction.

Behavioral reference: raycastKernel (se_denseslam/src/rendering.cpp:50-90)
driving the field-specific marchers kfusion/rendering_impl.hpp:34-74
(TSDF sphere tracing with unknown-space skipping) and
bfusion/rendering_impl.hpp:35-68 (occupancy constant-step march).

TPU design: every pixel marches in lockstep inside one
``lax.while_loop`` over whole-image state tensors; finished rays mask
out. The reference's hierarchical ray iterator
(se_core/include/se/ray_iterator.hpp) exists purely to find the first
allocated block; the equivalent skipping here falls out of the
"unknown voxel -> large step" rule (volume.get of unallocated space
returns weight 0), so no octree descent is required. Ray/map-AABB
clipping replicates the commented KinectFusion preamble
(kfusion/rendering_impl.hpp:76-104) that the ray iterator subsumes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu.constants import (BLOCK_SIDE, FAR_PLANE, INVALID,
                                      NEAR_PLANE, SURF_BOUNDARY)
from supereight_tpu.core import interp as interp_mod
from supereight_tpu.core import map as m
from supereight_tpu.core import se3


def ray_directions(view, width, height):
    """Per-pixel world-space ray dirs (ref rendering.cpp:62-65);
    view = raycast_pose @ invK."""
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    d = jnp.einsum("ij,hwj->hwi", view[:3, :3], pix,
                   precision=jax.lax.Precision.HIGHEST)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def ray_box_range(origin, direction, dim, near=NEAR_PLANE, far=FAR_PLANE):
    """Clip rays against the map cube [0, dim]^3 and the near/far planes."""
    inv = 1.0 / jnp.where(direction == 0, 1e-12, direction)
    tbot = -origin * inv
    ttop = (dim - origin) * inv
    tmin = jnp.minimum(tbot, ttop).max(axis=-1)
    tmax = jnp.maximum(tbot, ttop).min(axis=-1)
    return jnp.maximum(tmin, near), jnp.minimum(tmax, far)


def jump_distance_field(geom, state, max_jump: int = 6):
    """Chebyshev distance (in block units, capped) to the nearest
    allocated block, for safe empty-space jumps.

    Computed per raycast call by ``max_jump`` dense 3^3 min-dilations of
    the allocation mask — a few dense VPU passes over the [B^3] grid,
    negligible next to the march. This is the TPU replacement for the
    reference ray iterator's hierarchy descent (ray_iterator.hpp:116-226):
    instead of walking an octree to skip empty space, every ray reads how
    far it may safely jump.
    """
    occupied = (state.slot >= 0)
    d = jnp.where(occupied, 0, max_jump).astype(jnp.float32)
    for _ in range(max_jump - 1):
        neigh = -jax.lax.reduce_window(
            -d, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
        d = jnp.minimum(d, neigh + 1.0)
    return d.astype(jnp.int32)


def first_allocated_t(geom, state, origin, direction, tnear, tfar,
                      step_vox: int = 4, dist=None):
    """Skip phase: advance each ray to its first allocated block.

    Marches on :func:`jump_distance_field`, stepping
    ``(dist-1) * BLOCK_SIDE + step_vox`` voxels per sample — empty space
    is crossed in block-sized jumps, so the loop runs ~O(surface depth /
    jump) iterations of a single 1-byte-class gather. Sampling inside the
    distance-0 shell at ``step_vox`` (half a block) cannot overshoot any
    block the ray spends >= 4 voxels in.

    Returns (t_first, found): entry-conservative distance (one sample
    before the first occupied sample) and whether any block was found.
    """
    fine = step_vox * geom.voxel_size
    b = geom.blocks_per_side
    if dist is None:
        dist = jump_distance_field(geom, state)

    def probe(t):
        pos = origin + direction * t[..., None]
        bc = jnp.clip((pos * geom.inv_voxel_size).astype(jnp.int32)
                      // BLOCK_SIDE, 0, b - 1)
        return dist[bc[..., 0], bc[..., 1], bc[..., 2]]

    def cond(carry):
        t, found, done, it = carry
        return jnp.any(~(found | done)) & (it < 4 * geom.size)

    def body(carry):
        t, found, done, it = carry
        active = ~(found | done)
        d = probe(t)
        hit = (d == 0) & active
        step = (jnp.maximum(d - 1, 0) * BLOCK_SIDE).astype(jnp.float32) \
            * geom.voxel_size + fine
        new_t = jnp.where(active & ~hit, t + step, t)
        new_done = done | (active & ~hit & (new_t >= tfar))
        return (new_t, found | hit, new_done, it + 1)

    t0 = jnp.maximum(tnear, 0.0)
    t, found, _, _ = jax.lax.while_loop(
        cond, body, (t0, jnp.zeros_like(t0, bool),
                     tnear >= tfar, jnp.int32(0)))
    return jnp.maximum(t - fine, tnear), found


def _voxel_get(geom, state, field, pos_m):
    """volume.get: nearest-voxel fetch at metric position (init if missing),
    ref volume_template.hpp:76-83 -> octree get_fine."""
    v = (pos_m * geom.inv_voxel_size).astype(jnp.int32)  # C float->int trunc
    return m.get_voxel(geom, state, field, v)


def _interp(geom, state, field, pos_m):
    return interp_mod.interp(geom, state, field,
                             pos_m * geom.inv_voxel_size, channel=0)


def _march_field(geom, state):
    """Derived marching field: voxel value with +inf marking unknown space.

    One flat array so each marching step costs ONE gather; the unknown
    test (reference: data.y == 0 -> large step) and the value test ride
    the same fetch. Rebuilt per raycast call — a dense elementwise pass
    over the pool, negligible next to the march itself."""
    return jnp.where(state.data_y == 0, jnp.inf, state.data_x).reshape(-1)


def _march_sample(geom, state, march_flat, pos_m):
    """Single-gather fetch of the marching field at a metric position.

    Out-of-bounds / unallocated space reads +inf (unknown), matching
    get_fine's init {x:1, y:0} classification."""
    v = (pos_m * geom.inv_voxel_size).astype(jnp.int32)
    vv = jnp.clip(v, 0, geom.size - 1)
    inb = jnp.all((v >= 0) & (v < geom.size), axis=-1)
    bc = vv // BLOCK_SIDE
    sl = m.lookup_slot(state, bc)
    ok = (sl >= 0) & inb
    lin = m.voxel_linear_index(vv % BLOCK_SIDE)
    flat = jnp.maximum(sl, 0) * 512 + lin
    return jnp.where(ok, march_flat[flat], jnp.inf)


def _jump_step(geom, dist, pos, largestep):
    """Safe step size in unknown space from the jump-distance field."""
    b = geom.blocks_per_side
    bc = jnp.clip((pos * geom.inv_voxel_size).astype(jnp.int32)
                  // BLOCK_SIDE, 0, b - 1)
    d = dist[bc[..., 0], bc[..., 1], bc[..., 2]]
    return jnp.maximum(
        largestep,
        (jnp.maximum(d - 1, 0) * BLOCK_SIDE).astype(jnp.float32)
        * geom.voxel_size + 0.5 * largestep)


def _march_tsdf(geom, state, field, origin, direction, tnear, tfar, mu,
                step, largestep, max_steps, found=None, dist=None):
    """TSDF sphere tracing (behavior of kfusion/rendering_impl.hpp:34-74).

    Marching decisions use the voxel-sampled field (one gather/step); the
    reference switches to trilinear values inside [-0.5, 0.1] while
    marching, which we defer to the final refinement: once the crossing
    is bracketed, both bracket ends are re-evaluated with trilinear
    interpolation and the zero crossing solved linearly — same sub-voxel
    accuracy, an order of magnitude less gather traffic.

    ``found`` gates rays that intersect no allocated block (the
    reference's t_min > 0 check, rendering.cpp:68-71); ``tnear`` is then
    the skip-phase entry distance, matching ray.tcmin().

    Divergence handling: lockstep marching pays the *slowest* ray per
    iteration (the reference's independent CPU loops do not), so the
    march runs in two passes — a short full-image pass, then the few
    unfinished stragglers (grazing rays sliding along surface bands, far
    misses) are compacted into a small dense batch and finished there.
    """
    shape = tnear.shape
    march_flat = _march_field(geom, state)
    f_t0 = _interp(geom, state, field, origin + direction * tnear[..., None])
    # status: 0 = marching, 1 = hit, 2 = done/no-hit
    go = (tnear < tfar) & (f_t0 > 0)
    if found is not None:
        go = go & found
    status = jnp.where(go, 0, 2).astype(jnp.int32)

    def body(origin, direction, tfar):
        def fn(carry):
            t, ss, f_t, f_tt, status, it = carry
            pos = origin + direction * t[..., None]
            mx = _march_sample(geom, state, march_flat, pos)
            unknown = jnp.isinf(mx)
            active = status == 0

            hit = active & ~unknown & (mx < 0)
            new_f_tt = jnp.where(active & ~unknown, mx, f_tt)
            new_f_t = jnp.where(active & ~unknown & ~hit, mx, f_t)
            # on a hit the reference breaks *before* refreshing stepsize —
            # the refinement uses the step that reached the crossing
            unknown_step = (largestep if dist is None
                            else _jump_step(geom, dist, pos, largestep))
            new_ss = jnp.where(unknown, unknown_step,
                               jnp.maximum(new_f_tt * mu, step))
            new_ss = jnp.where(active & ~hit, new_ss, ss)
            new_t = jnp.where(active & ~hit, t + new_ss, t)
            new_status = jnp.where(hit, 1, status)
            new_status = jnp.where(active & ~hit & (new_t >= tfar), 2,
                                   new_status)
            return (new_t, new_ss, new_f_t, new_f_tt, new_status, it + 1)
        return fn

    def run(carry, origin, direction, tfar, steps):
        def cond(c):
            return jnp.any(c[4] == 0) & (c[5] < steps)
        return jax.lax.while_loop(cond, body(origin, direction, tfar),
                                  carry)

    pass1_steps = min(64, max_steps)
    carry = (jnp.zeros(shape) + tnear,             # t
             jnp.full(shape, largestep),           # stepsize
             jnp.full(shape, jnp.inf),             # f_t (last known sample)
             jnp.zeros(shape), status, jnp.int32(0))
    t, ss, f_t, f_tt, status, _ = run(carry, origin, direction, tfar,
                                      pass1_steps)

    if max_steps > pass1_steps:
        n = int(np.prod(shape))
        budget = max(1024, n // 16)
        unfinished = (status == 0).reshape(-1)
        order = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
        dest = jnp.where(unfinished & (order < budget), order, budget)
        wl = jnp.full((budget,), -1, jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        wlc = jnp.maximum(wl, 0)

        def take(x):
            return x.reshape(n, *x.shape[len(shape):])[wlc]

        sub_status = jnp.where(wl >= 0, 0, 2).astype(jnp.int32)
        sub = (take(t), take(ss), take(f_t), take(f_tt), sub_status,
               jnp.int32(0))
        s_t, s_ss, s_ft, s_ftt, s_status, _ = run(
            sub, take(origin), take(direction), take(tfar),
            max_steps - pass1_steps)

        def put(full, vals):
            return full.reshape(-1).at[jnp.where(wl >= 0, wl, n)].set(
                vals, mode="drop").reshape(shape)

        t = put(t, s_t)
        ss = put(ss, s_ss)
        f_t = put(f_t, s_ft)
        f_tt = put(f_tt, s_ftt)
        status = put(status, s_status)
        # overflowed stragglers (beyond the budget) stay status 0 -> miss

    hit = status == 1
    # trilinear refinement at the bracket ends (the accuracy the
    # reference gets from its in-window interp switch)
    fa = _interp(geom, state, field,
                 origin + direction * (t - ss)[..., None])
    fb = _interp(geom, state, field, origin + direction * t[..., None])
    use_interp = hit & (fb < 0) & (fa >= 0)
    f_hi = jnp.where(use_interp, fa, jnp.where(jnp.isinf(f_t), 1.0, f_t))
    f_lo = jnp.where(use_interp, fb, f_tt)
    denom = jnp.where(f_hi == f_lo, 1.0, f_hi - f_lo)
    t_hit = t + ss * f_lo / denom
    return jnp.where(hit, t_hit, 0.0), hit


def _march_ofusion(geom, state, field, origin, direction, tnear, tfar, mu,
                   step, largestep, max_steps, found=None, dist=None):
    """Occupancy marching (behavior of bfusion/rendering_impl.hpp:35-68).

    Constant voxel step inside allocated blocks; unallocated blocks hold
    no observed voxels, so they are crossed at block-sized steps (the
    reference samples them anyway and learns nothing — skipping them
    cannot change which observed samples are seen). Crossing detection on
    voxel samples, trilinear refinement at the bracket."""
    shape = tnear.shape
    march_flat = _march_field(geom, state)
    f_00 = _interp(geom, state, field, origin + direction * tnear[..., None])
    go = (tnear < tfar) & (f_00 <= SURF_BOUNDARY)
    if found is not None:
        go = go & found
    status = jnp.where(go, 0, 2).astype(jnp.int32)

    state0 = (jnp.zeros(shape) + tnear, jnp.full(shape, step),
              jnp.zeros(shape), jnp.zeros(shape), status, jnp.int32(0))

    def cond(carry):
        t, ss, f_t, f_tt, status, it = carry
        return jnp.any(status == 0) & (it < max_steps)

    def body(carry):
        t, ss, f_t, f_tt, status, it = carry
        pos = origin + direction * t[..., None]
        mx = _march_sample(geom, state, march_flat, pos)
        unknown = jnp.isinf(mx)
        active = status == 0
        hit = active & ~unknown & (mx > SURF_BOUNDARY)
        new_f_tt = jnp.where(active & ~unknown, mx, f_tt)
        new_f_t = jnp.where(active & ~hit, new_f_tt, f_t)
        unknown_step = (largestep if dist is None
                        else _jump_step(geom, dist, pos, largestep))
        new_ss = jnp.where(unknown, unknown_step, step)
        new_ss = jnp.where(active & ~hit, new_ss, ss)
        new_t = jnp.where(active & ~hit, t + new_ss, t)
        new_status = jnp.where(hit, 1, status)
        new_status = jnp.where(active & ~hit & (new_t >= tfar), 2,
                               new_status)
        return (new_t, new_ss, new_f_t, new_f_tt, new_status, it + 1)

    t, ss, f_t, f_tt, status, _ = jax.lax.while_loop(cond, body, state0)
    hit = status == 1
    fa = _interp(geom, state, field,
                 origin + direction * (t - ss)[..., None])
    fb = _interp(geom, state, field, origin + direction * t[..., None])
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

    direction = ray_directions(view, w, h)
    origin = jnp.broadcast_to(view[:3, 3], direction.shape)
    tnear, tfar = ray_box_range(origin, direction, geom.dim, near, far)

    # skip phase: advance every ray to its first allocated block via the
    # jump-distance field (the ray_iterator's job in the reference)
    dist = jump_distance_field(geom, state)
    t_start, found = first_allocated_t(geom, state, origin, direction,
                                       tnear, tfar, dist=dist)

    marcher = _march_tsdf if field.name == "tsdf" else _march_ofusion
    t_hit, hit = marcher(geom, state, field, origin, direction, t_start,
                         tfar, mu, step, largestep, max_steps,
                         found=found, dist=dist)

    vertex = origin + direction * t_hit[..., None]
    g = interp_mod.grad(geom, state, field,
                        vertex * geom.inv_voxel_size, channel=0)
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normal = g / jnp.where(gn == 0, 1.0, gn)
    if field.invert_normals:
        normal = -normal
    ok = hit & (gn[..., 0] > 0)
    vertex = jnp.where(hit[..., None], vertex, 0.0)
    normal = jnp.where(ok[..., None], normal,
                       jnp.array([INVALID, 0.0, 0.0]))
    return vertex, normal, ok
