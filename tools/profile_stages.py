"""Per-stage TPU timing of the SLAM frame step (dev tool).

Times each pipeline stage as its own jitted program on a warm map so
optimization targets the real hot spots. Mirrors the bench.py config.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=10, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration, raycast, tracking
    from supereight_tpu.parallel import step as pstep
    from supereight_tpu.pipeline import _preprocess_and_pyramid

    W, H = 640, 480
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (481.2, 480.0, 320.0, 240.0)
    budget = 16384

    print("synthesizing...", file=sys.stderr)
    depths, poses = synthetic.orbit_sequence(
        8, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))

    fn = functools.partial(
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=0.1, icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1)

    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    kj = jnp.asarray(k, jnp.float32)
    print("warming map (5 frames)...", file=sys.stderr)
    for i in range(5):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i),
                        None)
    jax.block_until_ready(state)
    print("n_blocks =", int(state.map.n_blocks), file=sys.stderr)

    depth = jnp.asarray(depths[5])
    pose = state.pose

    # ---- full fused step -------------------------------------------
    t_full = timeit(fn, state, depth, kj, jnp.int32(6), None)
    print(f"full frame_step      {t_full*1e3:8.2f} ms   ({1/t_full:.3f} fps)")

    # ---- preprocess + pyramid ---------------------------------------
    pp = jax.jit(functools.partial(_preprocess_and_pyramid,
                                   levels=3, neg_y=False,
                                   filter_input=False))
    t_pp = timeit(pp, depth, kj)
    print(f"preprocess+pyramid   {t_pp*1e3:8.2f} ms")
    depths_pyr, verts, norms, valids = pp(depth, kj)

    # ---- tracking -----------------------------------------------------
    tr = jax.jit(functools.partial(tracking.track, iterations=(10, 5, 4),
                                   icp_threshold=1e-5))
    t_tr = timeit(tr, state.pose, state.raycast_pose, kj, verts, norms,
                  valids, state.vertex, state.normal, state.valid)
    print(f"tracking (19 it)     {t_tr*1e3:8.2f} ms")

    # ---- allocation ----------------------------------------------------
    al = jax.jit(functools.partial(allocation.allocate_tsdf, geom, mu=0.1))
    t_al = timeit(al, state.map, depths_pyr[0], pose, kj)
    print(f"allocation           {t_al*1e3:8.2f} ms")

    # ---- integration ----------------------------------------------------
    def integ(ms, d, p, kk):
        return integration.integrate(geom, ms, field, d, p, kk, 0.1, 0.2,
                                     (W, H))
    it_ = jax.jit(integ)
    t_it = timeit(it_, state.map, depth, pose, kj)
    print(f"integration          {t_it*1e3:8.2f} ms")

    # ---- raycast --------------------------------------------------------
    view = jnp.matmul(pose, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    rc = jax.jit(functools.partial(raycast.raycast, geom, field=field,
                                   mu=0.1, frame_size=(W, H)))
    t_rc = timeit(rc, state.map, view=view)
    print(f"raycast              {t_rc*1e3:8.2f} ms")

    # raycast sub-phases
    from supereight_tpu.constants import BLOCK_SIDE, NEAR_PLANE, FAR_PLANE
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)

    mb = jax.jit(functools.partial(raycast.build_march_mirror, geom,
                                   field=field))
    t_mb = timeit(mb, state.map)
    print(f"  mirror build       {t_mb*1e3:8.2f} ms")
    mirror = mb(state.map)

    mar = jax.jit(functools.partial(
        raycast._march, geom, field=field, mu=0.1,
        step=geom.voxel_size, largestep=geom.voxel_size * BLOCK_SIDE,
        max_steps=2 * geom.size))
    t_mar = timeit(mar, state.map, origin=origin, dx=dx, dy=dy, dz=dz,
                   tnear=tnear, tfar=tfar, mirror=mirror)
    print(f"  march (tsdf)       {t_mar*1e3:8.2f} ms")

    t_hit, hitm, _ = mar(state.map, origin=origin, dx=dx, dy=dy, dz=dz,
                         tnear=tnear, tfar=tfar, mirror=mirror)
    iv = geom.inv_voxel_size
    hx, hy, hz = (origin[0] + dx * t_hit) * iv, \
        (origin[1] + dy * t_hit) * iv, (origin[2] + dz * t_hit) * iv
    sent = raycast._sentinel(field)
    gr = jax.jit(functools.partial(raycast._grad_mirror, geom, sent=sent,
                                   fill=1.0))
    t_gr = timeit(gr, mirror, px=hx, py=hy, pz=hz)
    print(f"  grad (normals)     {t_gr*1e3:8.2f} ms")

    ip = jax.jit(functools.partial(raycast._interp_mirror, geom, sent=sent,
                                   fill=1.0))
    t_ip = timeit(ip, mirror, px=hx, py=hy, pz=hz)
    print(f"  interp x1          {t_ip*1e3:8.2f} ms")

    # ---- tracking sub-breakdown ---------------------------------------
    view_t = jnp.matmul(se3.camera_matrix(kj), se3.inverse(state.raycast_pose),
                        precision=jax.lax.Precision.HIGHEST)
    res_fn = jax.jit(lambda p: tracking.track_residuals(
        verts[0], norms[0], valids[0], state.vertex, state.normal,
        state.valid, p, view_t))
    t_res = timeit(res_fn, pose)
    print(f"  track residuals L0 {t_res*1e3:8.2f} ms")
    res, err, jac = res_fn(pose)
    red_fn = jax.jit(tracking.reduce_tracking)
    t_red = timeit(red_fn, res, err, jac)
    print(f"  track reduce L0    {t_red*1e3:8.2f} ms")
    red = red_fn(res, err, jac)
    up_fn = jax.jit(functools.partial(tracking.update_pose,
                                      icp_threshold=1e-5))
    t_up = timeit(up_fn, pose, red)
    print(f"  update_pose (6x6)  {t_up*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
