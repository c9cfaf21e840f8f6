"""Per-stage compile-time + device-time at the BENCH config (320x240),
each stage as its own program (small compiles), using xplane traces.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


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

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    budget = 8192

    depths, poses = synthetic.orbit_sequence(
        8, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))

    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])

    if os.environ.get("PROFILE_FULL_FRAME"):
        fn = functools.partial(
            pstep.frame_step, geom, field,
            frame_size=(W, H), iterations=(10, 5, 4),
            mu=0.1, icp_threshold=1e-5, neg_y=False, filter_input=False,
            use_gt_pose=False, integration_rate=1, tracking_rate=1)
        print("warming (compiles frame_step; slow once)...",
              file=sys.stderr)
        t0 = time.perf_counter()
        for i in range(5):
            state, aux = fn(state, jnp.asarray(depths[i]), kj,
                            jnp.int32(i), None)
        jax.block_until_ready(state)
        print(f"frame_step compile+5 frames: {time.perf_counter()-t0:.0f}s",
              file=sys.stderr)
        ms = timed(fn, state, jnp.asarray(depths[5]), kj, jnp.int32(6),
                   None, tag="frame")
        print(f"full frame_step   {ms:8.2f} ms (device)")
        m_state = state.map
    else:
        # warm the map with the cheap stage functions (no frame_step
        # compile): ground-truth poses, allocate + integrate per frame
        print("warming map via stage calls...", file=sys.stderr)
        m_state = state.map
        for i in range(5):
            p = jnp.asarray(poses[i], jnp.float32)
            d = jnp.asarray(depths[i])
            m_state = allocation.allocate_tsdf(geom, m_state, d, p, kj,
                                               0.1)
            m_state = integration.integrate(geom, m_state, field, d, p,
                                            kj, 0.1, i / 30.0, (W, H))
        jax.block_until_ready(m_state)
        state = state._replace(map=m_state,
                               pose=jnp.asarray(poses[4], jnp.float32),
                               raycast_pose=jnp.asarray(poses[4],
                                                        jnp.float32))
        vrt, nrm, vld = raycast.raycast(
            geom, m_state, field,
            jnp.matmul(state.pose, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST),
            0.1, (W, H))
        state = state._replace(vertex=vrt, normal=nrm, valid=vld)
        print(f"warm blocks: {int(m_state.n_blocks)}", file=sys.stderr)

    depth = jnp.asarray(depths[5])
    pose = state.pose

    def piece(name, f, *args, **kw):
        t0 = time.perf_counter()
        out = f(*args, **kw)
        jax.block_until_ready(out)
        c = time.perf_counter() - t0
        ms = timed(f, *args, tag=name, **kw)
        print(f"{name:14s} {ms:8.2f} ms (device)   compile {c:6.1f} s")
        return out

    pp = jax.jit(functools.partial(_preprocess_and_pyramid, levels=3,
                                   neg_y=False, filter_input=False))
    piece("preprocess", pp, depth, kj)
    dp, verts, norms, valids = pp(depth, kj)

    tr = jax.jit(functools.partial(tracking.track, iterations=(10, 5, 4),
                                   icp_threshold=1e-5))
    piece("tracking", tr, state.pose, state.raycast_pose, kj, verts,
          norms, valids, state.vertex, state.normal, state.valid)

    al = jax.jit(functools.partial(allocation.allocate_tsdf, geom, mu=0.1))
    piece("allocation", al, state.map, dp[0], pose, kj)

    def integ(ms_, d, p, kk):
        return integration.integrate(geom, ms_, field, d, p, kk, 0.1, 0.2,
                                     (W, H))
    piece("integration", jax.jit(integ), state.map, depth, pose, kj)

    view = jnp.matmul(pose, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    rc = jax.jit(lambda ms_, v: raycast.raycast(geom, ms_, field, v,
                                                0.1, (W, H)))
    piece("raycast", rc, state.map, view)

    nv = jax.jit(functools.partial(raycast.build_nav, geom))
    nav = piece("nav build", nv, state.map)
    ms_fn = jax.jit(functools.partial(raycast.build_strips, geom,
                                      field=field))
    strips = piece("strips build", ms_fn, state.map)

    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    mar = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_: raycast._march(
        geom, state.map, field, o, a, b, c, tn, tf, 0.1, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_))
    piece("march (cold)", mar, origin, dx, dy, dz, tnear, tfar,
          nav, strips)
    prime = raycast.prime_from_depth(depth, kj)
    marp = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_, pt: raycast._march(
        geom, state.map, field, o, a, b, c, tn, tf, 0.1, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_,
        prime_t=pt))
    piece("march (primed)", marp, origin, dx, dy, dz, tnear, tfar,
          nav, strips, prime)

    hx = (origin[0] + dx * 2.0) * geom.inv_voxel_size
    hy = (origin[1] + dy * 2.0) * geom.inv_voxel_size
    hz = (origin[2] + dz * 2.0) * geom.inv_voxel_size
    sent = raycast._sentinel(field)
    nav4 = raycast.build_nav4(nav, geom.blocks_per_side)
    ig = jax.jit(functools.partial(raycast._interp_grad, geom))
    piece("interp+grad", ig, nav4, strips, sent, 1.0, hx, hy, hz)

    rcp = jax.jit(lambda ms_, v, pt: raycast.raycast(
        geom, ms_, field, v, 0.1, (W, H), prime_t=pt))
    piece("raycast primed", rcp, state.map, view, prime)

if __name__ == "__main__":
    main()
