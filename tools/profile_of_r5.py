"""r5 OFusion stage profile at the bench config: full frame_step + each
stage, trace-timed (tools/trace_time.timed). Finds where the 68 ms of
the 14.7 fps OFusion frame goes before redesigning the march.

Usage: python tools/profile_of_r5.py [stage ...] > /tmp/of_prof.txt
Stages: frame pp tr al ig rc tables mar
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    only = set(sys.argv[1:])

    def want(name):
        return not only or name in only

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
    field = get_field("ofusion")
    mu = 0.008
    k = (240.6, 240.0, 160.0, 120.0)

    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)

    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    budget = pstep.integration_budget(geom, 8192)
    fn = functools.partial(
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=mu, icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1,
        budget=budget)
    print("warming frame_step...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    print(f"  compile+8 frames {time.perf_counter()-t0:.0f}s, "
          f"blocks={int(state.map.n_blocks)}", file=sys.stderr, flush=True)

    depth = jnp.asarray(depths[8])
    if want("frame"):
        import shutil
        from supereight_tpu.utils import deviceprof
        trace_dir = "/tmp/jtt_of_frame"
        shutil.rmtree(trace_dir, ignore_errors=True)
        s2 = jax.tree.map(jnp.copy, state)
        jax.block_until_ready(s2)
        with jax.profiler.trace(trace_dir):
            for j in range(4):
                s2, _ = fn(s2, depth, kj, jnp.int32(8 + j))
            jax.block_until_ready(s2)
        dev_s, n_exec = deviceprof.program_device_seconds(
            trace_dir, "jit_frame_step")
        print(f"FULL frame_step      {dev_s / max(n_exec, 1) * 1e3:8.2f} ms"
              f" ({n_exec} execs)", flush=True)

    m_state = state.map
    pose = state.pose
    pp = jax.jit(functools.partial(_preprocess_and_pyramid, levels=3,
                                   neg_y=False, filter_input=False))
    dp, verts, norms, valids = pp(depth, kj)
    if want("pp"):
        print(f"preprocess           {timed(pp, depth, kj, tag='pp'):8.2f} ms",
              flush=True)

    if want("tr"):
        tr = jax.jit(functools.partial(tracking.track, iterations=(10, 5, 4),
                                       icp_threshold=1e-5))
        print(f"tracking             "
              f"{timed(tr, pose, state.raycast_pose, kj, verts, norms, valids, state.vertex, state.normal, state.valid, tag='tr'):8.2f} ms",
              flush=True)

    if want("al"):
        al = jax.jit(functools.partial(allocation.allocate_ofusion, geom,
                                       mu=mu))
        print(f"allocation+mips      "
              f"{timed(al, m_state, dp[0], pose, kj, tag='al'):8.2f} ms",
              flush=True)

    if want("ig"):
        ig = jax.jit(lambda ms_, d, p: integration.integrate(
            geom, ms_, field, d, p, kj, mu, 0.2, (W, H), budget=budget))
        print(f"integration          "
              f"{timed(ig, m_state, depth, pose, tag='ig'):8.2f} ms",
              flush=True)

    view = jnp.matmul(pose, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    prime = raycast.prime_from_depth(depth, kj)
    if want("rc"):
        rc = functools.partial(raycast.raycast, geom, field=field, mu=mu,
                               frame_size=(W, H), pool_bucket=budget)
        print(f"raycast (primed)     "
              f"{timed(lambda m_, v, pt: rc(state=m_, view=v, prime_t=pt), m_state, view, prime, tag='rc'):8.2f} ms",
              flush=True)
        print(f"raycast (cold)       "
              f"{timed(lambda m_, v: rc(state=m_, view=v), m_state, view, tag='rcc'):8.2f} ms",
              flush=True)

    nv = jax.jit(functools.partial(raycast.build_nav, geom, field=field,
                                   bucket=budget))
    nav = nv(m_state)
    st = jax.jit(functools.partial(raycast.build_strips, geom, field=field,
                                   bucket=budget))
    strips = st(m_state)
    if want("tables"):
        print(f"  nav build (w/mips) {timed(nv, m_state, tag='nv'):8.2f} ms",
              flush=True)
        print(f"  strips build       {timed(st, m_state, tag='st'):8.2f} ms",
              flush=True)

    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    zc = raycast.camera_zcos(view, dx, dy, dz)
    mar = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_, pt: raycast._march(
        geom, m_state, field, o, a, b, c, tn, tf, mu, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_,
        prime_t=pt, zcos=zc))
    if want("mar"):
        print(f"  march (primed)     "
              f"{timed(mar, origin, dx, dy, dz, tnear, tfar, nav, strips, prime, tag='mar'):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
