"""Slice the fused OFusion frame_step into three jitted programs that
replicate its EXACT internals (same when= masking, stats, prime) and
trace-time each — isolates the ~27 ms present only in the fused program
(stages sum ~31 ms, fused frame ~58 ms)."""

import functools
import os
import sys

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
    field = get_field(os.environ.get("SE_FIELD", "ofusion"))
    mu = 0.1 if field.name == "tsdf" else 0.008
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    budget = pstep.integration_budget(geom, 8192)
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(10, 5, 4), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=budget)
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    print(f"blocks={int(state.map.n_blocks)}", flush=True)
    depth = jnp.asarray(depths[8])
    frame = jnp.int32(8)

    # ---- slice A: preprocess + tracking -----------------------------
    @jax.jit
    def slice_a(st, d, kk, fr):
        depths_, verts, norms, valids = _preprocess_and_pyramid(
            d, kk, 3, False, False)
        pose_t, tracked_t, reduction, result = tracking.track(
            st.pose, st.raycast_pose, kk, verts, norms, valids,
            st.vertex, st.normal, st.valid, (10, 5, 4), 1e-5)
        do_track = (fr % 1) == 0
        pose = jnp.where(do_track, pose_t, st.pose)
        tracked = jnp.where(do_track, tracked_t, False)
        return depths_[0], pose, tracked

    d0, pose, tracked = slice_a(state, depth, kj, frame)
    print(f"A pp+track        {timed(slice_a, state, depth, kj, frame, tag='sa'):8.2f} ms",
          flush=True)

    # ---- slice B: allocation + integrate, with when= ----------------
    @jax.jit
    def slice_b(mp, d0_, d, p, fr, trk):
        do_integrate = (trk | (fr <= 3)) & (((fr % 1) == 0) | (fr <= 3))
        alloc_fn = (allocation.allocate_ofusion if field.multiscale_alloc
                    else allocation.allocate_tsdf)
        m2, astats = alloc_fn(
            geom, mp, d0_, p, kj, mu, with_stats=True, when=do_integrate)
        new_map, istats = integration.integrate(
            geom, m2, field, d, p, kj, mu,
            (1.0 / 30.0) * fr.astype(jnp.float32), (W, H),
            budget=budget, with_stats=True, when=do_integrate)
        return new_map, astats["alloc_overflow"], istats["blocks_truncated"]

    new_map, _, _ = slice_b(state.map, d0, depth, pose, frame, tracked)
    jax.block_until_ready(new_map)
    print(f"B alloc+integrate {timed(slice_b, state.map, d0, depth, pose, frame, tracked, tag='sb'):8.2f} ms",
          flush=True)

    # ---- slice C: raycast + output merges ---------------------------
    @jax.jit
    def slice_c(mp, st, d, p, fr):
        view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                          precision=jax.lax.Precision.HIGHEST)
        prime = raycast.prime_from_depth(d, kj)
        r_vertex, r_normal, r_valid, rstats = raycast.raycast(
            geom, mp, field, view, mu, (W, H), prime_t=prime,
            with_stats=True, pool_bucket=budget)
        do_raycast = fr > 2
        vertex = jnp.where(do_raycast, r_vertex, st.vertex)
        normal = jnp.where(do_raycast, r_normal, st.normal)
        valid = jnp.where(do_raycast, r_valid, st.valid)
        return vertex, normal, valid, rstats["ray_overflow"]

    out = slice_c(new_map, state, depth, pose, frame)
    jax.block_until_ready(out)
    print(f"C raycast+merge   {timed(slice_c, new_map, state, depth, pose, frame, tag='sc'):8.2f} ms",
          flush=True)

    # ---- full fused step (no donation copy; threaded state) ---------
    import shutil
    from supereight_tpu.utils import deviceprof
    trace_dir = "/tmp/jtt_of_slice_full"
    shutil.rmtree(trace_dir, ignore_errors=True)
    s2 = jax.tree.map(jnp.copy, state)
    jax.block_until_ready(s2)
    with jax.profiler.trace(trace_dir):
        for j in range(4):
            s2, _ = fn(s2, depth, kj, jnp.int32(8 + j))
        jax.block_until_ready(s2)
    dev_s, n_exec = deviceprof.program_device_seconds(trace_dir,
                                                     "jit_frame_step")
    print(f"FULL fused        {dev_s / max(n_exec, 1) * 1e3:8.2f} ms "
          f"({n_exec} execs)", flush=True)


if __name__ == "__main__":
    main()
