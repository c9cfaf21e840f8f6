"""Device-trace the SHARDED step on a real-chip 1-device mesh at the
bench config (VERDICT r4 weak #7: the dist step had never been
device-timed). Prints ms/frame of the compiled dist step program and the
single-chip fused frame_step for the overhead delta.

Usage: python tools/dist_trace_r5.py [n_frames]
"""

import functools
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from supereight_tpu.utils import compilecache  # noqa: E402
compilecache.enable()


def main():
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.parallel import dist_step, step as pstep
    from supereight_tpu.utils import deviceprof

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    mu = 0.1
    k = (240.6, 240.0, 160.0, 120.0)
    kj = jnp.asarray(k, jnp.float32)
    n_warm = 8
    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    depths, poses = synthetic.orbit_sequence(
        n_warm + n_timed, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))

    mesh = dist_step.make_mesh(1)
    step = dist_step.make_dist_step(
        mesh, geom, field, frame_size=(W, H), iterations=(10, 5, 4),
        mu=mu, icp_threshold=1e-5, frustum_halo=True,
        halo_budget=8192, budget=8192)
    state = dist_step.init_dist_state(mesh, geom, field, (W, H), poses[0])
    t0 = time.perf_counter()
    for i in range(n_warm):
        state, aux = step(state, jnp.asarray(depths[i]), kj,
                          jnp.int32(i), None)
    jax.block_until_ready(state)
    print(f"warm {time.perf_counter()-t0:.0f}s "
          f"blocks={int(jnp.sum(aux['n_blocks_dev']))} "
          f"halo={int(aux['halo_blocks'])}", flush=True)

    trace_dir = "/tmp/jtt_dist_r5"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for i in range(n_warm, n_warm + n_timed):
            state, aux = step(state, jnp.asarray(depths[i]), kj,
                              jnp.int32(i), None)
        jax.block_until_ready(state)
    s, cnt = deviceprof.program_device_seconds(trace_dir, "jit_")
    print(f"dist step (1-dev mesh): {s / max(cnt, 1) * 1e3:8.2f} ms/frame "
          f"({cnt} execs)", flush=True)

    # single-chip fused step for the same frames: the dist overhead delta
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(10, 5, 4), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=8192)
    st1 = pstep.init_frame_state(geom, field, (W, H), poses[0])
    for i in range(n_warm):
        st1, _ = fn(st1, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(st1)
    trace_dir = "/tmp/jtt_dist_r5_single"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for i in range(n_warm, n_warm + n_timed):
            st1, _ = fn(st1, jnp.asarray(depths[i]), kj, jnp.int32(i))
        jax.block_until_ready(st1)
    s1, c1 = deviceprof.program_device_seconds(trace_dir, "jit_frame_step")
    print(f"fused single-chip:      {s1 / max(c1, 1) * 1e3:8.2f} ms/frame "
          f"({c1} execs)", flush=True)


if __name__ == "__main__":
    main()
