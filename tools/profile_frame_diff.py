"""Branch-cost attribution by frame-arg diffing on ONE compiled program:
frame=2 skips the raycast branch (frame>2 gate), so
cost(raycast branch) = t(frame=8) - t(frame=2). Donation-safe chaining."""

import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from supereight_tpu.utils import compilecache  # noqa: E402
compilecache.enable()


def main():
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.parallel import step as pstep
    from supereight_tpu.utils import deviceprof

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
        sphere_radius=0.72, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    fn = functools.partial(
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=0.1, icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1,
        budget=pstep.integration_budget(geom, 8192))
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    kj = jnp.asarray(k, jnp.float32)
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    print(f"warm blocks: {int(aux['n_blocks'])}", file=sys.stderr)

    def run(frame_val, n, tag):
        nonlocal state
        d = jnp.asarray(depths[9])
        trace_dir = f"/tmp/jtt_fd_{tag}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                state, _ = fn(state, d, kj, jnp.int32(frame_val))
            jax.block_until_ready(state)
        s, cnt = deviceprof.program_device_seconds(trace_dir,
                                                   "jit_frame_step")
        print(f"frame={frame_val}: {s/n*1000:8.2f} ms/frame ({cnt} execs)")
        return s / n

    t_full = run(8, 4, "full")
    t_norc = run(2, 4, "norc")     # raycast branch off (frame>2 gate)
    print(f"raycast branch: {(t_full-t_norc)*1000:8.2f} ms")
    # integration masked off (tracked stays True, rate gate fails):
    # frame=9 with integration_rate irrelevant here (rate=1) — instead
    # diff a no-integrate program is a different compile; skip.


if __name__ == "__main__":
    main()
