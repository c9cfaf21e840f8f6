"""Op-level device trace of the fused OFusion frame_step at the bench
config: prints the top ops to account for the ~26 ms gap between the
sum of isolated stages (~39 ms) and the fused frame (~65 ms)."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import glob
import gzip
import json

from tools.trace_time import _SKIP_PREFIX  # noqa: E402


def _all_ops(trace_dir):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    total_us = 0.0
    ops = []
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith(_SKIP_PREFIX):
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args:
            continue
        us = float(args["device_duration_ps"]) / 1e6
        total_us += us
        ops.append((us, name))
    ops.sort(reverse=True)
    return total_us / 1000.0, ops


def main():
    import shutil

    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.parallel import step as pstep
    from supereight_tpu.utils import compilecache
    compilecache.enable()

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
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    print(f"blocks={int(state.map.n_blocks)}", flush=True)

    trace_dir = "/tmp/jtt_of_frame_ops"
    shutil.rmtree(trace_dir, ignore_errors=True)
    depth = jnp.asarray(depths[8])
    with jax.profiler.trace(trace_dir):
        state, aux = fn(state, depth, kj, jnp.int32(8))
        jax.block_until_ready(state)
    ms, ops = _all_ops(trace_dir)
    print(f"total {ms:.2f} ms; top ops:", flush=True)
    for us, name in ops[:60]:
        print(f"  {us/1000:9.3f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
