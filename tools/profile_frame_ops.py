"""Op-level device-time attribution for the FULL fused frame_step at the
bench config — donation-safe (each call consumes the previous state, the
traced call runs on a fresh chained state)."""

import functools
import glob
import gzip
import json
import os
import re
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

    trace_dir = "/tmp/jtt_frame_ops"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        state, aux = fn(state, jnp.asarray(depths[8]), kj, jnp.int32(8))
        jax.block_until_ready(state)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    agg = {}
    total = 0.0
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args_ = e.get("args", {})
        if "device_duration_ps" not in args_:
            continue
        us = float(args_["device_duration_ps"]) / 1e6
        name = re.sub(r"[.\d]+$", "", e.get("name", "?"))
        agg[name] = agg.get(name, 0.0) + us
        total += us
    print(f"frame_step device total: {total/1000.0:.2f} ms")
    for us, name in sorted(((v, k) for k, v in agg.items()),
                           reverse=True)[:28]:
        print(f"  {us/1000:9.3f} ms  {name[:70]}")


if __name__ == "__main__":
    main()
