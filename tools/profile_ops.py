"""Op-level TPU profiler: run the real march / tracking under
jax.profiler.trace and print the top device ops by total time.
"""

import glob
import gzip
import json
import collections
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRACE_DIR = "/tmp/jaxtrace_march"


def top_ops(trace_dir, k=40):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    ev = d.get("traceEvents", [])
    # keep only device-ish complete events (exclude python/host frames)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith(("$", "Pjit", "PJRT", "Parse", "Python",
                            "jit_", "pmap")):
            continue
        tot[name] += e.get("dur", 0)
        cnt[name] += 1
    print(f"{'total_ms':>9} {'count':>6}  op")
    for name, us in tot.most_common(k):
        print(f"{us/1000:9.2f} {cnt[name]:6d}  {name[:90]}")


def main():
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import raycast, tracking
    from supereight_tpu.parallel import step as pstep
    from supereight_tpu.pipeline import _preprocess_and_pyramid

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)

    depths, poses = synthetic.orbit_sequence(
        6, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))

    fn = functools.partial(
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=0.1, icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    kj = jnp.asarray(k, jnp.float32)
    print("warming...", file=sys.stderr)
    for i in range(5):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i),
                        None)
    jax.block_until_ready(state)

    depth = jnp.asarray(depths[5])
    with jax.profiler.trace(TRACE_DIR):
        s2, aux = fn(state, depth, kj, jnp.int32(6), None)
        jax.block_until_ready(s2)

    top_ops(TRACE_DIR)


if __name__ == "__main__":
    main()
