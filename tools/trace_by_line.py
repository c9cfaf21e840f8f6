"""Aggregate device time of a traced program by source file:line."""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402  (enables compile cache)


def timed_by_line(fn, *args, tag="op", top=24):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/jtl_{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    agg = {}
    total = 0.0
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if "device_duration_ps" not in a:
            continue
        us = float(a["device_duration_ps"]) / 1e6
        name = e.get("name", "?")
        if name.startswith("jit_"):        # parent; children carry lines
            continue
        sf = a.get("source_file", "?").split("/")[-1]
        sl = a.get("source_line", "?")
        key = f"{sf}:{sl}"
        agg[key] = agg.get(key, 0.0) + us
        total += us
    for us, key in sorted(((v, k) for k, v in agg.items()),
                          reverse=True)[:top]:
        print(f"    {us/1000:9.3f} ms  {key}")
    print(f"  total {total/1000:.2f} ms")
    return total / 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry, make_map
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration, raycast

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        6, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
        sphere_radius=0.72, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    m = make_map(geom, field)
    for i in range(5):
        d = jnp.asarray(depths[i])
        p = jnp.asarray(poses[i], jnp.float32)
        m = allocation.allocate_tsdf(geom, m, d, p, kj, 0.1)
        m = integration.integrate(geom, m, field, d, p, kj, 0.1, 0.0,
                                  (W, H))
    jax.block_until_ready(m)
    print(f"blocks: {int(m.n_blocks)}", flush=True)

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    prime = raycast.prime_from_depth(d, kj)

    which = sys.argv[1] if len(sys.argv) > 1 else "raycast_primed"
    if which == "raycast_primed":
        f = lambda mm, v, pt: raycast.raycast(geom, mm, field, v, 0.1,
                                              (W, H), prime_t=pt)
        timed_by_line(f, m, view, prime, tag="rp")
    elif which == "integrate":
        f = lambda mm: integration.integrate(geom, mm, field, d, p, kj,
                                             0.1, 0.2, (W, H))
        timed_by_line(f, m, tag="ii")
    elif which == "allocate":
        f = lambda mm: allocation.allocate_tsdf(geom, mm, d, p, kj, 0.1)
        timed_by_line(f, m, tag="aa")


if __name__ == "__main__":
    main()
