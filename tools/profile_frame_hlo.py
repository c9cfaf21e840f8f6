"""Top individual device ops of one frame_step execution, cross-referenced
against the compiled HLO text (shapes reveal which source op a fusion is)."""

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
    field = get_field(os.environ.get("SE_FIELD", "tsdf"))
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
        sphere_radius=0.72, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    fn = functools.partial(
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=0.1 if field.name == "tsdf" else 0.008,
        icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1,
        budget=pstep.integration_budget(geom, 8192))
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    kj = jnp.asarray(k, jnp.float32)
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)

    trace_dir = "/tmp/jtt_fhlo"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        state, aux = fn(state, jnp.asarray(depths[8]), kj, jnp.int32(8))
        jax.block_until_ready(state)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    evs = []
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if "device_duration_ps" not in a:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue
        evs.append((float(a["device_duration_ps"]) / 1e9, name))
    evs.sort(reverse=True)
    print("top individual ops (ms):")
    for ms, name in evs[:24]:
        print(f"  {ms:8.3f}  {name[:60]}")

    # HLO text: find those ops' definitions for shape context
    lowered = jax.jit(
        pstep.frame_step,
        static_argnames=("geom", "field", "frame_size", "iterations",
                         "mu", "icp_threshold", "neg_y", "filter_input",
                         "use_gt_pose", "integration_rate",
                         "tracking_rate", "budget", "depth_interp"),
    )
    # reuse the already-jitted wrapper: frame_step itself is jitted, so
    # lower via its own .lower
    low = pstep.frame_step.lower(
        geom, field, state, jnp.asarray(depths[9]), kj, jnp.int32(9),
        None, frame_size=(W, H), iterations=(10, 5, 4),
        mu=0.1 if field.name == "tsdf" else 0.008,
        icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1,
        budget=pstep.integration_budget(geom, 8192), depth_interp=False)
    txt = low.compile().as_text()
    with open("/tmp/frame_step_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO written to /tmp/frame_step_hlo.txt "
          f"({len(txt)//1000} KB)")
    wanted = {re.escape(name.split("(")[0]) for _, name in evs[:14]}
    for _, name in evs[:14]:
        base = name.split("(")[0]
        m = re.search(rf"^\s*(?:ROOT )?%?{re.escape(base)} = [^\n]*", txt,
                      re.M)
        if m:
            print(f"--- {base}\n    {m.group(0)[:300]}")


if __name__ == "__main__":
    main()
