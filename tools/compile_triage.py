"""Measure REMOTE compile time of each changed program, one at a time,
with flushed progress prints and no profiler traces (safe to leave
running; never kill mid-trace). Usage:
  python tools/compile_triage.py [rc|tr|frame ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from supereight_tpu.utils import compilecache  # noqa: E402
compilecache.enable()


def main():
    only = set(sys.argv[1:]) or {"rc", "tr", "frame"}
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import raycast, tracking
    from supereight_tpu.parallel import step as pstep

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    kj = jnp.asarray(k, jnp.float32)
    budget = 8192
    print(f"[{time.strftime('%H:%M:%S')}] start", flush=True)
    state = pstep.init_frame_state(geom, field, (W, H),
                                   jnp.eye(4, dtype=jnp.float32))

    if "rc" in only:
        t0 = time.time()
        view = jnp.eye(4, dtype=jnp.float32)
        out = raycast.raycast(geom, state.map, field, view, 0.1, (W, H),
                              pool_bucket=budget)
        jax.block_until_ready(out)
        print(f"[{time.strftime('%H:%M:%S')}] raycast cold compile "
              f"{time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        prime = jnp.zeros((W * H,), jnp.float32)
        out = raycast.raycast(geom, state.map, field, view, 0.1, (W, H),
                              prime_t=prime, pool_bucket=budget)
        jax.block_until_ready(out)
        print(f"[{time.strftime('%H:%M:%S')}] raycast primed compile "
              f"{time.time()-t0:.0f}s", flush=True)

    if "tr" in only:
        t0 = time.time()
        verts = tuple(jnp.zeros((H >> i, W >> i, 3)) for i in range(3))
        valids = tuple(jnp.zeros((H >> i, W >> i), bool) for i in range(3))
        out = tracking.track(
            jnp.eye(4), jnp.eye(4), kj, verts, verts, valids,
            jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)),
            jnp.zeros((H, W), bool), iterations=(10, 5, 4),
            icp_threshold=1e-5)
        jax.block_until_ready(out)
        print(f"[{time.strftime('%H:%M:%S')}] tracking compile "
              f"{time.time()-t0:.0f}s (condskip="
              f"{tracking._CONDSKIP})", flush=True)

    if "frame" in only:
        t0 = time.time()
        depths, poses = synthetic.orbit_sequence(
            2, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
            sphere_radius=0.72, angle_span=0.1,
            room=((0.55,) * 3, (4.25,) * 3))
        fn = functools.partial(
            pstep.frame_step, geom, field, frame_size=(W, H),
            iterations=(10, 5, 4), mu=0.1, icp_threshold=1e-5,
            neg_y=False, filter_input=False, use_gt_pose=False,
            integration_rate=1, tracking_rate=1, budget=budget)
        state, aux = fn(state, jnp.asarray(depths[0]), kj, jnp.int32(0))
        jax.block_until_ready(state)
        print(f"[{time.strftime('%H:%M:%S')}] frame_step compile "
              f"{time.time()-t0:.0f}s", flush=True)

    print(f"[{time.strftime('%H:%M:%S')}] done", flush=True)


if __name__ == "__main__":
    main()
