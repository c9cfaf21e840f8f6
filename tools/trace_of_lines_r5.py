"""By-source-line device time of the fused OFusion frame_step at the
bench config (where do the 65 ms go?)."""

import functools
import os
import sys

# timed_by_line calls the fn twice with the SAME state arg; donation
# would delete its buffers on the first call
os.environ["SE_TPU_NO_DONATE"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_by_line import timed_by_line  # noqa: E402


def main():
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
        pstep.frame_step, geom, field,
        frame_size=(W, H), iterations=(10, 5, 4),
        mu=mu, icp_threshold=1e-5, neg_y=False, filter_input=False,
        use_gt_pose=False, integration_rate=1, tracking_rate=1,
        budget=budget)
    for i in range(8):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    print(f"blocks={int(state.map.n_blocks)}", flush=True)

    depth = jnp.asarray(depths[8])
    timed_by_line(lambda s: fn(s, depth, kj, jnp.int32(8)), state,
                  tag="of_lines", top=40)


if __name__ == "__main__":
    main()
