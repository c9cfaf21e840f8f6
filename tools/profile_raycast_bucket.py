"""Standalone primed raycast: bucketed vs full-capacity strips table,
plus the new cascade. Device-trace timed."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_raycast_ops import timed_agg  # noqa: E402


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
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr)

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    prime = raycast.prime_from_depth(d, kj)

    for bucket in (None, 8192):
        f = jax.jit(lambda ms_, v, pt: raycast.raycast(
            geom, ms_, field, v, 0.1, (W, H), prime_t=pt,
            pool_bucket=bucket), static_argnames=())
        out = f(m, view, prime)
        jax.block_until_ready(out)
        print(f"raycast primed bucket={bucket}:")
        print(f"  total {timed_agg(f, m, view, prime, tag=f'rb{bucket}'):8.2f} ms")
        vld = out[2]
        print(f"  valid frac: {float(jnp.mean(out[2])):0.3f}")


if __name__ == "__main__":
    main()
