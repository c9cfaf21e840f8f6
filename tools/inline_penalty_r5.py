"""Why does the raycast cost ~2x inside the fused program?

Measures the same raycast on the same map four ways:
  inner  — the @jit raycast program called directly
  outer  — an outer jax.jit wrapping just the raycast call (inlined)
for both fields. If outer >> inner, XLA compiles the inlined raycast
worse in a larger module — the fused-frame overhead seen in r5 slicing
(16.9 ms isolated vs 36.3 ms in-slice for OFusion).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration, raycast

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    k = (240.6, 240.0, 160.0, 120.0)
    kj = jnp.asarray(k, jnp.float32)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))

    for field_name in (sys.argv[1:] or ["ofusion", "tsdf"]):
        field = get_field(field_name)
        mu = 0.1 if field_name == "tsdf" else 0.008
        from supereight_tpu.core.map import make_map
        m = make_map(geom, field)
        for i in range(8):
            d = jnp.asarray(depths[i])
            p = jnp.asarray(poses[i], jnp.float32)
            if field.multiscale_alloc:
                m = allocation.allocate_ofusion(geom, m, d, p, kj, mu)
            else:
                m = allocation.allocate_tsdf(geom, m, d, p, kj, mu)
            m = integration.integrate(geom, m, field, d, p, kj, mu,
                                      i / 30.0, (W, H))
        jax.block_until_ready(m)
        p = jnp.asarray(poses[8], jnp.float32)
        depth = jnp.asarray(depths[8])
        view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                          precision=jax.lax.Precision.HIGHEST)
        prime = raycast.prime_from_depth(depth, kj)
        print(f"{field_name}: blocks={int(m.n_blocks)}", flush=True)

        rc = functools.partial(raycast.raycast, geom, field=field, mu=mu,
                               frame_size=(W, H), pool_bucket=8192)
        ms = timed(lambda mm, v, pt: rc(state=mm, view=v, prime_t=pt),
                   m, view, prime, tag=f"in_{field_name}")
        print(f"  inner jit          {ms:8.2f} ms", flush=True)

        outer = jax.jit(lambda mm, v, pt: rc(state=mm, view=v, prime_t=pt))
        ms = timed(outer, m, view, prime, tag=f"out_{field_name}")
        print(f"  outer jit (inline) {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
