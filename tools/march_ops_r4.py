"""Op-level attribution of the primed march at the bench config (r4)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_raycast_ops import timed_agg  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration, raycast
    from supereight_tpu.parallel import step as pstep

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    budget = 8192
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
        sphere_radius=0.72, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    mm = state.map
    for i in range(8):
        p = jnp.asarray(poses[i], jnp.float32)
        d = jnp.asarray(depths[i])
        mm = allocation.allocate_tsdf(geom, mm, d, p, kj, 0.1)
        mm = integration.integrate(geom, mm, field, d, p, kj, 0.1,
                                   i / 30.0, (W, H), budget=budget)
    jax.block_until_ready(mm)
    print(f"blocks={int(mm.n_blocks)}", flush=True)

    p = jnp.asarray(poses[8], jnp.float32)
    d = jnp.asarray(depths[8])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    nv = jax.jit(functools.partial(raycast.build_nav, geom, bucket=budget))
    st = jax.jit(functools.partial(raycast.build_strips, geom, field=field,
                                   bucket=budget))
    nav = nv(mm)
    strips = st(mm)
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    prime = raycast.prime_from_depth(d, kj)
    mar = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_, pt: raycast._march(
        geom, mm, field, o, a, b, c, tn, tf, 0.1, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_,
        prime_t=pt))
    print("march (primed) op attribution:", flush=True)
    total = timed_agg(mar, origin, dx, dy, dz, tnear, tfar, nav, strips,
                      prime, tag="mar4")
    print(f"  total {total:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
