"""r3 focused profile: primed/cold march, strips build, integration —
device-trace times + top-op attribution at the bench config."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_raycast_ops import timed_agg  # noqa: E402
from tools.trace_time import timed  # noqa: E402


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
    print(f"warm blocks: {int(m.n_blocks)}", file=sys.stderr)

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)

    nv = jax.jit(functools.partial(raycast.build_nav, geom))
    nav = nv(m)
    print(f"nav build      {timed(nv, m, tag='nav'):8.2f} ms")

    st_fn = jax.jit(functools.partial(raycast.build_strips, geom,
                                      field=field))
    strips = st_fn(m)
    print("strips build:")
    print(f"  total {timed_agg(st_fn, m, tag='strips'):8.2f} ms")

    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    prime = raycast.prime_from_depth(d, kj)

    marp = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_, pt: raycast._march(
        geom, m, field, o, a, b, c, tn, tf, 0.1, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_,
        prime_t=pt))
    print("march (primed):")
    print(f"  total {timed_agg(marp, origin, dx, dy, dz, tnear, tfar, nav, strips, prime, tag='marp'):8.2f} ms")

    rcp = jax.jit(lambda ms_, v, pt: raycast.raycast(
        geom, ms_, field, v, 0.1, (W, H), prime_t=pt))
    print("raycast full (primed, incl nav+strips):")
    print(f"  total {timed_agg(rcp, m, view, prime, tag='rcp'):8.2f} ms")

    ig = jax.jit(lambda ms_, dd, pp: integration.integrate(
        geom, ms_, field, dd, pp, kj, 0.1, 0.2, (W, H)))
    print("integration:")
    print(f"  total {timed_agg(ig, m, d, p, tag='integ'):8.2f} ms")

    al = jax.jit(lambda ms_, dd, pp: allocation.allocate_tsdf(
        geom, ms_, dd, pp, kj, 0.1))
    print("allocation:")
    print(f"  total {timed_agg(al, m, d, p, tag='alloc'):8.2f} ms")


if __name__ == "__main__":
    main()
