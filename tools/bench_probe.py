"""Trace-timed cost of the real _probe step and _interp_grad at bench
scale, on a warmed map."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    N = W * H
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

    # keep the PLAIN nav for _march (which applies build_nav4 itself);
    # only direct _probe/_interp_grad calls take the nav4 form
    # (ADVICE r4: double-wrapping broke the march/interp stages)
    nav = raycast.build_nav(geom, m)
    nav4 = raycast.build_nav4(nav, geom.blocks_per_side)
    strips = raycast.build_strips(geom, m, field)
    jax.block_until_ready((nav, nav4, strips))

    p = jnp.asarray(poses[5], jnp.float32)
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx = dxi.reshape(-1)
    dy = dyi.reshape(-1)
    dz = dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)

    unk = raycast._sentinel(field)

    def probe16(nv4, strips, t0):
        t = t0
        acc = jnp.zeros_like(t)
        for _ in range(16):
            v, known, dist, _ = raycast._probe(
                geom, nv4, strips, unk,
                origin[0] + dx * t, origin[1] + dy * t,
                origin[2] + dz * t)
            acc = acc + v
            t = t + jnp.where(known, 0.05, dist * 0.075 + 0.0375)
        return acc

    ms = timed(jax.jit(probe16), nav4, strips, tnear, tag="p16")
    print(f"probe x16 @76800: {ms:8.3f} ms ({ms/16/N*1e6:5.1f} ns/probe)")

    # full march step (the stage body) — measured via _march at
    # max_steps=16 which is stage0-only (cascade stage 0 = 16 cold)
    mar16 = jax.jit(lambda nv, st, tn: raycast._march(
        geom, m, field, origin, dx, dy, dz, tn, tfar, 0.1,
        geom.voxel_size, geom.voxel_size * 8, 16, nav=nv, strips=st))
    ms = timed(mar16, nav, strips, tnear, tag="m16")
    print(f"march 16 steps:  {ms:8.3f} ms")

    iv = geom.inv_voxel_size
    hx = (origin[0] + dx * 2.0) * iv
    hy = (origin[1] + dy * 2.0) * iv
    hz = (origin[2] + dz * 2.0) * iv
    nav4 = raycast.build_nav4(nav, geom.blocks_per_side)
    ig = jax.jit(lambda nv, ist, a, b, c: raycast._interp_grad(
        geom, nv, ist, unk, 1.0, a, b, c))
    ms = timed(ig, nav4, strips, hx, hy, hz, tag="ig")
    print(f"interp_grad:     {ms:8.3f} ms ({ms/N*1e6:5.1f} ns/pt)")

    bn = jax.jit(lambda mm: raycast.build_nav(geom, mm))
    print(f"nav build:       {timed(bn, m, tag='bn'):8.3f} ms")
    bs = jax.jit(lambda mm: raycast.build_strips(geom, mm, field))
    print(f"strips build:    {timed(bs, m, tag='bs'):8.3f} ms")


if __name__ == "__main__":
    main()
