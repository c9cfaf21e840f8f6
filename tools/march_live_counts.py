"""How many rays are still marching after each cascade stage?
(sizes the cascade budgets; uses the real primed bench scene)"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402  (cache enable)


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

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    for primed in (True, False):
        tn = tnear
        if primed:
            prime = raycast.prime_from_depth(d, kj)
            backoff = 0.2 + 2.0 * geom.voxel_size
            tn = jnp.where(prime > 0, jnp.maximum(tnear, prime - backoff),
                           tnear)

        nav = raycast.build_nav(geom, m)
        strips = raycast.build_strips(geom, m, field)
        unk = raycast._sentinel(field)

        @jax.jit
        def counts(nav, strips, tn, tfar):
            n = tn.shape[0]
            t = tn + 0.0
            ss = jnp.full((n,), 0.075)
            f_t = jnp.full((n,), jnp.inf)
            f_tt = jnp.zeros((n,))
            f0, known0, _ = raycast._probe(geom, nav, strips, unk,
                                           origin[0] + dx * tn,
                                           origin[1] + dy * tn,
                                           origin[2] + dz * tn)
            v0 = jnp.where(known0, f0, 1.0)
            go = (tn < tfar) & (v0 > 0)
            status = jnp.where(go, 0, 2).astype(jnp.int32)
            out = []
            c = (t, ss, f_t, f_tt, status)

            def one(c):
                t, ss, f_t, f_tt, status = c
                mx, known, dist = raycast._probe(
                    geom, nav, strips, unk,
                    origin[0] + dx * t, origin[1] + dy * t,
                    origin[2] + dz * t)
                active = status == 0
                crossed = mx < 0
                hit = active & known & crossed
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & known & ~hit, mx, f_t)
                known_step = jnp.maximum(f_tt * 0.1, geom.voxel_size)
                jump = jnp.maximum(0.075, jnp.maximum(dist - 1, 0.0) * 0.075
                                   + 0.0375)
                new_ss = jnp.where(known, known_step, jump)
                adv = active & ~hit
                ss = jnp.where(adv, new_ss, ss)
                t = jnp.where(adv, t + ss, t)
                status = jnp.where(hit, 1, status)
                status = jnp.where(adv & (t >= tfar), 2, status)
                return (t, ss, f_t, f_tt, status)

            marks = {3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64}
            for i in range(1, 65):
                c = one(c)
                if i in marks:
                    out.append(jnp.sum(c[4] == 0))
            return jnp.stack(out)

        cs = counts(nav, strips, tn, tfar)
        print(("primed" if primed else "cold  "),
              [int(x) for x in cs], flush=True)


if __name__ == "__main__":
    main()
