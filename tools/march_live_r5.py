"""Live-ray decay per march step with the r5 step policies (OFusion
sigma-band stepping, TSDF crawl escalation) — sizes the cascade
budgets. Replicates the CURRENT _march body + primed two-phase start on
the warm bench scene, runs one full-width rolled loop, prints live
counts per step.

Usage: python tools/march_live_r5.py [tsdf|ofusion] [cold]
"""

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

    field_name = sys.argv[1] if len(sys.argv) > 1 else "ofusion"
    primed = "cold" not in sys.argv[2:]
    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field(field_name)
    is_tsdf = field_name == "tsdf"
    mu = 0.1 if is_tsdf else 0.008
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
        if is_tsdf:
            m = allocation.allocate_tsdf(geom, m, d, p, kj, mu)
        else:
            m = allocation.allocate_ofusion(geom, m, d, p, kj, mu)
        m = integration.integrate(geom, m, field, d, p, kj, mu, i / 30.0,
                                  (W, H))
    jax.block_until_ready(m)
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr, flush=True)

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear0, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    zcos = raycast.camera_zcos(view, dx, dy, dz)
    unk = raycast._sentinel(field)
    step = geom.voxel_size
    largestep = step * 8
    bstep = largestep
    fill = 1.0 if is_tsdf else 0.0
    of_cap = max(step, min(2.4 * step, 2.7 * mu))

    nav = raycast.build_nav4(raycast.build_nav(geom, m, field),
                             geom.blocks_per_side)
    strips = raycast.build_strips(geom, m, field, bucket=8192)
    prime = raycast.prime_from_depth(d, kj) if primed else None

    N_STEPS = 72

    @jax.jit
    def counts(tnear, prime_t):
        n = tnear.shape[0]
        if prime_t is not None:
            big = (2.0 if is_tsdf else 6.0) * mu + 2.0 * geom.voxel_size
            small = 0.5 * mu + 2.0 * geom.voxel_size
            t_tight = jnp.where(prime_t > 0,
                                jnp.maximum(tnear, prime_t - small), tnear)
            ft, kt, _, _ = raycast._probe(geom, nav, strips, unk,
                                          origin[0] + dx * t_tight,
                                          origin[1] + dy * t_tight,
                                          origin[2] + dz * t_tight)
            ok_tight = kt & ((ft > 0) if is_tsdf else (ft <= 0))
            tnear = jnp.where(ok_tight, t_tight,
                              jnp.where(prime_t > 0,
                                        jnp.maximum(tnear, prime_t - big),
                                        tnear))
            v0 = jnp.where(ok_tight, ft, fill)
        else:
            f0, known0, _, _ = raycast._probe(geom, nav, strips, unk,
                                              origin[0] + dx * tnear,
                                              origin[1] + dy * tnear,
                                              origin[2] + dz * tnear)
            v0 = jnp.where(known0, f0, fill)
        go = (tnear < tfar) & ((v0 > 0) if is_tsdf else (v0 <= 0))
        status = jnp.where(go, 0, 2).astype(jnp.int32)

        t = tnear + 0.0
        ss = jnp.full((n,), largestep if is_tsdf else step)
        f_t = jnp.full((n,), jnp.inf) if is_tsdf else jnp.zeros((n,))
        f_tt = jnp.zeros((n,))
        crawl = jnp.zeros((n,))

        def one(c):
            t, ss, f_t, f_tt, status, crawl = c
            mx, known, dist, in_block = raycast._probe(
                geom, nav, strips, unk,
                origin[0] + dx * t, origin[1] + dy * t,
                origin[2] + dz * t)
            active = status == 0
            crossed = (mx < 0) if is_tsdf else (mx > 0)
            hit = active & known & crossed
            if is_tsdf:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & known & ~hit, mx, f_t)
                esc = jnp.maximum(crawl - 16.0, 0.0)
                floor = jnp.minimum(
                    step * (1.0 + jnp.minimum(esc * 0.125, 3.0)),
                    jnp.maximum(jnp.float32(step), 0.4 * mu))
                known_step = jnp.maximum(f_tt * mu, floor)
                fine = known
            else:
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & ~hit, f_tt, f_t)
                z = t * zcos
                sigma = jnp.clip(mu * z * z, 2.0 * step, 0.05)
                known_step = jnp.clip(0.5 * sigma, step, of_cap)
                fine = in_block
            jump = jnp.maximum(largestep,
                               jnp.maximum(dist - 1, 0.0) * bstep
                               + 0.5 * largestep)
            new_ss = jnp.where(fine, known_step, jump)
            adv = active & ~hit
            if is_tsdf:
                crawling = adv & fine & (f_tt * mu <= floor)
                crawl = jnp.where(crawling, crawl + 1.0,
                                  jnp.where(adv, 0.0, crawl))
            ss = jnp.where(adv, new_ss, ss)
            t = jnp.where(adv, t + ss, t)
            status = jnp.where(hit, 1, status)
            status = jnp.where(adv & (t >= tfar), 2, status)
            return t, ss, f_t, f_tt, status, crawl

        c = (t, ss, f_t, f_tt, status, crawl)
        live = [jnp.sum(c[4] == 0)]
        for _ in range(N_STEPS):
            c = one(c)
            live.append(jnp.sum(c[4] == 0))
        return jnp.stack(live), jnp.sum(c[4] == 1)

    live, hits = counts(tnear0, prime)
    live = [int(x) for x in live]
    n = W * H
    print(f"{field_name} {'primed' if primed else 'cold'}: "
          f"start {live[0]} live of {n}")
    for i, v in enumerate(live):
        if i % 2 == 0 or v == 0:
            print(f"  step {i:3d}: live {v:7d} ({v / n:7.2%})")
        if v == 0:
            break
    print(f"hits: {int(hits)}; live at {N_STEPS}: {live[-1]}")


if __name__ == "__main__":
    main()
