"""How many rays are still marching after each step?
(sizes the cascade budgets; uses the real primed bench scene and the
CURRENT _march start logic — two-phase tight/big primed backoff)"""

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
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr)

    p = jnp.asarray(poses[5], jnp.float32)
    d = jnp.asarray(depths[5])
    view = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear0, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    mu = 0.1
    unk = raycast._sentinel(field)
    step = geom.voxel_size
    largestep = step * 8
    bstep = largestep

    nav = raycast.build_nav4(raycast.build_nav(geom, m),
                             geom.blocks_per_side)
    strips = raycast.build_strips(geom, m, field, bucket=8192)

    @jax.jit
    def counts(tnear, prime_t):
        n = tnear.shape[0]
        if prime_t is not None:
            big = 2.0 * mu + 2.0 * geom.voxel_size
            small = 0.5 * mu + 2.0 * geom.voxel_size
            t_tight = jnp.where(prime_t > 0,
                                jnp.maximum(tnear, prime_t - small), tnear)
            ft, kt, _, _ = raycast._probe(geom, nav, strips, unk,
                                          origin[0] + dx * t_tight,
                                          origin[1] + dy * t_tight,
                                          origin[2] + dz * t_tight)
            ok_tight = kt & (ft > 0)
            tnear = jnp.where(ok_tight, t_tight,
                              jnp.where(prime_t > 0,
                                        jnp.maximum(tnear, prime_t - big),
                                        tnear))
        f0, known0, _, _ = raycast._probe(geom, nav, strips, unk,
                                          origin[0] + dx * tnear,
                                          origin[1] + dy * tnear,
                                          origin[2] + dz * tnear)
        v0 = jnp.where(known0, f0, 1.0)
        go = (tnear < tfar) & (v0 > 0)
        status = jnp.where(go, 0, 2).astype(jnp.int32)

        t = tnear + 0.0
        ss = jnp.full((n,), largestep)
        f_t = jnp.full((n,), jnp.inf)
        f_tt = jnp.zeros((n,))

        def one(c):
            t, ss, f_t, f_tt, status = c
            mx, known, dist, in_block = raycast._probe(
                geom, nav, strips, unk,
                origin[0] + dx * t, origin[1] + dy * t,
                origin[2] + dz * t)
            active = status == 0
            crossed = mx < 0
            hit = active & known & crossed
            f_tt = jnp.where(active & known, mx, f_tt)
            f_t = jnp.where(active & known & ~hit, mx, f_t)
            known_step = jnp.maximum(f_tt * mu, step)
            jump = jnp.maximum(largestep,
                               jnp.maximum(dist - 1, 0.0) * bstep
                               + 0.5 * largestep)
            new_ss = jnp.where(known, known_step, jump)
            adv = active & ~hit
            ss = jnp.where(adv, new_ss, ss)
            t = jnp.where(adv, t + ss, t)
            status = jnp.where(hit, 1, status)
            status = jnp.where(adv & (t >= tfar), 2, status)
            return (t, ss, f_t, f_tt, status)

        marks = {1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 24, 32, 48, 64, 96}
        out = []
        c = (t, ss, f_t, f_tt, status)
        for i in range(1, 97):
            c = one(c)
            if i in marks:
                out.append(jnp.sum(c[4] == 0))
        return jnp.stack(out)

    prime = raycast.prime_from_depth(d, kj)
    for name, pt in (("primed", prime), ("cold  ", None)):
        cs = counts(tnear0, pt)
        marks = [1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 24, 32, 48, 64, 96]
        print(name, {mk: int(x) for mk, x in zip(marks, cs)}, flush=True)


if __name__ == "__main__":
    main()
