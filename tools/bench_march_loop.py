"""Decisive test: rolled while_loop vs unrolled march with the NEW
mirror sampler (flat 1-index gathers, no modulo, no 3-index gathers).

Reports device ms/step from xplane traces AND compile wall-time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, CAP, N, STEPS = 64, 36864, 307200, 32
    key = jax.random.PRNGKey(0)

    g = np.arange(B)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((X - 32.0) ** 2 + (Y - 32.0) ** 2 + (Z - 32.0) ** 2)
    occ = np.abs(r - 20.0) < 2.0

    # mirror-style dense field [B^3 * 512]
    pool = np.random.randn(B * B * B, 512).astype(np.float32) * 0.5
    d = np.where(occ, 0.0, 3.0)
    pool[~occ.reshape(-1)] = (2.0 + d[~occ]).reshape(-1, 1)
    mirror = jnp.asarray(pool.reshape(-1))

    ox, oy, oz = 3.0, 3.0, 3.0
    dxa = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dya = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32,
                             -0.5, 0.5)
    dza = -jnp.sqrt(jnp.maximum(1.0 - dxa ** 2 - dya ** 2, 0.1))
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    ivs, vs = 512 / 4.8, 4.8 / 512

    def body(mirror, c):
        t, ss, f_t, f_tt, status = c
        px = ox + dxa * t
        py = oy + dya * t
        pz = oz + dza * t
        vx = jnp.clip((px * ivs).astype(jnp.int32), 0, 511)
        vy = jnp.clip((py * ivs).astype(jnp.int32), 0, 511)
        vz = jnp.clip((pz * ivs).astype(jnp.int32), 0, 511)
        cell = ((vx >> 3) * B + (vy >> 3)) * B + (vz >> 3)
        lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
        mx = mirror[cell * 512 + lin]
        known = mx < 1.0
        dist = jnp.where(known, 0.0, jnp.maximum(mx - 2.0, 0.0))
        active = status == 0
        hit = active & known & (mx < 0)
        f_tt = jnp.where(active & known, mx, f_tt)
        f_t = jnp.where(active & known & ~hit, mx, f_t)
        jump = jnp.maximum(0.075, jnp.maximum(dist - 1, 0) * 0.075 + 0.037)
        new_ss = jnp.where(known, jnp.maximum(f_tt * 0.1, vs), jump)
        adv = active & ~hit
        ss = jnp.where(adv, new_ss, ss)
        t = jnp.where(adv, t + ss, t)
        status = jnp.where(hit, 1, status)
        status = jnp.where(adv & (t >= 6.0), 2, status)
        return t, ss, f_t, f_tt, status

    def init(t):
        return (t, t * 0 + 0.075, t + jnp.inf, t * 0,
                jnp.zeros((N,), jnp.int32))

    # rolled while_loop
    def wl(m, t):
        def cond(c):
            i, cc = c
            return (i < STEPS) & jnp.any(cc[4] == 0)

        def b(c):
            i, cc = c
            return (i + 1, body(m, cc))

        return jax.lax.while_loop(cond, b, (0, init(t)))[1]

    # rolled fori_loop (fixed trips)
    def fl(m, t):
        return jax.lax.fori_loop(0, STEPS, lambda i, c: body(m, c), init(t))

    # unrolled
    def ur(m, t):
        c = init(t)
        for _ in range(STEPS):
            c = body(m, c)
        return c

    for name, fn in (("while", wl), ("fori", fl), ("unroll", ur)):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(mirror, t0v))
        compile_s = time.perf_counter() - t0
        ms = timed(f, mirror, t0v, tag=f"march_{name}")
        print(f"{name:6s}: {ms/STEPS:7.3f} ms/step   "
              f"(compile {compile_s:6.1f} s, total {ms:7.2f} ms)")


if __name__ == "__main__":
    main()
