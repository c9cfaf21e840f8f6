"""Microbenchmark 3: while_loop vs fori_loop vs scan for gather-bearing
march bodies at realistic trip counts."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    N = 640 * 480
    SRC = 36864 * 512
    src = jax.random.normal(key, (SRC,), jnp.float32)
    grid = jax.random.randint(key, (64 ** 3,), -5, 20000, jnp.int32)
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    STEPS = 64

    def gbody(t):
        idx = (t * 1e6).astype(jnp.int32) % SRC
        v = src[idx]
        return t + 0.001 + 1e-9 * v

    # while_loop
    def wloop(t):
        def body(c):
            return (gbody(c[0]), c[1] + 1)
        def cond(c):
            return c[1] < STEPS
        return jax.lax.while_loop(cond, body, (t, jnp.int32(0)))[0]

    f = jax.jit(wloop)
    print(f"while_loop 64x1gather    {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # fori_loop
    f = jax.jit(lambda t: jax.lax.fori_loop(0, STEPS,
                                            lambda i, tt: gbody(tt), t))
    print(f"fori_loop  64x1gather    {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # fori_loop with DYNAMIC (traced) trip count
    f = jax.jit(lambda t, n_: jax.lax.fori_loop(0, n_,
                                                lambda i, tt: gbody(tt), t))
    print(f"fori dyn-n 64x1gather    {timeit(f, t0v, jnp.int32(STEPS))/STEPS*1e3:7.3f} ms/step")

    # scan
    def sloop(t):
        def body(tt, _):
            return gbody(tt), None
        out, _ = jax.lax.scan(body, t, None, length=STEPS)
        return out

    f = jax.jit(sloop)
    print(f"scan       64x1gather    {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # march-shaped body in fori_loop (6 carried arrays, 2 gathers, masking)
    def body_d(c):
        t, ss, f_t, f_tt, status = c
        px = 0.1 + 0.5 * t
        py = 0.2 + 0.4 * t
        pz = 0.3 + 0.3 * t
        vx = jnp.clip((px * 106.0).astype(jnp.int32), 0, 511)
        vy = jnp.clip((py * 106.0).astype(jnp.int32), 0, 511)
        vz = jnp.clip((pz * 106.0).astype(jnp.int32), 0, 511)
        mt = grid[((vx >> 3) * 64 + (vy >> 3)) * 64 + (vz >> 3)]
        lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
        mx = src[(jnp.maximum(mt, 0) * 512 + lin) % SRC]
        known = (mt >= 0) & ~jnp.isinf(mx)
        dist = jnp.where(mt < 0, (-1 - mt).astype(jnp.float32), 0.0)
        active = status == 0
        hit = active & known & (mx < -10.0)
        new_f_tt = jnp.where(active & known, mx, f_tt)
        new_f_t = jnp.where(active & known & ~hit, mx, f_t)
        jump = jnp.maximum(0.075, jnp.maximum(dist - 1, 0) * 0.075 + 0.037)
        new_ss = jnp.where(known, jnp.maximum(new_f_tt * 0.001, 0.009), jump)
        new_ss = jnp.where(active & ~hit, new_ss, ss)
        new_t = jnp.where(active & ~hit, t + new_ss, t)
        new_status = jnp.where(hit, 1, status)
        new_status = jnp.where(active & ~hit & (new_t >= 40.0), 2,
                               new_status)
        return (new_t, new_ss, new_f_t, new_f_tt, new_status)

    st0 = jnp.zeros((N,), jnp.int32)
    init = (t0v, t0v * 0 + 0.075, t0v + jnp.inf, t0v * 0, st0)

    f = jax.jit(lambda t: jax.lax.fori_loop(
        0, STEPS, lambda i, c: body_d(c),
        (t, t * 0 + 0.075, t + jnp.inf, t * 0, st0)))
    print(f"fori march-shaped 64     {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # march-shaped with early-exit via while(any & it<n) — the old form
    def wmarch(t):
        def body(c):
            return body_d(c[:5]) + (c[5] + 1,)
        def cond(c):
            return jnp.any(c[4] == 0) & (c[5] < STEPS)
        return jax.lax.while_loop(cond, body,
                                  (t, t * 0 + 0.075, t + jnp.inf, t * 0,
                                   st0, jnp.int32(0)))

    f = jax.jit(wmarch)
    print(f"while march-shaped 64    {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # hybrid: outer while over chunks of fori(8) — early exit at chunk level
    CH = 8

    def hmarch(t):
        def inner(c):
            return jax.lax.fori_loop(0, CH, lambda i, cc: body_d(cc), c)

        def body(c):
            return inner(c[:5]) + (c[5] + 1,)

        def cond(c):
            return jnp.any(c[4] == 0) & (c[5] < STEPS // CH)

        return jax.lax.while_loop(cond, body,
                                  (t, t * 0 + 0.075, t + jnp.inf, t * 0,
                                   st0, jnp.int32(0)))

    f = jax.jit(hmarch)
    print(f"while(fori8) march 64    {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
