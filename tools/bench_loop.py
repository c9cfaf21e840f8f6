"""Microbenchmark: cost drivers of lax.while_loop bodies on TPU.

The march runs ~64-96 lockstep iterations; this isolates what one
iteration costs as a function of body contents.
"""

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
    dxv = jax.random.uniform(key, (N,), jnp.float32, -1.0, 1.0)

    STEPS = 64

    def loop(body, carry):
        def cond(c):
            return c[-1] < STEPS
        return jax.lax.while_loop(cond, body, carry)

    # A: pure elementwise body, 1 carried array
    def body_a(c):
        t, it = c
        return (t + 0.01 * jnp.sin(t), it + 1)

    f = jax.jit(lambda t: loop(body_a, (t, jnp.int32(0))))
    print(f"A elementwise-only   {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # B: one flat gather per step
    def body_b(c):
        t, it = c
        idx = (t * 1e6).astype(jnp.int32) % SRC
        v = src[idx]
        return (t + 0.001 + 1e-9 * v, it + 1)

    f = jax.jit(lambda t: loop(body_b, (t, jnp.int32(0))))
    print(f"B 1 gather           {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # C: two chained gathers (grid then pool) per step
    def body_c(c):
        t, it = c
        gi = (t * 1e5).astype(jnp.int32) % (64 ** 3)
        mt = grid[gi]
        v = src[jnp.maximum(mt, 0) * 512 % SRC]
        return (t + 0.001 + 1e-9 * v + 1e-12 * mt.astype(jnp.float32),
                it + 1)

    f = jax.jit(lambda t: loop(body_c, (t, jnp.int32(0))))
    print(f"C 2 chained gathers  {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # D: march-shaped: 6 carried arrays, 2 gathers, ~30 elementwise ops
    def body_d(c):
        t, ss, f_t, f_tt, status, it = c
        px = 0.1 + dxv * t
        py = 0.2 + dxv * t
        pz = 0.3 + dxv * t
        vx = (px * 106.0).astype(jnp.int32)
        vy = (py * 106.0).astype(jnp.int32)
        vz = (pz * 106.0).astype(jnp.int32)
        inb = ((vx >= 0) & (vx < 512) & (vy >= 0) & (vy < 512)
               & (vz >= 0) & (vz < 512))
        vx = jnp.clip(vx, 0, 511)
        vy = jnp.clip(vy, 0, 511)
        vz = jnp.clip(vz, 0, 511)
        mt = grid[((vx >> 3) * 64 + (vy >> 3)) * 64 + (vz >> 3)]
        lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
        mx = src[(jnp.maximum(mt, 0) * 512 + lin) % SRC]
        known = (mt >= 0) & inb & ~jnp.isinf(mx)
        dist = jnp.where(mt < 0, (-1 - mt).astype(jnp.float32), 0.0)
        active = status == 0
        hit = active & known & (mx < 0)
        new_f_tt = jnp.where(active & known, mx, f_tt)
        new_f_t = jnp.where(active & known & ~hit, mx, f_t)
        jump = jnp.maximum(0.075, jnp.maximum(dist - 1, 0) * 0.075 + 0.037)
        new_ss = jnp.where(known, jnp.maximum(new_f_tt * 0.1, 0.009), jump)
        new_ss = jnp.where(active & ~hit, new_ss, ss)
        new_t = jnp.where(active & ~hit, t + new_ss, t)
        new_status = jnp.where(hit, 1, status)
        new_status = jnp.where(active & ~hit & (new_t >= 4.0), 2, new_status)
        return (new_t, new_ss, new_f_t, new_f_tt, new_status, it + 1)

    st0 = jnp.zeros((N,), jnp.int32)
    f = jax.jit(lambda t: loop(
        body_d, (t, t * 0 + 0.075, t + jnp.inf, t * 0, st0, jnp.int32(0))))
    print(f"D march-shaped       {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # E: same as D but cond checks any(status==0) too (early-exit form)
    def loop_e(carry):
        def cond(c):
            return jnp.any(c[4] == 0) & (c[5] < STEPS)
        return jax.lax.while_loop(cond, body_d, carry)

    f = jax.jit(lambda t: loop_e(
        (t, t * 0 + 0.075, t + jnp.inf, t * 0, st0, jnp.int32(0))))
    print(f"E D + any() cond     {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # F: E on the straggler shape (19200 rays)
    M = 19200
    f = jax.jit(lambda t: loop_e(
        (t[:M], t[:M] * 0 + 0.075, t[:M] + jnp.inf, t[:M] * 0,
         st0[:M], jnp.int32(0))))
    print(f"F E @ 19200 rays     {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # G: 28 sibling reductions over 7 [H,W] arrays (tracking reduce shape)
    comps = [jax.random.normal(jax.random.PRNGKey(i), (480, 640))
             for i in range(7)]

    def reduce28(*z):
        terms = [jnp.sum(z[0] * z[0])]
        terms += [jnp.sum(z[0] * z[1 + i]) for i in range(6)]
        terms += [jnp.sum(z[1 + r] * z[1 + c]) for r in range(6)
                  for c in range(r, 6)]
        return jnp.stack(terms)

    f = jax.jit(reduce28)
    print(f"G 28 sibling sums    {timeit(f, *comps)*1e3:7.3f} ms")

    # H: same via [7, N] @ [N, 7] matmul
    def gram(*z):
        zz = jnp.stack([c.reshape(-1) for c in z])          # [7, N]
        return jnp.matmul(zz, zz.T,
                          precision=jax.lax.Precision.HIGHEST)

    f = jax.jit(gram)
    print(f"H [7,N]x[N,7] gram   {timeit(f, *comps)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
