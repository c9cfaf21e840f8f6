"""Microbenchmark 2: why do gathers cost ~4 ms inside while_loops?

Variants: standalone vs computed-index vs in-loop; index count sweep;
source size sweep; index layout experiments.
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
    SRC = 36864 * 512
    src = jax.random.normal(key, (SRC,), jnp.float32)
    grid = jax.random.normal(key, (64 ** 3,), jnp.float32)

    N = 640 * 480
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.0, 1.0)
    idx = jax.random.randint(key, (N,), 0, SRC, jnp.int32)

    # 1. standalone, precomputed indices
    f = jax.jit(lambda s, i: s[i])
    print(f"1 standalone precomp idx      {timeit(f, src, idx)*1e3:7.3f} ms")

    # 2. standalone, computed indices, reduced output (no big output copy)
    f = jax.jit(lambda s, t: s[(t * 1e6).astype(jnp.int32) % SRC].sum())
    print(f"2 standalone computed idx     {timeit(f, src, t0v)*1e3:7.3f} ms")

    # 3. fori_loop with 8 dependent gathers
    def loop8(s, t):
        def body(_, tt):
            v = s[(tt * 1e6).astype(jnp.int32) % SRC]
            return tt + 1e-9 * v + 0.001
        return jax.lax.fori_loop(0, 8, body, t)

    f = jax.jit(loop8)
    print(f"3 fori 8 dependent gathers    {timeit(f, src, t0v)/8*1e3:7.3f} ms/gather")

    # 4. unrolled 8 dependent gathers (no loop primitive)
    def unroll8(s, t):
        for _ in range(8):
            v = s[(t * 1e6).astype(jnp.int32) % SRC]
            t = t + 1e-9 * v + 0.001
        return t

    f = jax.jit(unroll8)
    print(f"4 unrolled 8 dep gathers      {timeit(f, src, t0v)/8*1e3:7.3f} ms/gather")

    # 5. unrolled 8 INDEPENDENT gathers
    def indep8(s, t):
        acc = 0.0
        for i in range(8):
            acc = acc + s[((t + 0.001 * i) * 1e6).astype(jnp.int32) % SRC]
        return acc

    f = jax.jit(indep8)
    print(f"5 unrolled 8 indep gathers    {timeit(f, src, t0v)/8*1e3:7.3f} ms/gather")

    # 6. index-count sweep, unrolled dependent, from 75MB source
    for n in (19200, 76800, 307200, 1228800):
        tv = jax.random.uniform(key, (n,), jnp.float32, 0.0, 1.0)
        f = jax.jit(unroll8)
        print(f"6 dep gathers N={n:8d}      {timeit(f, src, tv)/8*1e3:7.3f} ms/gather")

    # 7. source-size sweep at N=307200 (grid 1MB vs pool 75MB)
    def unroll8_grid(g, t):
        for _ in range(8):
            v = g[(t * 1e6).astype(jnp.int32) % (64 ** 3)]
            t = t + 1e-9 * v + 0.001
        return t

    f = jax.jit(unroll8_grid)
    print(f"7 dep gathers 1MB src         {timeit(f, grid, t0v)/8*1e3:7.3f} ms/gather")

    # 8. 2D-shaped indices [2400, 128] (lane-aligned minor dim)
    t2 = t0v.reshape(2400, 128)
    f = jax.jit(unroll8)
    print(f"8 dep gathers idx [2400,128]  {timeit(f, src, t2)/8*1e3:7.3f} ms/gather")

    # 9. take with mode='fill' vs clip semantics
    def take8(s, t):
        for _ in range(8):
            v = jnp.take(s, (t * 1e6).astype(jnp.int32) % SRC,
                         indices_are_sorted=False, unique_indices=False,
                         mode="clip")
            t = t + 1e-9 * v + 0.001
        return t

    f = jax.jit(take8)
    print(f"9 dep take mode=clip          {timeit(f, src, t0v)/8*1e3:7.3f} ms/gather")

    # 10. sorted-ish indices (spatially coherent rays)
    tsorted = jnp.sort(t0v)
    f = jax.jit(unroll8)
    print(f"10 dep gathers sorted idx     {timeit(f, src, tsorted)/8*1e3:7.3f} ms/gather")

    # 11. gather of contiguous PAIRS: s[i] and s[i+1] via reshape trick
    src2 = src.reshape(-1, 2)

    def pair8(s2, t):
        for _ in range(8):
            v = s2[(t * 5e5).astype(jnp.int32) % (SRC // 2)]  # [N, 2]
            t = t + 1e-9 * (v[:, 0] + v[:, 1]) + 0.001
        return t

    f = jax.jit(pair8)
    print(f"11 dep pair-gathers [N,2]     {timeit(f, src2, t0v)/8*1e3:7.3f} ms/gather")

    # 12. one-hot matmul gather from 1MB grid (VMEM-sized source)
    # grid [262144] -> as [2048, 128]; index -> row one-hot? too big; skip.

    # 13. dynamic_slice-based block gather: 512-elem rows by scalar? skip.

    # 14. bf16 source
    src16 = src.astype(jnp.bfloat16)

    def unroll8_16(s, t):
        for _ in range(8):
            v = s[(t * 1e6).astype(jnp.int32) % SRC].astype(jnp.float32)
            t = t + 1e-9 * v + 0.001
        return t

    f = jax.jit(unroll8_16)
    print(f"14 dep gathers bf16 src       {timeit(f, src16, t0v)/8*1e3:7.3f} ms/gather")


if __name__ == "__main__":
    main()
