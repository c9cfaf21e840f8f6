"""Microbenchmark 6: precise gather/scatter/sort rate curves (validated
against xplane traces — wall-clock via block_until_ready, straight-line
ops on real random indices).

Establishes: gather fixed-cost + per-row slope, scatter-min/set rates,
lax.sort throughput, wide-row gather/scatter cost.
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

    print("--- gather from 75MB, random idx ---")
    for n in (76_800, 307_200, 1_228_800, 4_915_200):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, SRC,
                                 jnp.int32)
        f = jax.jit(lambda s, i: s[i] * 2.0)
        t = timeit(f, src, idx)
        print(f"gather N={n:8d}: {t*1e3:8.3f} ms   ({t/n*1e9:6.2f} ns/row)")

    print("--- wide-row gather [N] x 512 f32 rows (worklist pattern) ---")
    src2d = src.reshape(36864, 512)
    for n in (6144, 16384):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, 36864,
                                 jnp.int32)
        f = jax.jit(lambda s, i: s[i] * 2.0)
        t = timeit(f, src2d, idx)
        print(f"rowgather N={n:6d}x2KB: {t*1e3:8.3f} ms")

    print("--- scatter ---")
    img = jnp.full((307_200,), 1e9, jnp.float32)
    for n in (307_200, 1_228_800, 4_915_200):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, 307_200,
                                 jnp.int32)
        val = jax.random.uniform(key, (n,), jnp.float32)
        f = jax.jit(lambda im, i, v: im.at[i].min(v))
        t = timeit(f, img, idx, val)
        print(f"scatter-min N={n:8d} -> [307k]: {t*1e3:8.3f} ms   "
              f"({t/n*1e9:6.2f} ns/row)")

    # permutation scatter-set (no collisions)
    for n in (307_200, 4_915_200):
        perm = jax.random.permutation(jax.random.PRNGKey(2), n)
        val = jax.random.uniform(key, (n,), jnp.float32)
        big = jnp.zeros((n,), jnp.float32)
        f = jax.jit(lambda b, i, v: b.at[i].set(v))
        t = timeit(f, big, perm, val)
        print(f"perm scatter-set N={n:8d}: {t*1e3:8.3f} ms   "
              f"({t/n*1e9:6.2f} ns/row)")

    # wide-row scatter: [n] rows of 512 back into pool
    for n in (6144, 16384):
        idx = jax.random.permutation(jax.random.PRNGKey(3), 36864)[:n]
        val = jax.random.uniform(key, (n, 512), jnp.float32)
        f = jax.jit(lambda p, i, v: p.at[i].set(v))
        t = timeit(f, src2d, idx, val)
        print(f"row scatter-set N={n:6d}x2KB: {t*1e3:8.3f} ms")

    print("--- sort ---")
    for n in (1_000_000, 4_000_000, 9_000_000):
        keys = jax.random.randint(jax.random.PRNGKey(n), (n,), 0,
                                  2**31 - 1, jnp.int32)
        vals = jax.random.uniform(key, (n,), jnp.float32)
        f = jax.jit(lambda kk: jax.lax.sort(kk))
        t = timeit(f, keys, n=3)
        f2 = jax.jit(lambda kk, vv: jax.lax.sort_key_val(kk, vv))
        t2 = timeit(f2, keys, vals, n=3)
        print(f"sort N={n:8d}: keys {t*1e3:8.2f} ms   kv {t2*1e3:8.2f} ms")

    print("--- cumsum / segment boundary (splat pipeline pieces) ---")
    x = jax.random.uniform(key, (4_915_200,), jnp.float32)
    f = jax.jit(lambda a: jnp.cumsum(a))
    print(f"cumsum 4.9M: {timeit(f, x)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
