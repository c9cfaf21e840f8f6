"""Microbenchmark 5: dependent-gather cost vs source size and row count.

Decides the raycast redesign: if small-source gathers are cheap, the
block-grid phases are nearly free and only in-band pool probes count;
if cost scales with row count, lowering resolution scales linearly.
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
    STEPS = 32

    def chain(src, t, size):
        for k in range(STEPS):
            h = ((t * 1e4).astype(jnp.int32).astype(jnp.uint32)
                 * jnp.uint32(2654435761) + jnp.uint32(k * 40503))
            idx = (h % jnp.uint32(size)).astype(jnp.int32)
            v = src[idx]
            t = t + 0.001 + 1e-9 * v
        return t

    # source-size sweep at N=307200 rows
    N = 307200
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    for size, tag in [(16 * 1024, "64KB"), (256 * 1024, "1MB"),
                      (2 * 1024 * 1024, "8MB"), (18 * 1024 * 1024, "72MB")]:
        src = jax.random.normal(key, (size,), jnp.float32)
        f = jax.jit(lambda s, t, z=size: chain(s, t, z))
        print(f"src {tag:5s} N=307k:  {timeit(f, src, t0v)/STEPS*1e3:7.3f} ms/step")

    # row-count sweep at 72MB source
    src = jax.random.normal(key, (18 * 1024 * 1024,), jnp.float32)
    for n in (19200, 76800, 153600, 307200):
        tv = jax.random.uniform(key, (n,), jnp.float32, 0.4, 1.0)
        f = jax.jit(lambda s, t: chain(s, t, 18 * 1024 * 1024))
        print(f"src 72MB N={n:7d}: {timeit(f, src, tv)/STEPS*1e3:7.3f} ms/step")

    # row-count sweep at 1MB source
    src = jax.random.normal(key, (256 * 1024,), jnp.float32)
    for n in (76800, 307200):
        tv = jax.random.uniform(key, (n,), jnp.float32, 0.4, 1.0)
        f = jax.jit(lambda s, t: chain(s, t, 256 * 1024))
        print(f"src  1MB N={n:7d}: {timeit(f, src, tv)/STEPS*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
