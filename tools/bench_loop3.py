"""Microbenchmark 4: is the slow march gather a FUSION artifact?

Compares unrolled march-shaped chains with (a) local vs random indices,
(b) with/without optimization_barrier around the gather (barrier forces
the gather to stay a standalone HLO op with the fast bulk emitter).
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
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    STEPS = 32

    def chain(t, *, rand, barrier):
        for k in range(STEPS):
            if rand:
                h = ((t * 1e4).astype(jnp.int32).astype(jnp.uint32)
                     * jnp.uint32(2654435761) + jnp.uint32(k * 40503))
                idx = (h % jnp.uint32(SRC)).astype(jnp.int32)
            else:
                idx = (t * 1e6).astype(jnp.int32) % SRC
            if barrier:
                idx = jax.lax.optimization_barrier(idx)
            v = src[idx]
            if barrier:
                v = jax.lax.optimization_barrier(v)
            t = t + 0.001 + 1e-9 * v
        return t

    for rand in (False, True):
        for barrier in (False, True):
            f = jax.jit(lambda t, r=rand, b=barrier: chain(t, rand=r,
                                                           barrier=b))
            ms = timeit(f, t0v) / STEPS * 1e3
            print(f"unrolled32 rand={int(rand)} barrier={int(barrier)}: "
                  f"{ms:7.3f} ms/step")

    # wide-row variant: gather [N] rows of 8 f32 (32B) per step
    src8 = src.reshape(-1, 8)

    def chain_row(t):
        for k in range(STEPS):
            h = ((t * 1e4).astype(jnp.int32).astype(jnp.uint32)
                 * jnp.uint32(2654435761) + jnp.uint32(k * 40503))
            idx = (h % jnp.uint32(SRC // 8)).astype(jnp.int32)
            idx = jax.lax.optimization_barrier(idx)
            v = src8[idx]                     # [N, 8]
            v = jax.lax.optimization_barrier(v)
            t = t + 0.001 + 1e-9 * v.sum(axis=-1)
        return t

    f = jax.jit(chain_row)
    print(f"unrolled32 row8 barrier=1:  {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")

    # two chained gathers per step (grid then pool), barriered, random
    grid = jax.random.randint(key, (64 ** 3,), 0, 36863, jnp.int32)

    def chain2(t):
        for k in range(STEPS):
            h = ((t * 1e4).astype(jnp.int32).astype(jnp.uint32)
                 * jnp.uint32(2654435761) + jnp.uint32(k * 40503))
            gi = (h % jnp.uint32(64 ** 3)).astype(jnp.int32)
            gi = jax.lax.optimization_barrier(gi)
            mt = grid[gi]
            mt = jax.lax.optimization_barrier(mt)
            idx = mt * 512 + (k % 512)
            idx = jax.lax.optimization_barrier(idx)
            v = src[idx]
            v = jax.lax.optimization_barrier(v)
            t = t + 0.001 + 1e-9 * v + 1e-12 * mt.astype(jnp.float32)
        return t

    f = jax.jit(chain2)
    print(f"unrolled32 2-gather barrier: {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
