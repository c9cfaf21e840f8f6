"""Microbenchmark: TPU gather cost vs source size / element width / count.

Informs raycast march design (gathers per step are the unit of cost).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=20):
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
    N = 640 * 480  # rays

    for src_elems, tag in [(64 ** 3, "64^3 grid (1MB f32)"),
                           (512 ** 3 // 8, "16.7M"),
                           (36864 * 512, "pool 18.9M")]:
        src32 = jax.random.normal(key, (src_elems,), jnp.float32)
        src16 = src32.astype(jnp.bfloat16)
        idx = jax.random.randint(key, (N,), 0, src_elems, jnp.int32)

        g32 = jax.jit(lambda s, i: s[i])
        g16 = jax.jit(lambda s, i: s[i])
        t32 = timeit(g32, src32, idx)
        t16 = timeit(g16, src16, idx)
        print(f"gather 307k from {tag:22s}: f32 {t32*1e3:7.3f} ms   "
              f"bf16 {t16*1e3:7.3f} ms")

    # sequentialised gathers inside a while loop (march-shaped)
    src = jax.random.normal(key, (36864 * 512,), jnp.float32)
    idx0 = jax.random.randint(key, (N,), 0, src.shape[0] - 100, jnp.int32)

    def march(src, idx0, steps):
        def body(c):
            i, acc, it = c
            v = src[i]
            return (i + 1, acc + v, it + 1)

        def cond(c):
            return c[2] < steps

        _, acc, _ = jax.lax.while_loop(cond, body,
                                       (idx0, jnp.zeros((N,)), jnp.int32(0)))
        return acc

    for steps in (16, 64):
        f = jax.jit(lambda s, i, st=steps: march(s, i, st))
        t = timeit(f, src, idx0, n=5)
        print(f"while-loop march {steps:3d} steps x 307k gathers: "
              f"{t*1e3:8.2f} ms  ({t/steps*1e3:6.3f} ms/step)")

    # 2D image gather (tracking-shaped): [H,W,C] at [N] pixel indices
    for c in (3, 8):
        img = jax.random.normal(key, (480, 640, c), jnp.float32)
        ry = jax.random.randint(key, (480, 640), 0, 480, jnp.int32)
        rx = jax.random.randint(key, (480, 640), 0, 640, jnp.int32)
        f = jax.jit(lambda im, y, x: im[y, x])
        t = timeit(f, img, ry, rx)
        print(f"image gather [480,640,{c}]: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
