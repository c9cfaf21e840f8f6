"""Which index construction de-optimizes the TPU gather?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 10 * 1e3


def main():
    import jax
    import jax.numpy as jnp

    N = 76800
    SIZE = 512
    ELEMS = SIZE ** 3
    key = jax.random.PRNGKey(0)
    k2, k3 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    mirror = jax.random.uniform(key, (ELEMS,), jnp.float32, -1.0, 3.0)
    fx = jax.random.uniform(key, (N,), jnp.float32, 0.0, 511.0)
    fy = jax.random.uniform(k2, (N,), jnp.float32, 0.0, 511.0)
    fz = jax.random.uniform(k3, (N,), jnp.float32, 0.0, 511.0)

    def loop(idx_fn):
        def f(mirror, fx, fy, fz):
            acc = jnp.zeros((N,), jnp.float32)
            x, y, z = fx, fy, fz
            for _ in range(16):
                i = idx_fn(x, y, z)
                v = mirror[i]
                acc = acc + v
                x = x + jnp.where(v > 0, 1.0, -1.0)
            return acc
        return jax.jit(f)

    S = SIZE

    cases = {
        "1stream mul":  lambda x, y, z: jnp.clip(
            (x * (ELEMS / 512.0)).astype(jnp.int32), 0, ELEMS - 1),
        "2stream":      lambda x, y, z: (
            jnp.clip(x.astype(jnp.int32), 0, S - 1) * S
            + jnp.clip(y.astype(jnp.int32), 0, S - 1)),
        "3stream add":  lambda x, y, z: (
            jnp.clip(x.astype(jnp.int32), 0, S - 1)
            + jnp.clip(y.astype(jnp.int32), 0, S - 1)
            + jnp.clip(z.astype(jnp.int32), 0, S - 1)),
        "3stream mul":  lambda x, y, z: (
            (jnp.clip(x.astype(jnp.int32), 0, S - 1) * S
             + jnp.clip(y.astype(jnp.int32), 0, S - 1)) * S
            + jnp.clip(z.astype(jnp.int32), 0, S - 1)),
        "3stream shift": lambda x, y, z: (
            (jnp.clip(x.astype(jnp.int32), 0, S - 1) << 18)
            | (jnp.clip(y.astype(jnp.int32), 0, S - 1) << 9)
            | jnp.clip(z.astype(jnp.int32), 0, S - 1)),
        "3in float comb": lambda x, y, z: jnp.clip(
            (jnp.floor(x) * (S * S) + jnp.floor(y) * S
             + jnp.floor(z)).astype(jnp.int32), 0, ELEMS - 1),
        "2stream f32mul": lambda x, y, z: jnp.clip(
            (jnp.floor(x) * S + jnp.floor(y)).astype(jnp.int32),
            0, ELEMS - 1),
    }
    for name, fn in cases.items():
        ms = timeit(loop(fn), mirror, fx, fy, fz)
        print(f"{name:16s} 16 steps: {ms:8.2f} ms ({ms/16*1000:7.0f} us/step)")


if __name__ == "__main__":
    main()
