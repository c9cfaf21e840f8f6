"""Round 3: confirm trigger (array-coeff step) and test
optimization_barrier as the fix."""

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
    from jax import lax

    N = 76800
    S = 512
    ELEMS = S ** 3
    key = jax.random.PRNGKey(0)
    k2, k3 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    mirror = jax.random.uniform(key, (ELEMS,), jnp.float32, -1.0, 3.0)
    dx = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dy = jax.random.uniform(k2, (N,), jnp.float32, -0.5, 0.5)
    dz = jax.random.uniform(k3, (N,), jnp.float32, -0.5, 0.5)
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)

    def ci(a):
        return jnp.clip(a.astype(jnp.int32), 0, S - 1)

    iv = S / 4.8

    def f_ray(mirror, t):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[(ci((2.4 + dx * t) * iv) * S
                        + ci((2.4 + dy * t) * iv)) * S
                       + ci((2.4 + dz * t) * iv)]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, 0.009375)
        return acc

    def f_ray_barrier_idx(mirror, t):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            i = (ci((2.4 + dx * t) * iv) * S
                 + ci((2.4 + dy * t) * iv)) * S + ci((2.4 + dz * t) * iv)
            i = lax.optimization_barrier(i)
            v = mirror[i]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, 0.009375)
        return acc

    def f_ray_barrier_t(mirror, t):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            t = lax.optimization_barrier(t)
            v = mirror[(ci((2.4 + dx * t) * iv) * S
                        + ci((2.4 + dy * t) * iv)) * S
                       + ci((2.4 + dz * t) * iv)]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, 0.009375)
        return acc

    def f_ray_barrier_v(mirror, t):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[(ci((2.4 + dx * t) * iv) * S
                        + ci((2.4 + dy * t) * iv)) * S
                       + ci((2.4 + dz * t) * iv)]
            v = lax.optimization_barrier(v)
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, 0.009375)
        return acc

    def f_3vary_arraystep(mirror, t):
        x, y, z = 100.0 + dx, 200.0 + dy, 300.0 + dz
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[(ci(x) * S + ci(y)) * S + ci(z)]
            acc = acc + v
            st = jnp.where(v > 0, 8.0, 1.0)
            x = x + dx * st
            y = y + dy * st
            z = z + dz * st
        return acc

    for name, f in (("ray plain", f_ray),
                    ("ray barrier idx", f_ray_barrier_idx),
                    ("ray barrier t", f_ray_barrier_t),
                    ("ray barrier v", f_ray_barrier_v),
                    ("walk array-step", f_3vary_arraystep)):
        ms = timeit(jax.jit(f), mirror, t0v)
        print(f"{name:16s} 16 steps: {ms:8.2f} ms ({ms/16*1000:7.0f} us/step)")


if __name__ == "__main__":
    main()
