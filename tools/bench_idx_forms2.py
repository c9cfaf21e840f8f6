"""Round 2: is the slow-gather trigger 3 VARYING index streams?"""

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
    S = 512
    ELEMS = S ** 3
    key = jax.random.PRNGKey(0)
    k2, k3 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    mirror = jax.random.uniform(key, (ELEMS,), jnp.float32, -1.0, 3.0)
    fx = jax.random.uniform(key, (N,), jnp.float32, 0.0, 511.0)
    fy = jax.random.uniform(k2, (N,), jnp.float32, 0.0, 511.0)
    fz = jax.random.uniform(k3, (N,), jnp.float32, 0.0, 511.0)
    dx = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dy = jax.random.uniform(k2, (N,), jnp.float32, -0.5, 0.5)
    dz = jax.random.uniform(k3, (N,), jnp.float32, -0.5, 0.5)
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)

    def ci(a):
        return jnp.clip(a.astype(jnp.int32), 0, S - 1)

    def f_2vary(mirror, x, y, z):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[(ci(x) * S + ci(y)) * S + ci(z)]
            acc = acc + v
            x = x + jnp.where(v > 0, 1.0, -1.0)
            y = y + jnp.where(v > 0, -1.0, 1.0)
        return acc

    def f_3vary(mirror, x, y, z):
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[(ci(x) * S + ci(y)) * S + ci(z)]
            acc = acc + v
            x = x + jnp.where(v > 0, 1.0, -1.0)
            y = y + jnp.where(v > 0, -1.0, 1.0)
            z = z + jnp.where(v > 0, 1.0, 2.0)
        return acc

    def f_ray(mirror, x, y, z):
        t = t0v
        acc = jnp.zeros((N,), jnp.float32)
        iv = S / 4.8
        for _ in range(16):
            v = mirror[(ci((2.4 + dx * t) * iv) * S
                        + ci((2.4 + dy * t) * iv)) * S
                       + ci((2.4 + dz * t) * iv)]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, 0.009375)
        return acc

    def f_ray_carrypos(mirror, x, y, z):
        px, py, pz = 2.4 + dx * t0v, 2.4 + dy * t0v, 2.4 + dz * t0v
        acc = jnp.zeros((N,), jnp.float32)
        iv = S / 4.8
        for _ in range(16):
            v = mirror[(ci(px * iv) * S + ci(py * iv)) * S + ci(pz * iv)]
            acc = acc + v
            ss = jnp.where(v > 0, 0.075, 0.009375)
            px = px + dx * ss
            py = py + dy * ss
            pz = pz + dz * ss
        return acc

    for name, f in (("2 varying", f_2vary), ("3 varying", f_3vary),
                    ("ray t-carry", f_ray), ("ray pos-carry", f_ray_carrypos)):
        ms = timeit(jax.jit(f), mirror, fx, fy, fz)
        print(f"{name:14s} 16 steps: {ms:8.2f} ms ({ms/16*1000:7.0f} us/step)")


if __name__ == "__main__":
    main()
