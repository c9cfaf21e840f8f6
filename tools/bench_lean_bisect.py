"""Morph the 3us/step minimal gather chain into the 1.3ms/step lean
march step, one feature at a time, to find the slow-path trigger."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10):
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
    B = 64
    SIZE = 512
    ELEMS = B * B * B * 512
    key = jax.random.PRNGKey(0)
    k2 = jax.random.PRNGKey(1)
    mirror = jax.random.uniform(key, (ELEMS,), jnp.float32, -1.0, 3.0)
    dx = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dy = jax.random.uniform(k2, (N,), jnp.float32, -0.5, 0.5)
    dz = -jnp.sqrt(jnp.maximum(1.0 - dx ** 2 - dy ** 2, 0.1))
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    idx0 = jax.random.randint(key, (N,), 0, ELEMS)
    ivs = SIZE / 4.8
    ox = oy = oz = 2.4
    step = 4.8 / SIZE

    def v0(mirror, idx, t):
        """baseline: int chain"""
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            v = mirror[idx]
            acc = acc + v
            idx = (idx + (v > 0) + 7) & (ELEMS - 1) if (ELEMS & (ELEMS-1)) == 0 \
                else (idx + (v > 0) + 7) % ELEMS
        return acc

    def v1(mirror, idx, t):
        """float t carry -> index via single multiply + astype"""
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            i = jnp.clip((t * (ELEMS / 8.0)).astype(jnp.int32), 0, ELEMS - 1)
            v = mirror[i]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, step)
        return acc

    def v2(mirror, idx, t):
        """3 float coords -> voxel ints -> cell/lin split index"""
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
            vx = jnp.clip((px * ivs).astype(jnp.int32), 0, SIZE - 1)
            vy = jnp.clip((py * ivs).astype(jnp.int32), 0, SIZE - 1)
            vz = jnp.clip((pz * ivs).astype(jnp.int32), 0, SIZE - 1)
            cell = ((vx >> 3) * B + (vy >> 3)) * B + (vz >> 3)
            lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
            v = mirror[cell * 512 + lin]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, step)
        return acc

    def v3(mirror, idx, t):
        """v2 without the cell/lin split: plain x+y*S+z*S^2 flat index"""
        acc = jnp.zeros((N,), jnp.float32)
        for _ in range(16):
            px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
            vx = jnp.clip((px * ivs).astype(jnp.int32), 0, SIZE - 1)
            vy = jnp.clip((py * ivs).astype(jnp.int32), 0, SIZE - 1)
            vz = jnp.clip((pz * ivs).astype(jnp.int32), 0, SIZE - 1)
            v = mirror[(vx * SIZE + vy) * SIZE + vz]
            acc = acc + v
            t = t + jnp.where(v > 0, 0.075, step)
        return acc

    for name, f in (("v0 int chain", v0), ("v1 one-mul idx", v1),
                    ("v3 xyz flat idx", v3), ("v2 cell/lin idx", v2)):
        ms = timeit(jax.jit(f), mirror, idx0, t0v)
        print(f"{name:18s} 16 steps: {ms:8.2f} ms ({ms/16*1000:7.0f} us/step)")


if __name__ == "__main__":
    main()
