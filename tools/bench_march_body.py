"""Bisect the real _march stage-0 step body: which piece costs 0.2 ms?

Variants, all 16 unrolled steps over 76800 rays, mirror passed in:
  full      — the real raycast._march inner `one` body (TSDF)
  nodecode  — gather only, no jump/known decode, fixed step
  noint     — full but indices computed in f32 (round) ... etc
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
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    N = 76800
    B = 64
    SIZE = 512
    MIRROR_ELEMS = B * B * B * 512
    key = jax.random.PRNGKey(0)
    mirror = jax.random.uniform(key, (MIRROR_ELEMS,), jnp.float32, -1.0, 3.0)
    k2 = jax.random.PRNGKey(1)
    ox, oy, oz = 2.4, 2.4, 2.4
    dx = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dy = jax.random.uniform(k2, (N,), jnp.float32, -0.5, 0.5)
    dz = -jnp.sqrt(jnp.maximum(1.0 - dx ** 2 - dy ** 2, 0.1))
    tnear = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    tfar = jnp.full((N,), 4.0)
    ivs = SIZE / 4.8
    step = 4.8 / SIZE
    largestep = step * 8
    mu = 0.1
    sent = 2.0
    bstep = largestep

    def sample(mirror, px, py, pz):
        vx = (px * ivs).astype(jnp.int32)
        vy = (py * ivs).astype(jnp.int32)
        vz = (pz * ivs).astype(jnp.int32)
        inb = ((vx >= 0) & (vx < SIZE) & (vy >= 0) & (vy < SIZE)
               & (vz >= 0) & (vz < SIZE))
        vx = jnp.clip(vx, 0, SIZE - 1)
        vy = jnp.clip(vy, 0, SIZE - 1)
        vz = jnp.clip(vz, 0, SIZE - 1)
        cell = ((vx >> 3) * B + (vy >> 3)) * B + (vz >> 3)
        lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
        s = mirror[cell * 512 + lin]
        known = (s < 0.5 * sent) & inb
        dist = jnp.where(known, 0.0, jnp.maximum(s - sent, 0.0))
        dist = jnp.where(inb, dist, 6.0)
        return s, known, dist

    def full_step(c, mirror):
        t, ss, f_t, f_tt, status = c
        mx, known, dist = sample(mirror, ox + dx * t, oy + dy * t,
                                 oz + dz * t)
        active = status == 0
        crossed = mx < 0
        hit = active & known & crossed
        f_tt = jnp.where(active & known, mx, f_tt)
        f_t = jnp.where(active & known & ~hit, mx, f_t)
        known_step = jnp.maximum(f_tt * mu, step)
        jump = jnp.maximum(largestep,
                           jnp.maximum(dist - 1, 0.0) * bstep
                           + 0.5 * largestep)
        new_ss = jnp.where(known, known_step, jump)
        adv = active & ~hit
        ss = jnp.where(adv, new_ss, ss)
        t = jnp.where(adv, t + ss, t)
        status = jnp.where(hit, 1, status)
        status = jnp.where(adv & (t >= tfar), 2, status)
        return t, ss, f_t, f_tt, status

    def lean_step(c, mirror):
        t, ss, f_t, f_tt, status = c
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        vx = jnp.clip((px * ivs).astype(jnp.int32), 0, SIZE - 1)
        vy = jnp.clip((py * ivs).astype(jnp.int32), 0, SIZE - 1)
        vz = jnp.clip((pz * ivs).astype(jnp.int32), 0, SIZE - 1)
        cell = ((vx >> 3) * B + (vy >> 3)) * B + (vz >> 3)
        lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
        mx = mirror[cell * 512 + lin]
        t = t + jnp.where(mx > 0.5, largestep, step)
        f_t = jnp.where(mx < 0, f_t, mx)
        return t, ss, f_t, f_tt, status

    def run(body):
        def f(mirror, t0):
            c = (t0, jnp.full((N,), largestep), jnp.full((N,), jnp.inf),
                 jnp.zeros((N,)), jnp.zeros((N,), jnp.int32))
            for _ in range(16):
                c = body(c, mirror)
            return c
        return jax.jit(f)

    for name, body in (("lean", lean_step), ("full", full_step)):
        ms = timeit(run(body), mirror, tnear)
        print(f"{name:10s} 16 steps: {ms:7.2f} ms  ({ms/16*1000:6.0f} us/step)")


if __name__ == "__main__":
    main()
