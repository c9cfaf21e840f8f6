"""Bisect the real march body: which piece costs 3 ms/step?

Reconstructs the _march_tsdf inner step on a realistic synthetic map
(shell of allocated blocks) and toggles parts off one at a time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=5):
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
    import numpy as np

    B, CAP, N, STEPS = 64, 36864, 640 * 480, 32
    key = jax.random.PRNGKey(0)

    # shell of allocated blocks (sphere surface), like a warmed map
    g = np.arange(B)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((X - 32.0) ** 2 + (Y - 32.0) ** 2 + (Z - 32.0) ** 2)
    occ = np.abs(r - 20.0) < 2.0
    n_alloc = int(occ.sum())
    slot_np = np.full((B, B, B), -1, np.int32)
    slot_np[occ] = np.arange(n_alloc, dtype=np.int32)
    print(f"allocated blocks: {n_alloc}", file=sys.stderr)

    jump_np = np.where(occ, slot_np, -(1 + np.minimum(6, 3))).reshape(-1)
    jump_flat = jnp.asarray(jump_np, jnp.int32)
    march_flat = jax.random.normal(key, (CAP * 512,), jnp.float32)
    # sprinkle unknowns (inf) like weight-0 voxels
    mask = jax.random.uniform(key, (CAP * 512,)) < 0.3
    march_inf = jnp.where(mask, jnp.inf, march_flat)

    ox, oy, oz = 3.0, 3.0, 3.0
    dxa = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dya = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32,
                             -0.5, 0.5)
    dza = -jnp.sqrt(jnp.maximum(1.0 - dxa ** 2 - dya ** 2, 0.1))
    t0v = jax.random.uniform(key, (N,), jnp.float32, 0.4, 1.0)
    ivs = 512 / 4.8
    vs = 4.8 / 512

    def march(t, *, mf, grid_gather=True, pool_gather=True, carries=True,
              use_inf=True):
        ss = jnp.full((N,), 0.075)
        f_t = jnp.full((N,), jnp.inf)
        f_tt = jnp.zeros((N,))
        status = jnp.zeros((N,), jnp.int32)
        for _ in range(STEPS):
            px = ox + dxa * t
            py = oy + dya * t
            pz = oz + dza * t
            vx = jnp.clip((px * ivs).astype(jnp.int32), 0, 511)
            vy = jnp.clip((py * ivs).astype(jnp.int32), 0, 511)
            vz = jnp.clip((pz * ivs).astype(jnp.int32), 0, 511)
            if grid_gather:
                mt = jump_flat[((vx >> 3) * B + (vy >> 3)) * B + (vz >> 3)]
            else:
                mt = (vx * 0) + 5
            lin = (vx & 7) + ((vy & 7) << 3) + ((vz & 7) << 6)
            if pool_gather:
                mx = mf[jnp.maximum(mt, 0) * 512 + lin]
            else:
                mx = px * 0.1
            known = (mt >= 0) & (~jnp.isinf(mx) if use_inf else (mx < 1e30))
            dist = jnp.where(mt < 0, (-1 - mt).astype(jnp.float32), 0.0)
            if carries:
                active = status == 0
                hit = active & known & (mx < 0)
                f_tt = jnp.where(active & known, mx, f_tt)
                f_t = jnp.where(active & known & ~hit, mx, f_t)
                jump = jnp.maximum(0.075,
                                   jnp.maximum(dist - 1, 0.0) * 0.075
                                   + 0.037)
                new_ss = jnp.where(known, jnp.maximum(f_tt * 0.1, vs), jump)
                adv = active & ~hit
                ss = jnp.where(adv, new_ss, ss)
                t = jnp.where(adv, t + ss, t)
                status = jnp.where(hit, 1, status)
                status = jnp.where(adv & (t >= 4.0), 2, status)
            else:
                t = t + 0.01 + 1e-9 * mx + 1e-9 * dist
        return t, ss, f_t, f_tt, status

    variants = [
        ("full body", dict(mf=march_inf)),
        ("no grid gather", dict(mf=march_inf, grid_gather=False)),
        ("no pool gather", dict(mf=march_inf, pool_gather=False)),
        ("no carries", dict(mf=march_inf, carries=False)),
        ("no inf in field", dict(mf=march_flat, use_inf=False)),
        ("gathers only", dict(mf=march_inf, carries=False)),
    ]
    for name, kw in variants:
        f = jax.jit(lambda t, kw=kw: march(t, **kw))
        print(f"{name:18s} {timeit(f, t0v)/STEPS*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
