"""REAL (trace-timed) gather cost vs table size and index count.
Round-1's wall-clock numbers were axon-dedup mirages; trust only these.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    print("== 16 chained gathers of 76800 idx, table size sweep ==")
    N = 76800
    for mb in (1, 4, 16, 32, 64, 96, 128, 192, 320, 512):
        elems = mb * (1 << 20) // 4
        table = jax.random.normal(key, (elems,), jnp.float32)
        idx0 = jax.random.randint(key, (N,), 0, elems)

        def run(table, idx):
            acc = jnp.zeros((N,), jnp.float32)
            for _ in range(16):
                v = table[idx]
                acc = acc + v
                idx = (idx + v.astype(jnp.int32) + 131071) % elems
            return acc

        ms = timed(jax.jit(run), table, idx0, tag=f"g{mb}")
        print(f"  table {mb:4d} MB: {ms:8.3f} ms ({ms/16*1e6:8.0f} ns/gather,"
              f" {ms/16/N*1e6:6.1f} ns/elem)")

    print("== single gather, 4.2M idx from small table ==")
    for mb, n in ((0.3, 4_200_000), (75, 4_200_000)):
        elems = int(mb * (1 << 20) // 4)
        table = jax.random.normal(key, (elems,), jnp.float32)
        idx = jax.random.randint(key, (n,), 0, elems)

        def run1(table, idx):
            return table[idx].sum()

        ms = timed(jax.jit(run1), table, idx, tag=f"s{mb}")
        print(f"  table {mb:6.1f} MB, {n} idx: {ms:8.3f} ms"
              f" ({ms/n*1e6:6.2f} ns/elem)")

    print("== row gathers: 76800 rows of W f32, 75MB table ==")
    for w in (1, 8, 16, 32):
        rows = 75 * (1 << 20) // 4 // w
        table = jax.random.normal(key, (rows, w), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, rows)

        def runr(table, idx):
            return table[idx].sum()

        ms = timed(jax.jit(runr), table, idx, tag=f"r{w}")
        print(f"  rows of {w:3d}: {ms:8.3f} ms ({ms/N*1e6:6.1f} ns/row)")


if __name__ == "__main__":
    main()
