"""Does flat-gather cost depend on TABLE size? 16 unrolled dependent
gathers of 76800 indices from tables of increasing size."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    N = 76800
    key = jax.random.PRNGKey(0)

    for elems in (1 << 18, 1 << 22, 1 << 24, 36864 * 512, 1 << 26, 1 << 27):
        table = jax.random.normal(key, (elems,), jnp.float32)
        idx0 = jax.random.randint(key, (N,), 0, elems)

        @jax.jit
        def run(table, idx):
            acc = jnp.zeros((N,), jnp.float32)
            for _ in range(16):
                v = table[idx]
                acc = acc + v
                # dependent next index (like a march step)
                idx = (idx + (v > 0) + 7) % elems
            return acc

        out = run(table, idx0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = run(table, idx0)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        mb = elems * 4 / 1e6
        print(f"table {mb:8.1f} MB: 16 gathers of {N} -> {ms:7.2f} ms "
              f"({ms/16*1000:6.0f} us/gather)")


if __name__ == "__main__":
    main()
