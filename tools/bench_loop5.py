"""Trace-timed rolled vs unrolled gather loop (re-check of the r1
'rolled loops = 100x' law, which was measured with lying wall clocks)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 76800
    key = jax.random.PRNGKey(0)

    for mb in (4, 75):
        elems = mb * (1 << 20) // 4
        table = jax.random.normal(key, (elems,), jnp.float32)
        idx0 = jax.random.randint(key, (N,), 0, elems)

        def body(c):
            idx, acc = c
            v = table[idx]
            return ((idx + v.astype(jnp.int32) + 131071) % elems,
                    acc + v)

        def unrolled(idx):
            c = (idx, jnp.zeros((N,), jnp.float32))
            for _ in range(16):
                c = body(c)
            return c[1]

        def rolled(idx):
            c = (idx, jnp.zeros((N,), jnp.float32))
            return lax.fori_loop(0, 16, lambda i, c: body(c), c)[1]

        for name, f in (("unrolled", unrolled), ("rolled", rolled)):
            ms = timed(jax.jit(f), idx0, tag=f"{name}{mb}")
            print(f"table {mb:3d} MB {name:9s} 16 steps: {ms:8.3f} ms "
                  f"({ms/16*1e3:7.1f} us/step)")


if __name__ == "__main__":
    main()
