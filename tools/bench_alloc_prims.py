"""Cost of allocation-primitive candidates on TPU: dense cumsum,
big mostly-dropped scatter, top_k compaction, sort, small scatter."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from tools.trace_time import timed


def timeit(fn, *args):
    return timed(fn, *args, tag="alloc")


def main():
    import jax
    import jax.numpy as jnp

    G = 64 * 64 * 64          # block grid cells
    K = 8192                  # alloc budget
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (G,)) < 0.01   # ~2600 new cells
    ids = jnp.arange(G, dtype=jnp.int32)

    def c_cumsum(m):
        return jnp.cumsum(m.astype(jnp.int32))

    def c_big_scatter(m):
        order = jnp.cumsum(m.astype(jnp.int32)) - 1
        dest = jnp.where(m & (order < K), order, K)
        return jnp.zeros((K,), jnp.int32).at[dest].set(ids, mode="drop")

    def c_topk(m):
        keyv = jnp.where(m, 2 * G - ids, 0)
        vals, cells = jax.lax.top_k(keyv, K)
        return cells

    def c_sort(m):
        keyv = jnp.where(m, ids, G + ids)
        return jax.lax.sort(keyv)

    def c_small_scatter(m):
        cells = ids[:K]
        return jnp.zeros((G,), jnp.int32).at[cells].set(1, mode="drop")

    def c_scatter_19k(m):
        n = 19200 * 11
        idx = jax.random.randint(key, (n,), 0, G)
        return jnp.zeros((G,), bool).at[idx].set(True)

    for name, f in (("cumsum 262k", c_cumsum),
                    ("scatter 262k->8k", c_big_scatter),
                    ("top_k 262k,8k", c_topk),
                    ("sort 262k", c_sort),
                    ("scatter 8k->262k", c_small_scatter),
                    ("scatter 211k bool", c_scatter_19k)):
        ms = timeit(jax.jit(f), mask)
        print(f"{name:18s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
