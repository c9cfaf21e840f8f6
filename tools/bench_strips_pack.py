"""Does packing 8 logical 16-lane rows into one physical 128-lane row
make march probes faster? The [524k, 16] bf16 table pads 16->128 lanes
(134 MB physical, at the fast-gather boundary); the packed [65k, 128]
form is 16.8 MB with a 3-step group tree to peel the 16-lane slice."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    N_ROWS = 8193 * 64            # bucket-8192 strips table height
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (N_ROWS * 16,), jnp.float32)
    tab16 = flat.astype(jnp.bfloat16).reshape(N_ROWS, 16)
    tab128 = flat.astype(jnp.bfloat16).reshape(N_ROWS // 8, 128)

    def group16(row, g):
        # row [n, 128] -> [n, 16] slice number g (0-7), log2 tree
        r = row.reshape(row.shape[0], 8, 16)
        w = 8
        while w > 1:
            h = w // 2
            hi = (g & h) != 0
            r = jnp.where(hi[:, None, None], r[:, h:w], r[:, :h])
            w = h
        return r[:, 0, :]

    for n in (76_800, 307_200):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, N_ROWS,
                                 jnp.int32)

        f16 = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32),
                                           axis=-1))
        ms = timed(f16, tab16, idx, tag=f"p16_{n}")
        print(f"[{n}] 16-lane rows:  {ms:7.3f} ms ({ms/n*1e6:5.2f} ns/row)")

        fp = jax.jit(lambda t, i: jnp.sum(
            group16(t[i >> 3], i & 7).astype(jnp.float32), axis=-1))
        ms = timed(fp, tab128, idx, tag=f"p128_{n}")
        print(f"[{n}] packed rows:   {ms:7.3f} ms ({ms/n*1e6:5.2f} ns/row)")

        a, b = f16(tab16, idx), fp(tab128, idx)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"[{n}] equal ok")


if __name__ == "__main__":
    main()
