"""Persistent-strips cross-program flow: program A scatters brick rows
into the table (donated, in-place), program B marches (gathers). Checks
per-call cost and whether explicit {0,1} layout forcing helps.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import layout

    CAP = 36864
    M = (CAP + 1) * 64
    key = jax.random.PRNGKey(0)
    from supereight_tpu.utils.loops import lane_select

    table3 = jax.random.normal(key, (CAP + 1, 64, 16),
                               jnp.float32).astype(jnp.bfloat16)
    slots = jax.random.permutation(jax.random.PRNGKey(3), CAP)[:8192] + 1
    vals = jax.random.normal(key, (8192, 64, 16),
                             jnp.float32).astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (307_200,), 0, M,
                             jnp.int32)
    lanes = jax.random.randint(jax.random.PRNGKey(2), (307_200,), 0, 16,
                               jnp.int32)

    A = jax.jit(lambda t3, s, v: t3.at[s].set(v), donate_argnums=0)
    B = jax.jit(lambda t3, i, ln: lane_select(
        t3.reshape(M, 16)[i], ln).astype(jnp.float32).sum())

    t = table3
    t = A(t, slots, vals)
    ms_a = timed(A, t, slots, vals, tag="A")   # NOTE: donates t...
    print(f"A scatter (donated): {ms_a:.3f} ms")
    # timed() calls A twice; t was donated — rebuild
    t = jax.random.normal(key, (CAP + 1, 64, 16),
                          jnp.float32).astype(jnp.bfloat16)
    t = A(t, slots, vals)
    ms_b = timed(B, t, idx, lanes, tag="B")
    print(f"B gather 307k from A-output table: {ms_b:.3f} ms "
          f"({ms_b/307200*1e6:.2f} ns/row)")

    # chained march-like gathers from the A-produced table
    def chain(t3, i, ln):
        tt = t3.reshape(M, 16)
        acc = jnp.zeros((), jnp.float32)
        cur = i
        for _ in range(6):
            v = lane_select(tt[cur], ln).astype(jnp.float32)
            acc = acc + v.sum()
            cur = (cur + v.astype(jnp.int32) + 1) % M
        return acc
    ms = timed(jax.jit(chain), t, idx, lanes, tag="chain")
    print(f"B 6-chained: {ms:.3f} ms ({ms/6/307200*1e6:.2f} ns/row)")

    # forced {0,1} layout variants
    try:
        fmt = layout.Format(layout.Layout(major_to_minor=(1, 0)))
        M16 = (M, 16)
        tab2 = jax.device_put(t.reshape(M16), fmt)
        Bf = jax.jit(lambda tt, i, ln: lane_select(tt[i], ln)
                     .astype(jnp.float32).sum(),
                     in_shardings=(fmt, None, None))
        ms = timed(Bf, tab2, idx, lanes, tag="Bf")
        print(f"B gather, forced colmajor table: {ms:.3f} ms "
              f"({ms/307200*1e6:.2f} ns/row)")
    except Exception as e:
        print(f"layout forcing failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
