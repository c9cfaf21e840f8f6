"""Measure the persistent-strips design pieces at bench scale:

1. 16-lane row gather from a [M, 16] bf16 table passed as INPUT
   (persistent table) vs built in-program (pays the {1,0}->{0,1} copy).
2. Row-block scatter: update 8192 bricks' [64, 16] rows in the table.
3. Scatter -> gather chain in ONE program (does XLA insert copies?).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    CAP = 36864
    M = (CAP + 1) * 64
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (M, 16), jnp.float32).astype(jnp.bfloat16)
    table3 = table.reshape(CAP + 1, 64, 16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (307_200,), 0, M,
                             jnp.int32)

    from supereight_tpu.utils.loops import lane_select
    lanes = jax.random.randint(jax.random.PRNGKey(2), (307_200,), 0, 16,
                               jnp.int32)

    def g(t, i, ln):
        return lane_select(t[i], ln)
    ms = timed(jax.jit(g), table, idx, lanes, tag="g16in")
    print(f"gather 307k x 16-lane rows (input table): {ms:.3f} ms "
          f"({ms/307200*1e6:.2f} ns/row)")

    # 6-step chained gathers (march-like dependency)
    def chain(t, i, ln):
        acc = jnp.zeros((), jnp.float32)
        cur = i
        for _ in range(6):
            v = lane_select(t[cur], ln).astype(jnp.float32)
            acc = acc + v.sum()
            cur = (cur + v.astype(jnp.int32) + 1) % M
        return acc
    ms = timed(jax.jit(chain), table, idx, lanes, tag="g16chain")
    print(f"6-step chained gathers: {ms:.3f} ms ({ms/6/307200*1e6:.2f} "
          f"ns/row)")

    # scatter 8192 row-blocks of [64, 16]
    slots = jax.random.permutation(jax.random.PRNGKey(3), CAP)[:8192] + 1
    vals = jax.random.normal(key, (8192, 64, 16),
                             jnp.float32).astype(jnp.bfloat16)

    def sc(t3, s, v):
        return t3.at[s].set(v)
    ms = timed(jax.jit(sc), table3, slots, vals, tag="sc8k")
    print(f"scatter 8192 x [64,16] brick rows: {ms:.3f} ms")

    # lanes 8-15 only (right-half update)
    def sc_half(t3, s, v):
        return t3.at[s, :, 8:16].set(v[:, :, 8:])
    ms = timed(jax.jit(sc_half), table3, slots, vals, tag="sch8k")
    print(f"scatter 8192 x [64,8] right-half rows: {ms:.3f} ms")

    # scatter -> gather in one program
    def both(t3, s, v, i, ln):
        t2 = t3.at[s].set(v).reshape(M, 16)
        return lane_select(t2[i], ln).sum()
    ms = timed(jax.jit(both), table3, slots, vals, idx, lanes, tag="sg")
    print(f"scatter+gather one program: {ms:.3f} ms")

    # the [CAP,512] -> [M,16] interleave IN program, for reference
    data = jax.random.normal(key, (CAP, 512), jnp.float32)

    def build(d):
        v = d.astype(jnp.bfloat16)
        v = jnp.concatenate([jnp.zeros((1, 512), jnp.bfloat16), v])
        left = v.reshape(CAP + 1, 64, 8)
        right = jnp.roll(left, -1, axis=0)
        t = jnp.concatenate([left, right], -1).reshape(M, 16)
        return lane_select(t[idx], lanes).sum()
    ms = timed(jax.jit(build), data, tag="build")
    print(f"in-program build + gather (reference): {ms:.3f} ms")

    # wide row gather: neighbour data fetch [8192] x 2KB rows
    rid = jax.random.randint(jax.random.PRNGKey(5), (8192,), 0, CAP,
                             jnp.int32)

    def wg(d, r):
        return d[r] * 2.0
    ms = timed(jax.jit(wg), data, rid, tag="wg")
    print(f"gather 8192 x 2KB rows: {ms:.3f} ms")


if __name__ == "__main__":
    main()
