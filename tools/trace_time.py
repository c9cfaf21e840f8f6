"""Trace-based device timing: run a jitted fn under jax.profiler.trace
and report the summed device-op duration (host/python events excluded).

Wall-clock timing of small programs is unreliable under the axon remote
runtime (repeated identical executions appear to be deduplicated); the
xplane trace durations match reality.
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# persistent XLA cache: dev tools recompile the same programs constantly
from supereight_tpu.utils import compilecache  # noqa: E402
compilecache.enable()

_SKIP_PREFIX = ("$", "Pjit", "PJRT", "Parse", "Python", "jit_", "pmap",
                "Xla", "Thunk", "copy", "infeed", "outfeed", "tuple")
_SKIP_CATS = {"host"}


def device_ms(trace_dir):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    d = json.load(gzip.open(files[-1]))
    total_us = 0.0
    ops = []
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith(_SKIP_PREFIX):
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args:
            continue
        us = float(args["device_duration_ps"]) / 1e6
        total_us += us
        ops.append((us, name))
    ops.sort(reverse=True)
    return total_us / 1000.0, ops[:8]


def timed(fn, *args, tag="op", verbose=False):
    """Run fn once (after one warmup) under a fresh trace; return ms."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/jtt_{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    ms, ops = device_ms(trace_dir)
    if verbose:
        for us, name in ops:
            print(f"    {us/1000:9.3f} ms  {name[:70]}")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    SRC = 36864 * 512
    src = jax.random.normal(key, (SRC,), jnp.float32)

    print("--- gather from 75MB, random idx ---")
    for n in (76_800, 307_200, 1_228_800, 4_915_200):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, SRC,
                                 jnp.int32)
        f = jax.jit(lambda s, i: s[i] * 2.0)
        ms = timed(f, src, idx, tag=f"g{n}")
        print(f"gather N={n:8d}: {ms:8.3f} ms   ({ms/n*1e6:6.2f} ns/row)")

    print("--- wide-row gather [N] x 512 f32 rows ---")
    src2d = src.reshape(36864, 512)
    for n in (6144, 16384):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, 36864,
                                 jnp.int32)
        f = jax.jit(lambda s, i: s[i] * 2.0)
        print(f"rowgather N={n:6d}x2KB: {timed(f, src2d, idx, tag=f'rg{n}'):8.3f} ms")

    print("--- gather [N] x 8 f32 rows (32B) ---")
    src8 = src.reshape(-1, 8)
    for n in (307_200, 1_228_800):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0,
                                 SRC // 8, jnp.int32)
        f = jax.jit(lambda s, i: s[i] * 2.0)
        print(f"row8gather N={n:8d}: {timed(f, src8, idx, tag=f'r8{n}'):8.3f} ms")

    print("--- scatter ---")
    img = jnp.full((307_200,), 1e9, jnp.float32)
    for n in (307_200, 1_228_800, 4_915_200):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, 307_200,
                                 jnp.int32)
        val = jax.random.uniform(key, (n,), jnp.float32)
        f = jax.jit(lambda im, i, v: im.at[i].min(v))
        ms = timed(f, img, idx, val, tag=f"sm{n}")
        print(f"scatter-min N={n:8d}: {ms:8.3f} ms   ({ms/n*1e6:6.2f} ns/row)")

    bgrid = jnp.zeros((64 * 64 * 64 + 1,), bool)
    for n in (211_200, 844_800):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0,
                                 64 ** 3, jnp.int32)
        f = jax.jit(lambda g, i: g.at[i].set(True))
        ms = timed(f, bgrid, idx, tag=f"sb{n}")
        print(f"scatter-bool N={n:8d}: {ms:8.3f} ms   ({ms/n*1e6:6.2f} ns/row)")

    print("--- row scatter-set [n]x512 into pool ---")
    for n in (6144, 16384):
        idx = jax.random.permutation(jax.random.PRNGKey(3), 36864)[:n]
        val = jax.random.uniform(key, (n, 512), jnp.float32)
        f = jax.jit(lambda p, i, v: p.at[i].set(v))
        print(f"rowscatter N={n:6d}x2KB: {timed(f, src2d, idx, val, tag=f'rs{n}'):8.3f} ms")

    print("--- sort ---")
    for n in (1_000_000, 4_000_000, 9_000_000):
        keys = jax.random.randint(jax.random.PRNGKey(n), (n,), 0,
                                  2 ** 31 - 1, jnp.int32)
        vals = jax.random.uniform(key, (n,), jnp.float32)
        f = jax.jit(lambda kk, vv: jax.lax.sort_key_val(kk, vv))
        ms = timed(f, keys, vals, tag=f"s{n}")
        print(f"sort_kv N={n:8d}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
