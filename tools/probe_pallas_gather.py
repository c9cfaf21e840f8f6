import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

def try_form(name, build):
    try:
        out, expect = build()
        ok = np.allclose(np.asarray(out), expect)
        print(f"{name}: OK match={ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

# form A: take(table2d [R,128], idx1d [N], axis=0) -> [N,128] row gather
def formA():
    R, N = 512, 256
    t = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    i = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    def k(tr, ir, o):
        o[:] = jnp.take(tr[:], ir[:], axis=0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
    return out, np.asarray(t)[np.asarray(i)]

# form B: take_along_axis(table [R,128], idx [N,128], axis=0)
def formB():
    R, N = 512, 256
    t = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    i = jnp.asarray(rng.integers(0, R, (N, 128)), jnp.int32)
    def k(tr, ir, o):
        o[:] = jnp.take_along_axis(tr[:], ir[:], axis=0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
    e = np.take_along_axis(np.asarray(t), np.asarray(i), axis=0)
    return out, e

# form C: take_along_axis along axis=1 (within-row gather)
def formC():
    N, C = 256, 512
    t = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
    i = jnp.asarray(rng.integers(0, C, (N, 128)), jnp.int32)
    def k(tr, ir, o):
        o[:] = jnp.take_along_axis(tr[:], ir[:], axis=1)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
    e = np.take_along_axis(np.asarray(t), np.asarray(i), axis=1)
    return out, e

# form D: dynamic scalar-loop gather via pl.ds (per-row dynamic slice in fori)
def formD():
    R, N = 512, 64
    t = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    i = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    def k(tr, ir, o):
        def body(n, _):
            o[n, :] = tr[ir[n], :]
            return 0
        jax.lax.fori_loop(0, N, body, 0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
    return out, np.asarray(t)[np.asarray(i)]

try_form("A take axis0 row-gather", formA)
try_form("B take_along_axis axis0", formB)
try_form("C take_along_axis axis1", formC)
try_form("D fori dynamic row slice", formD)
