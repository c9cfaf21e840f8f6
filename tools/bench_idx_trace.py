"""Re-measure fast/slow gather-loop variants with xplane device traces
(wall clock lies under the axon remote runtime)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    N = 76800
    S = 512
    ELEMS = S ** 3
    key = jax.random.PRNGKey(0)
    k2, k3 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    mirror = jax.random.uniform(key, (ELEMS,), jnp.float32, -1.0, 3.0)
    dx = jax.random.uniform(key, (N,), jnp.float32, -0.5, 0.5)
    dy = jax.random.uniform(k2, (N,), jnp.float32, -0.5, 0.5)
    dz = jax.random.uniform(k3, (N,), jnp.float32, -0.5, 0.5)

    def ci(a):
        return jnp.clip(a.astype(jnp.int32), 0, S - 1)

    def walk(array_step):
        def f(mirror, dx, dy, dz):
            x, y, z = 100.0 + dx, 200.0 + dy, 300.0 + dz
            acc = jnp.zeros((N,), jnp.float32)
            for _ in range(16):
                v = mirror[(ci(x) * S + ci(y)) * S + ci(z)]
                acc = acc + v
                if array_step:
                    st = jnp.where(v > 0, 8.0, 1.0)
                    x = x + dx * st
                    y = y + dy * st
                    z = z + dz * st
                else:
                    x = x + jnp.where(v > 0, 8.0, 1.0)
                    y = y + jnp.where(v > 0, 8.0, 1.0)
                    z = z + jnp.where(v > 0, 8.0, 1.0)
            return acc
        return jax.jit(f)

    for name, arr in (("fast_const", False), ("slow_array", True)):
        ms = timed(walk(arr), mirror, dx, dy, dz, tag=name)
        print(f"{name}: {ms:.3f} ms device ({ms/16*1000:.0f} us/step)")


if __name__ == "__main__":
    main()
