"""Bisect the raycast cascade: stage0 vs substage vs rolled tail cost
at the bench config (320x240, warm synthetic map)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration, raycast
    from supereight_tpu.parallel import step as pstep

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)

    depths, poses = synthetic.orbit_sequence(
        8, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])

    # warm the map with a few gt-pose integrations
    m = state.map
    for i in range(6):
        d = jnp.asarray(depths[i])
        p = jnp.asarray(poses[i], jnp.float32)
        m = allocation.allocate_tsdf(geom, m, d, p, kj, 0.1)
        m = integration.integrate(geom, m, field, d, p, kj, 0.1,
                                  0.0, (W, H))
    jax.block_until_ready(m)
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr)

    view = jnp.matmul(jnp.asarray(poses[6], jnp.float32),
                      se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    prime = raycast.prime_from_depth(jnp.asarray(depths[6]), kj)

    rc = functools.partial(raycast.raycast, geom, m, field, view, 0.1,
                           (W, H))
    for ms in (16, 64, 256, 1024):
        t = timeit(rc, max_steps=ms)
        print(f"raycast max_steps={ms:5d}        {t:8.2f} ms")
    for ms in (16, 64, 1024):
        t = timeit(rc, max_steps=ms, prime_t=prime)
        print(f"raycast max_steps={ms:5d} primed {t:8.2f} ms")


if __name__ == "__main__":
    main()
