"""Op-level trace of the two hottest stages (integration, primed march,
strips build) at the bench config: prints the top device ops per stage.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


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
    m_state = state.map
    for i in range(5):
        p = jnp.asarray(poses[i], jnp.float32)
        d = jnp.asarray(depths[i])
        m_state = allocation.allocate_tsdf(geom, m_state, d, p, kj, 0.1)
        m_state = integration.integrate(geom, m_state, field, d, p,
                                        kj, 0.1, i / 30.0, (W, H))
    jax.block_until_ready(m_state)
    print(f"warm blocks: {int(m_state.n_blocks)}", file=sys.stderr)
    depth = jnp.asarray(depths[5])
    pose = jnp.asarray(poses[5], jnp.float32)

    def integ(ms_, d, p, kk):
        return integration.integrate(geom, ms_, field, d, p, kk, 0.1, 0.2,
                                     (W, H))
    print("== integration ==")
    ms = timed(jax.jit(integ), m_state, depth, pose, kj,
               tag="integ", verbose=True)
    print(f"total {ms:.2f} ms")

    view = jnp.matmul(pose, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    nav = jax.jit(functools.partial(raycast.build_nav, geom))(m_state)
    strips = jax.jit(functools.partial(raycast.build_strips, geom,
                                       field=field))(m_state)

    print("== strips build ==")
    ms = timed(jax.jit(functools.partial(raycast.build_strips, geom,
                                         field=field)), m_state,
               tag="strips", verbose=True)
    print(f"total {ms:.2f} ms")

    dxi, dyi, dzi = raycast.ray_directions_c(view, W, H)
    dx, dy, dz = dxi.reshape(-1), dyi.reshape(-1), dzi.reshape(-1)
    origin = view[:3, 3]
    tnear, tfar = raycast.ray_box_range_c(origin, dx, dy, dz, geom.dim)
    prime = raycast.prime_from_depth(depth, kj)
    marp = jax.jit(lambda o, a, b, c, tn, tf, nv_, st_, pt: raycast._march(
        geom, m_state, field, o, a, b, c, tn, tf, 0.1, geom.voxel_size,
        geom.voxel_size * 8, 2 * geom.size, nav=nv_, strips=st_,
        prime_t=pt))
    print("== march primed ==")
    ms = timed(marp, origin, dx, dy, dz, tnear, tfar, nav, strips, prime,
               tag="marchp", verbose=True)
    print(f"total {ms:.2f} ms")


if __name__ == "__main__":
    main()
