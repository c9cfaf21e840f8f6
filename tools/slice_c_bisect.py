"""Bisect the OF raycast's in-program 2x blowup: the bare jitted
raycast costs ~17 ms but slice C (raycast + view/prime computation +
output merges, one outer jit) costs ~36 ms. Measure the additions one
at a time on the SAME map."""

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
    from supereight_tpu.ops import raycast
    from supereight_tpu.parallel import step as pstep

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("ofusion")
    mu = 0.008
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    budget = pstep.integration_budget(geom, 8192)
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(10, 5, 4), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=budget)
    for i in range(9):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    m = state.map
    pose = state.pose
    depth = jnp.asarray(depths[8])
    frame = jnp.int32(9)
    print(f"blocks={int(state.map.n_blocks)}", flush=True)

    view = jnp.matmul(pose, se3.inverse_camera_matrix(kj),
                      precision=jax.lax.Precision.HIGHEST)
    prime = raycast.prime_from_depth(depth, kj)
    jax.block_until_ready((view, prime))

    rc = functools.partial(raycast.raycast, geom, field=field, mu=mu,
                          frame_size=(W, H), pool_bucket=budget)

    # (a) bare inner-jit raycast, precomputed view/prime
    ms = timed(lambda mm, v, pt: rc(state=mm, view=v, prime_t=pt),
               m, view, prime, tag="ca")
    print(f"a bare rc              {ms:8.2f} ms", flush=True)

    # (b) outer jit, view+prime computed inside
    @jax.jit
    def c_b(mm, p, d):
        v = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST)
        pt = raycast.prime_from_depth(d, kj)
        return rc(state=mm, view=v, prime_t=pt)

    ms = timed(c_b, m, pose, depth, tag="cb")
    print(f"b + view/prime inside  {ms:8.2f} ms", flush=True)

    # (c) + output merges against prior state
    @jax.jit
    def c_c(mm, st, p, d, fr):
        v = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST)
        pt = raycast.prime_from_depth(d, kj)
        rv, rn, rok, rstats = rc(state=mm, view=v, prime_t=pt,
                                 with_stats=True)
        do = fr > 2
        return (jnp.where(do, rv, st.vertex), jnp.where(do, rn, st.normal),
                jnp.where(do, rok, st.valid), rstats["ray_overflow"])

    ms = timed(c_c, m, state, pose, depth, frame, tag="cc")
    print(f"c + merges             {ms:8.2f} ms", flush=True)

    # (d) with_stats only (overflow sum forced)
    ms = timed(lambda mm, v, pt: rc(state=mm, view=v, prime_t=pt,
                                    with_stats=True),
               m, view, prime, tag="cd")
    print(f"d bare + with_stats    {ms:8.2f} ms", flush=True)


if __name__ == "__main__" and not set(sys.argv[1:]) & {"e", "g"}:
    main()


def main2():
    """Variant e: in-program view via UNROLLED scalar 4x4 product."""
    import jax
    import jax.numpy as jnp

    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import raycast
    from supereight_tpu.parallel import step as pstep
    import functools

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("ofusion")
    mu = 0.008
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    budget = pstep.integration_budget(geom, 8192)
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(10, 5, 4), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=budget)
    for i in range(9):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    m = state.map
    pose = state.pose
    depth = jnp.asarray(depths[8])
    rc = functools.partial(raycast.raycast, geom, field=field, mu=mu,
                          frame_size=(W, H), pool_bucket=budget)

    def matmul4_scalar(a, b):
        rows = []
        for i in range(4):
            row = []
            for j in range(4):
                row.append(a[i, 0] * b[0, j] + a[i, 1] * b[1, j]
                           + a[i, 2] * b[2, j] + a[i, 3] * b[3, j])
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

    @jax.jit
    def c_e(mm, p, d):
        v = matmul4_scalar(p, se3.inverse_camera_matrix(kj))
        pt = raycast.prime_from_depth(d, kj)
        return rc(state=mm, view=v, prime_t=pt)

    ms = timed(c_e, m, pose, depth, tag="ce")
    print(f"e scalar-matmul view   {ms:8.2f} ms", flush=True)

    # f: MXU view but prime OUTSIDE
    prime = raycast.prime_from_depth(depth, kj)
    jax.block_until_ready(prime)

    @jax.jit
    def c_f(mm, p, pt):
        v = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST)
        return rc(state=mm, view=v, prime_t=pt)

    ms = timed(c_f, m, pose, prime, tag="cf")
    print(f"f mxu view, prime in   {ms:8.2f} ms", flush=True)


if __name__ == "__main__" and "e" in sys.argv[1:]:
    main2()



def main3():
    """Variant g: in-program prime behind an optimization_barrier."""
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import raycast
    from supereight_tpu.parallel import step as pstep
    import functools

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("ofusion")
    mu = 0.008
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        10, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    budget = pstep.integration_budget(geom, 8192)
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(10, 5, 4), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=budget)
    for i in range(9):
        state, aux = fn(state, jnp.asarray(depths[i]), kj, jnp.int32(i))
    jax.block_until_ready(state)
    m = state.map
    pose = state.pose
    depth = jnp.asarray(depths[8])
    rc = functools.partial(raycast.raycast, geom, field=field, mu=mu,
                          frame_size=(W, H), pool_bucket=budget)

    @jax.jit
    def c_g(mm, p, d):
        v = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST)
        pt = jax.lax.optimization_barrier(raycast.prime_from_depth(d, kj))
        return rc(state=mm, view=v, prime_t=pt)

    ms = timed(c_g, m, pose, depth, tag="cg")
    print(f"g prime in + barrier   {ms:8.2f} ms", flush=True)

    # h: barrier on depth instead (before prime)
    @jax.jit
    def c_h(mm, p, d):
        v = jnp.matmul(p, se3.inverse_camera_matrix(kj),
                       precision=jax.lax.Precision.HIGHEST)
        d2 = jax.lax.optimization_barrier(d * 1.0)
        pt = raycast.prime_from_depth(d2, kj)
        return rc(state=mm, view=v, prime_t=pt)

    ms = timed(c_h, m, pose, depth, tag="ch")
    print(f"h depth barrier        {ms:8.2f} ms", flush=True)


if __name__ == "__main__" and "g" in sys.argv[1:]:
    main3()
