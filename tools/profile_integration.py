"""Trace-timed breakdown of the integration stage at bench config."""

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
    from supereight_tpu.ops import allocation, integration
    from supereight_tpu.fields import tsdf as tsdf_field

    W, H = 320, 240
    BUDGET = 8192
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        8, k, width=W, height=H, radius=0.3 * 4.8,
        center=(2.4,) * 3, sphere_radius=0.15 * 4.8, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)

    from supereight_tpu.core.map import make_map
    m = make_map(geom, field)
    for i in range(5):
        d = jnp.asarray(depths[i])
        p = jnp.asarray(poses[i], jnp.float32)
        m = allocation.allocate_tsdf(geom, m, d, p, kj, 0.1)
        m = integration.integrate(geom, m, field, d, p, kj, 0.1, 0.0,
                                  (W, H))
    jax.block_until_ready(m)
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr)

    depth = jnp.asarray(depths[5])
    pose = jnp.asarray(poses[5], jnp.float32)
    t_cw = se3.inverse(pose)
    K = se3.camera_matrix(kj)

    # pieces -------------------------------------------------------------
    wl_fn = jax.jit(functools.partial(integration.build_active_worklist,
                                      geom, frame_size=(W, H),
                                      budget=BUDGET))
    wl = wl_fn(m, t_cw, K)
    print(f"worklist      {timed(wl_fn, m, t_cw, K, tag='wl'):8.3f} ms")

    cap = geom.capacity
    present = wl < cap
    slots = jnp.minimum(wl, cap - 1)
    vs = geom.voxel_size
    LX, LY, LZ = integration._LOCAL_X, integration._LOCAL_Y, integration._LOCAL_Z

    def coords_proj(m, slots):
        bc = m.block_coord[slots]
        wx = (bc[:, 0:1] * 8 + LX[None]).astype(jnp.float32) * vs
        wy = (bc[:, 1:2] * 8 + LY[None]).astype(jnp.float32) * vs
        wz = (bc[:, 2:3] * 8 + LZ[None]).astype(jnp.float32) * vs
        return integration._project_voxels_c(geom, wx, wy, wz, t_cw, K,
                                             (W, H))
    cp = jax.jit(coords_proj)
    (cx, cy, cz), px, py, valid = cp(m, slots)
    print(f"coords+proj   {timed(cp, m, slots, tag='cp'):8.3f} ms")

    ds_fn = jax.jit(integration._sample_depth)
    ds = ds_fn(depth, px, py)
    print(f"depth gather  {timed(ds_fn, depth, px, py, tag='ds'):8.3f} ms")

    def pool_reads(m, slots):
        return m.data_x[slots], m.data_y[slots]
    pr = jax.jit(pool_reads)
    old_x, old_y = pr(m, slots)
    print(f"pool reads    {timed(pr, m, slots, tag='pr'):8.3f} ms")

    def upd(old_x, old_y, cx, cy, cz, ds, valid):
        return tsdf_field.update(old_x, old_y, (cx, cy, cz), ds, 0.1, valid)
    up = jax.jit(upd)
    nx, ny, _ = up(old_x, old_y, cx, cy, cz, ds, valid)
    print(f"field update  {timed(up, old_x, old_y, cx, cy, cz, ds, valid, tag='up'):8.3f} ms")

    def wb(m, wl, nx, ny):
        wl_or_drop = jnp.where(wl < cap, wl, cap)
        dx_ = m.data_x.at[wl_or_drop].set(nx, mode="drop")
        dy_ = m.data_y.at[wl_or_drop].set(ny, mode="drop")
        return dx_, dy_
    wbf = jax.jit(wb)
    wbf(m, wl, nx, ny)
    print(f"writeback     {timed(wbf, m, wl, nx, ny, tag='wb'):8.3f} ms")

    # strip-of-8 depth fetch variant
    def ds_strip(depth, px, py):
        h, w = depth.shape
        xi = jnp.clip(px.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        strips = depth.reshape(h * (w // 8), 8)
        row = strips[yi * (w // 8) + (xi >> 3)]
        lane = xi & 7
        sel = jnp.arange(8)[None, None, :] == lane[..., None]
        return jnp.sum(row * sel, axis=-1)
    dsf2 = jax.jit(ds_strip)
    ds2 = dsf2(depth, px, py)
    print(f"depth strip8  {timed(dsf2, depth, px, py, tag='ds2'):8.3f} ms")
    import numpy as np
    print("strip == elem:", bool(jnp.all(ds2 == ds)))

    # full integrate for reference
    it = jax.jit(functools.partial(integration.integrate, geom, field=field,
                                   frame_size=(W, H)))
    def full(m):
        return integration.integrate(geom, m, field, depth, pose, kj, 0.1,
                                     0.2, (W, H))
    fi = jax.jit(full)
    fi(m)
    print(f"full integr.  {timed(fi, m, tag='full'):8.3f} ms")


if __name__ == "__main__":
    main()
