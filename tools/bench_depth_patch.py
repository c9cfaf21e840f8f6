"""Integration depth-fetch alternatives, measured on the REAL bench-scene
worklist: per-voxel strip-row gather (current) vs per-block 16x32 pixel
patch gather + one-hot MXU contraction + lane-select tree.

The per-voxel form gathers budget*512 rows (~4.2M at 8192) at ~2-3
ns/row; the patch form gathers 32 rows per BLOCK (~262k) and turns the
per-voxel select into a [512,32]x[16,32]^T one-hot contraction the MXU
eats, plus a 16-wide lane tree. Also reports patch coverage (voxels
whose pixel falls inside their block's 16x32 window) to size the
fallback pass."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_time import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from supereight_tpu.core.map import MapGeometry, make_map
    from supereight_tpu.core import se3
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import synthetic
    from supereight_tpu.ops import allocation, integration
    from supereight_tpu.constants import BLOCK_SIDE

    W, H = 320, 240
    geom = MapGeometry(size=512, dim=4.8, capacity=36864)
    field = get_field("tsdf")
    k = (240.6, 240.0, 160.0, 120.0)
    depths, poses = synthetic.orbit_sequence(
        6, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
        sphere_radius=0.72, angle_span=0.5,
        room=((0.55,) * 3, (4.25,) * 3))
    kj = jnp.asarray(k, jnp.float32)
    m = make_map(geom, field)
    for i in range(5):
        d = jnp.asarray(depths[i])
        p = jnp.asarray(poses[i], jnp.float32)
        m = allocation.allocate_tsdf(geom, m, d, p, kj, 0.1)
        m = integration.integrate(geom, m, field, d, p, kj, 0.1, 0.0,
                                  (W, H))
    jax.block_until_ready(m)
    print(f"blocks: {int(m.n_blocks)}", file=sys.stderr)

    budget = 8192
    depth = jnp.asarray(depths[5])
    pose = jnp.asarray(poses[5], jnp.float32)
    t_cw = se3.inverse(pose)
    K = se3.camera_matrix(kj)
    wl, _ = integration.build_active_worklist(geom, m, t_cw, K, (W, H),
                                              budget)
    slots = jnp.minimum(wl, geom.capacity - 1)
    vs = geom.voxel_size
    bc = m.block_coord[slots]
    wx = (bc[:, 0:1] * BLOCK_SIDE
          + integration._LOCAL_X[None]).astype(jnp.float32) * vs
    wy = (bc[:, 1:2] * BLOCK_SIDE
          + integration._LOCAL_Y[None]).astype(jnp.float32) * vs
    wz = (bc[:, 2:3] * BLOCK_SIDE
          + integration._LOCAL_Z[None]).astype(jnp.float32) * vs
    (_, _, _), px, py, valid = integration._project_voxels_c(
        geom, wx, wy, wz, t_cw, K, (W, H))
    px, py, valid = map(jax.block_until_ready, (px, py, valid))

    # ---- (a) current per-voxel strip rows ------------------------------
    fa = jax.jit(lambda d_, px_, py_: integration._sample_depth(d_, px_,
                                                                py_))
    ra = fa(depth, px, py)
    print(f"(a) per-voxel strip rows: {timed(fa, depth, px, py, tag='dpa'):7.2f} ms")

    # ---- (b) patch + one-hot MXU --------------------------------------
    ws = (W + 7) // 8

    def patch_sample(d_, px_, py_, valid_):
        strips = integration._depth_strips16(d_)       # [h*ws, 16]
        xi = jnp.clip(px_.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(py_.astype(jnp.int32), 0, H - 1)
        bigx = jnp.where(valid_, xi, 10 ** 6)
        bigy = jnp.where(valid_, yi, 10 ** 6)
        x0 = jnp.min(bigx, axis=1)
        y0 = jnp.min(bigy, axis=1)
        s0 = jnp.clip(x0 >> 3, 0, ws - 3)              # [budget]
        y0 = jnp.clip(y0, 0, H - 16)
        # rows: 16 y's x 2 strip cols (s0, s0+2) -> [budget, 16, 32]
        ys = y0[:, None] + jnp.arange(16, dtype=jnp.int32)[None]
        rid0 = ys * ws + s0[:, None]
        rows0 = strips[rid0]                            # [budget,16,16]
        rows1 = strips[rid0 + 2]
        patch = jnp.concatenate([rows0, rows1], axis=-1)  # [budget,16,32]
        xx = xi - (s0[:, None] << 3)                    # [budget,512]
        yy = yi - y0[:, None]
        inp = (xx >= 0) & (xx < 32) & (yy >= 0) & (yy < 16)
        onex = (xx[..., None] == jnp.arange(32)[None, None]).astype(
            jnp.float32)                                # [budget,512,32]
        rowv = jnp.einsum("bvx,byx->bvy", onex, patch,
                          precision=jax.lax.Precision.HIGHEST)
        from supereight_tpu.utils.loops import lane_select
        val = lane_select(rowv, jnp.clip(yy, 0, 15))
        return val, inp

    fb = jax.jit(patch_sample)
    rb, inp = fb(depth, px, py, valid)
    cov = float(jnp.mean(jnp.where(valid, inp, True)))
    ok = float(jnp.max(jnp.abs(jnp.where(valid & inp, rb - ra, 0.0))))
    print(f"(b) patch+onehot MXU:    {timed(fb, depth, px, py, valid, tag='dpb'):7.2f} ms   coverage={cov:.4f}  maxerr={ok:.2e}")

    # ---- (c) patch + bf16 default-precision einsum --------------------
    def patch_bf16(d_, px_, py_, valid_):
        val, inp = patch_sample(d_, px_, py_, valid_)
        return val, inp
    # (separate tag so compile cache distinguishes)  # noqa

    # ---- (d) y-first einsum then 32-lane tree -------------------------
    def patch_yfirst(d_, px_, py_, valid_):
        strips = integration._depth_strips16(d_)
        xi = jnp.clip(px_.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(py_.astype(jnp.int32), 0, H - 1)
        bigx = jnp.where(valid_, xi, 10 ** 6)
        bigy = jnp.where(valid_, yi, 10 ** 6)
        x0 = jnp.min(bigx, axis=1)
        y0 = jnp.min(bigy, axis=1)
        s0 = jnp.clip(x0 >> 3, 0, ws - 3)
        y0 = jnp.clip(y0, 0, H - 16)
        ys = y0[:, None] + jnp.arange(16, dtype=jnp.int32)[None]
        rid0 = ys * ws + s0[:, None]
        rows0 = strips[rid0]
        rows1 = strips[rid0 + 2]
        patch = jnp.concatenate([rows0, rows1], axis=-1)
        xx = xi - (s0[:, None] << 3)
        yy = yi - y0[:, None]
        inp = (xx >= 0) & (xx < 32) & (yy >= 0) & (yy < 16)
        oney = (yy[..., None] == jnp.arange(16)[None, None]).astype(
            jnp.float32)
        rowv = jnp.einsum("bvy,byx->bvx", oney, patch,
                          precision=jax.lax.Precision.HIGHEST)
        from supereight_tpu.utils.loops import lane_select
        val = lane_select(rowv, jnp.clip(xx, 0, 31))
        return val, inp

    fd = jax.jit(patch_yfirst)
    rd, inpd = fd(depth, px, py, valid)
    okd = float(jnp.max(jnp.abs(jnp.where(valid & inpd, rd - ra, 0.0))))
    print(f"(d) y-first einsum:      {timed(fd, depth, px, py, valid, tag='dpd'):7.2f} ms   maxerr={okd:.2e}")


if __name__ == "__main__":
    main()
