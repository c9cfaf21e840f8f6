"""Interpolation tests on an analytic field.

Models the reference's interpolation unit test, which samples
f(x,y,z) = z^2 + sin(2x + y) into a band of allocated blocks and checks
trilinear reconstruction (se_core/test/interp/interpolation_unittest.cpp:45-80).
"""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import interp, map as m
from supereight_tpu.fields import TSDF

GEOM = m.MapGeometry(size=64, dim=64.0, capacity=600)  # voxel_size = 1


def _analytic(v):
    v = v.astype(np.float32)
    return v[..., 2] ** 2 / 100.0 + np.sin(2 * v[..., 0] / 10.0 + v[..., 1] / 10.0)


def _full_map():
    state = m.make_map(GEOM, TSDF)
    b = GEOM.blocks_per_side
    state = m.allocate_blocks(GEOM, state, jnp.ones((b, b, b), bool))
    g = np.arange(64)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    vals = _analytic(coords)
    state = m.set_voxels(state, jnp.asarray(coords), jnp.asarray(vals),
                         jnp.ones(len(coords)))
    return state


def test_exact_at_integer_coords():
    state = _full_map()
    pts = np.array([[1, 2, 3], [10, 20, 30], [7, 7, 7]], np.float32)
    out = interp.interp(GEOM, state, TSDF, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), _analytic(pts), atol=1e-5)


def test_matches_numpy_trilerp_everywhere():
    state = _full_map()
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 62.9, size=(200, 3)).astype(np.float32)
    out = np.asarray(interp.interp(GEOM, state, TSDF, jnp.asarray(pts)))

    base = np.floor(pts).astype(int)
    frac = pts - base
    expect = np.zeros(len(pts), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.where(dx, frac[:, 0], 1 - frac[:, 0])
                     * np.where(dy, frac[:, 1], 1 - frac[:, 1])
                     * np.where(dz, frac[:, 2], 1 - frac[:, 2]))
                expect += w * _analytic(base + [dx, dy, dz])
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_cross_block_stencil():
    """2x2x2 stencils crossing block faces must see both bricks
    (the crossmask paths of interp_gather.hpp:105-237)."""
    state = _full_map()
    pts = np.array([[7.5, 7.5, 7.5], [7.5, 3.0, 3.0], [15.5, 23.5, 31.5]],
                   np.float32)
    out = np.asarray(interp.interp(GEOM, state, TSDF, jnp.asarray(pts)))
    # compare against dense trilerp
    base = np.floor(pts).astype(int)
    frac = pts - base
    expect = np.zeros(len(pts), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (np.where(dx, frac[:, 0], 1 - frac[:, 0])
                     * np.where(dy, frac[:, 1], 1 - frac[:, 1])
                     * np.where(dz, frac[:, 2], 1 - frac[:, 2]))
                expect += w * _analytic(base + [dx, dy, dz])
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_unallocated_corner_reads_empty():
    state = m.make_map(GEOM, TSDF)
    b = GEOM.blocks_per_side
    touched = jnp.zeros((b, b, b), bool).at[0, 0, 0].set(True)
    state = m.allocate_blocks(GEOM, state, touched)
    # whole allocated block = 0.0; query centered on the +x face: half the
    # stencil reads empty().x == 1.0
    g = np.arange(8)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    state = m.set_voxels(state, jnp.asarray(coords),
                         jnp.zeros(len(coords)), jnp.ones(len(coords)))
    out = float(interp.interp(GEOM, state, TSDF,
                              jnp.array([[7.5, 3.0, 3.0]]))[0])
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_grad_of_linear_field_is_exact():
    state = m.make_map(GEOM, TSDF)
    b = GEOM.blocks_per_side
    state = m.allocate_blocks(GEOM, state, jnp.ones((b, b, b), bool))
    g = np.arange(64)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    lin = (2.0 * coords[:, 0] - 3.0 * coords[:, 1] + 0.5 * coords[:, 2])
    state = m.set_voxels(state, jnp.asarray(coords),
                         jnp.asarray(lin, dtype=np.float32),
                         jnp.ones(len(coords)))
    pts = jnp.array([[20.3, 30.7, 40.1], [8.0, 8.0, 8.0]], jnp.float32)
    gout = np.asarray(interp.grad(GEOM, state, TSDF, pts))
    # grad returns 0.5 * voxel_size * (central difference over 2 voxels)
    # = voxel_size * true gradient per voxel; voxel_size = 1 here
    np.testing.assert_allclose(gout, [[2.0, -3.0, 0.5]] * 2, atol=1e-4)
