"""Render kernels, viewer composites, volume facade, telemetry."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu import constants as C
from supereight_tpu.core import map as m
from supereight_tpu.core.volume import Volume
from supereight_tpu.fields import TSDF
from supereight_tpu.ops import rendering
from supereight_tpu.utils.telemetry import DeviceMonitor
from supereight_tpu.viewer import composite_views, write_ppm


def test_render_depth_colors():
    d = jnp.array([[0.0, C.NEAR_PLANE - 0.1, 2.0, C.FAR_PLANE + 1.0]])
    out = np.asarray(rendering.render_depth(d))
    assert out.shape == (1, 4, 4)
    np.testing.assert_array_equal(out[0, 1, :3], [255, 255, 255])  # near
    np.testing.assert_array_equal(out[0, 3, :3], [0, 0, 0])        # far
    assert out[0, 2, :3].max() > 0                                  # rainbow


def test_render_track_legend():
    res = jnp.array([[1, -1, -2, -3, -4, -5, 7]])
    out = np.asarray(rendering.render_track(res))
    np.testing.assert_array_equal(out[0, 0, :3], [128, 128, 128])
    np.testing.assert_array_equal(out[0, 1, :3], [0, 0, 0])
    np.testing.assert_array_equal(out[0, 2, :3], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 3, :3], [0, 255, 0])
    np.testing.assert_array_equal(out[0, 4, :3], [0, 0, 255])
    np.testing.assert_array_equal(out[0, 5, :3], [255, 255, 0])
    np.testing.assert_array_equal(out[0, 6, :3], [255, 128, 128])


def test_composite_and_ppm(tmp_path):
    a = np.zeros((4, 6, 4), np.uint8)
    comp = composite_views(a, a, a)
    assert comp.shape == (8, 12, 4)
    p = tmp_path / "x.ppm"
    write_ppm(str(p), comp)
    assert p.read_bytes().startswith(b"P6\n12 8\n255\n")


def test_volume_facade():
    geom = m.MapGeometry(size=32, dim=3.2, capacity=64)  # voxel 0.1 m
    state = m.make_map(geom, TSDF)
    state = m.allocate_blocks(geom, state,
                              jnp.ones((4, 4, 4), bool))
    g = np.arange(32)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    vals = coords[:, 0].astype(np.float32)  # f = x_voxel
    state = m.set_voxels(state, jnp.asarray(coords), jnp.asarray(vals),
                         jnp.ones(len(coords)))
    vol = Volume(geom, state, TSDF)
    np.testing.assert_allclose(np.asarray(vol.pos([10, 0, 0])),
                               [1.0, 0, 0], atol=1e-6)
    x, y = vol.get(jnp.array([[1.05, 0.0, 0.0]]))
    assert float(x[0]) == 10.0
    out = float(vol.interp(jnp.array([[1.05, 0.0, 0.0]]))[0])
    np.testing.assert_allclose(out, 10.5, atol=1e-5)
    gr = np.asarray(vol.grad(jnp.array([[1.0, 0.5, 0.5]])))[0]
    # reference scaling (octree.hpp:737): 0.5*voxel_size * (2-voxel
    # central difference) = voxel_size * df/dvoxel = 0.1
    np.testing.assert_allclose(gr, [0.1, 0, 0], atol=1e-5)


def test_device_monitor_runs():
    mon = DeviceMonitor()
    stats = mon.sample()
    assert stats is not None  # stats may be empty on some backends


def test_live_plot(tmp_path):
    """plots.plot_run renders the QtGUI-equivalent stat panels."""
    from supereight_tpu import plots
    rows = [{"frame": i, "preprocessing": 0.001, "tracking": 0.01,
             "integration": 0.02, "raycasting": 0.015, "rendering": 0.0,
             "computation": 0.046, "X": 0.1 * i, "Y": 0.0, "Z": 0.2}
            for i in range(10)]
    out = tmp_path / "plot.png"
    plots.plot_run(rows, str(out))
    assert out.exists() and out.stat().st_size > 10000
