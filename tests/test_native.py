"""Native library tests: raw reader parity with Python path, writers,
scene2raw converter."""

import os
import subprocess

import numpy as np
import pytest

from supereight_tpu.io import dataset, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _make_raw(tmp_path, n=3, h=24, w=32):
    rng = np.random.default_rng(0)
    depths = rng.integers(0, 5000, size=(n, h, w)).astype(np.uint16)
    rgbs = rng.integers(0, 255, size=(n, h, w, 3)).astype(np.uint8)
    path = str(tmp_path / "seq.raw")
    dataset.write_raw(path, depths, rgbs)
    return path, depths, rgbs


def test_native_reader_matches_python(tmp_path):
    path, depths, rgbs = _make_raw(tmp_path)
    r = native.NativeRawReader(path)
    assert (r.width, r.height, r.num_frames) == (32, 24, 3)
    for i in range(3):
        d, rgb, _ = r.read_next()
        np.testing.assert_array_equal(d, depths[i])
        np.testing.assert_array_equal(rgb, rgbs[i])
    d, _, _ = r.read_next()
    assert d is None
    r.close()


def test_native_mesh_writers(tmp_path):
    tris = np.random.rand(5, 3, 3).astype(np.float32)
    vtk = str(tmp_path / "m.vtk")
    obj = str(tmp_path / "m.obj")
    assert native.write_vtk_native(vtk, tris)
    assert native.write_obj_native(obj, tris)
    assert open(vtk).readline().startswith("# vtk")
    lines = open(obj).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 15


def test_scene2raw(tmp_path):
    # two tiny ICL-style .depth frames (ray lengths for 640x480)
    scene = tmp_path / "scene"
    scene.mkdir()
    rays = np.full(640 * 480, 2.0)
    for i in range(2):
        with open(scene / f"scene_00_{i:04d}.depth", "w") as f:
            f.write(" ".join("2.0" for _ in range(640 * 480)))
    out = str(tmp_path / "out.raw")
    n = native.scene2raw(str(scene), out)
    assert n == 2
    r = dataset.RawDepthReader(out)
    assert (r.width, r.height, r.num_frames) == (640, 480, 2)
    d, _, _ = r.read_next()
    # center pixel: ray length == z-depth
    assert abs(int(d[240, 320]) - 2000) <= 1
    # corner pixel: z-depth < ray length
    assert int(d[0, 0]) < 2000


def test_standalone_tool_exists():
    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "scene2raw")
    assert os.path.exists(tool)
    proc = subprocess.run([tool], capture_output=True, text=True)
    assert "usage" in proc.stderr
