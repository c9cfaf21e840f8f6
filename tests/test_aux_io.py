"""Aux IO tests: debug dumps, scf config, sweep log parsing, perfstats."""

import io

import jax.numpy as jnp
import numpy as np

from supereight_tpu.config import Configuration
from supereight_tpu.core import map as m
from supereight_tpu.eval.sweep import parse_frame_log, summarize
from supereight_tpu.fields import TSDF
from supereight_tpu.io import debug_io, scf
from supereight_tpu.utils.perfstats import PerfStats, StatType


def _small_map():
    geom = m.MapGeometry(size=32, dim=1.0, capacity=16)
    state = m.make_map(geom, TSDF)
    touched = jnp.zeros((4, 4, 4), bool).at[0, 0, 0].set(True)
    state = m.allocate_blocks(geom, state, touched)
    return geom, state


def test_save_point_cloud(tmp_path):
    p = tmp_path / "pc.vtk"
    debug_io.save_point_cloud(str(p), np.random.rand(10, 3))
    txt = p.read_text()
    assert "POINTS 10 FLOAT" in txt


def test_save_3d_slice(tmp_path):
    geom, state = _small_map()
    p = tmp_path / "slice.vtk"
    debug_io.save_3d_slice(str(p), geom, state, TSDF, (0, 0, 0), (4, 4, 1))
    txt = p.read_text()
    assert "DIMENSIONS 4 4 1" in txt
    assert "POINT_DATA 16" in txt


def test_save_block_list(tmp_path):
    geom, state = _small_map()
    p = tmp_path / "blocks.txt"
    debug_io.save_block_list(str(p), geom, state)
    lines = p.read_text().splitlines()
    assert lines[0] == "x y z active"
    assert len(lines) == 2


def test_print_normals_ppm(tmp_path):
    p = tmp_path / "n.ppm"
    debug_io.print_normals(str(p), np.zeros((4, 6, 3), np.float32))
    data = p.read_bytes()
    assert data.startswith(b"P6\n6 4\n255\n")


def test_scf_parsing(tmp_path):
    p = tmp_path / "run.scf"
    p.write_text("""
# comment
volume_resolution = 128
volume_size = 3.2
mu = 0.05
camera = 100,100,64,48
pyramid = 4,3
field = ofusion
""")
    cfg = scf.parse_scf(str(p))
    assert cfg.volume_resolution == 128
    assert cfg.volume_size == 3.2
    assert cfg.camera == (100.0, 100.0, 64.0, 48.0)
    assert cfg.pyramid == (4, 3)
    assert cfg.field == "ofusion"


def test_frame_log_roundtrip(tmp_path):
    p = tmp_path / "log.tsv"
    p.write_text(
        "frame\tacquisition\tpreprocessing\ttracking\tintegration\t"
        "raycasting\trendering\tcomputation\ttotal\tX\tY\tZ\ttracked\t"
        "integrated\n"
        "0\t0.001\t0.002\t0.003\t0.004\t0.005\t0.0\t0.012\t0.015\t"
        "1\t1\t0.5\t1\t1\n"
        "1\t0.001\t0.002\t0.005\t0.004\t0.005\t0.0\t0.014\t0.015\t"
        "1\t1\t0.5\t1\t0\n")
    rows = parse_frame_log(str(p))
    assert len(rows) == 2
    s = summarize(rows)
    np.testing.assert_allclose(s["tracking_mean"], 0.004)
    np.testing.assert_allclose(s["tracked_fraction"], 1.0)
    assert s["fps"] > 0


def test_perfstats():
    st = PerfStats()
    st.sample("a", 1.0, StatType.TIME)
    st.sample("a", 3.0, StatType.TIME)
    assert st.mean("a") == 2.0 and st.min("a") == 1.0 and st.max("a") == 3.0
    buf = io.StringIO()
    st.print_summary(buf)
    assert "a\tmin=1" in buf.getvalue()
    with st.timer("b") as box:
        box["sync"] = jnp.zeros(4)
    assert st.last("b") >= 0
