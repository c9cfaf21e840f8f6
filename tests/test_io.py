"""IO tests: raw format roundtrip, map snapshot roundtrip, ATE/RPE math.

Models the reference's io_unittest (serialise/deserialise roundtrip)
plus the dataset tooling behavior (scene2raw format).
"""

import os

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import map as m
from supereight_tpu.eval.ate import associate, ate_statistics
from supereight_tpu.eval.rpe import rpe_statistics, trajectory_matrices
from supereight_tpu.fields import TSDF
from supereight_tpu.io import dataset, serialise


def test_raw_roundtrip(tmp_path):
    path = str(tmp_path / "seq.raw")
    rng = np.random.default_rng(0)
    depths = rng.integers(0, 5000, size=(3, 24, 32)).astype(np.uint16)
    dataset.write_raw(path, depths)
    r = dataset.RawDepthReader(path)
    assert (r.width, r.height) == (32, 24)
    assert r.num_frames == 3
    for i in range(3):
        d, rgb, _ = r.read_next()
        np.testing.assert_array_equal(d, depths[i])
    d, _, _ = r.read_next()
    assert d is None


def test_groundtruth_parsing(tmp_path):
    path = str(tmp_path / "gt.txt")
    with open(path, "w") as f:
        f.write("# comment\n")
        f.write("0.0 1.0 2.0 3.0 0 0 0 1\n")
        f.write("0.033 1.1 2.0 3.0 0 0 0.7071068 0.7071068\n")
    poses = dataset.load_groundtruth_poses(path)
    assert len(poses) == 2
    np.testing.assert_allclose(poses[0][:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-6)
    # 90 deg about z
    np.testing.assert_allclose(poses[1][:3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                               atol=1e-6)


def test_map_snapshot_roundtrip(tmp_path):
    geom = m.MapGeometry(size=64, dim=2.0, capacity=64)
    state = m.make_map(geom, TSDF)
    touched = jnp.zeros((8, 8, 8), bool).at[1, 2, 3].set(True) \
        .at[4, 4, 4].set(True)
    state = m.allocate_blocks(geom, state, touched)
    v = jnp.array([[10, 17, 25], [35, 36, 37]], jnp.int32)
    state = m.set_voxels(state, v, jnp.array([0.25, -0.5]),
                         jnp.array([3.0, 4.0]))
    path = str(tmp_path / "map.npz")
    serialise.save_map(path, geom, state, TSDF)
    geom2, state2, field2 = serialise.load_map(path)
    assert geom2 == geom and field2.name == "tsdf"
    assert int(state2.n_blocks) == 2
    x, y = m.get_voxel(geom2, state2, field2, v)
    np.testing.assert_allclose(np.asarray(x), [0.25, -0.5])
    np.testing.assert_allclose(np.asarray(y), [3.0, 4.0])
    # unallocated still init
    x, _ = m.get_voxel(geom2, state2, field2, jnp.array([[50, 50, 50]]))
    assert float(x[0]) == 1.0


def test_ate_statistics():
    gt = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float)
    est = gt + np.array([0.1, 0, 0])
    st = ate_statistics(gt, est)
    np.testing.assert_allclose(st["rmse"], 0.1, atol=1e-9)
    st2 = ate_statistics(gt, est, align=True)
    assert st2["rmse"] < 1e-9   # pure offset is aligned away


def test_associate_nearest():
    pairs = associate([0.0, 0.033, 0.066], [0.001, 0.034, 0.5])
    assert pairs == [(0, 0), (1, 1)]


def test_rpe_perfect_relative_motion():
    xyz = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float)
    quat = np.tile([0, 0, 0, 1.0], (3, 1))
    gt = trajectory_matrices(xyz, quat)
    est = trajectory_matrices(xyz + 5.0, quat)  # constant offset
    st = rpe_statistics(gt, est, delta=1)
    assert st["trans_rmse"] < 1e-9
    assert st["rot_rmse_deg"] < 1e-6
