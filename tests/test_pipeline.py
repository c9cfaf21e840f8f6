"""End-to-end pipeline tests on the synthetic scene.

Model: the reference's out-of-repo strategy (SURVEY.md section 4) — run
the full pipeline on a sequence with ground truth and gate trajectory /
reconstruction error. Ground-truth-pose mode first (isolates mapping),
then full ICP tracking.
"""

import numpy as np
import pytest

from supereight_tpu.config import Configuration
from supereight_tpu.io import synthetic
from supereight_tpu.pipeline import DenseSLAMSystem

K = (120.0, 120.0, 80.0, 60.0)
W, H = 160, 120
# keep walls inside the volume so their TSDF band fits in the map
ROOM = ((0.15, 0.15, 0.15), (1.85, 1.85, 1.85))


def make_config(**kw):
    base = dict(volume_resolution=128, volume_size=2.0, mu=0.1,
                camera=K, compute_size_ratio=1, integration_rate=1,
                rendering_rate=1, pyramid=(4, 3, 2),
                block_capacity=4096)
    base.update(kw)
    return Configuration(**base)


@pytest.fixture(scope="module")
def sequence():
    return synthetic.orbit_sequence(
        8, K, width=W, height=H, radius=0.8, center=(1.0, 1.0, 1.0),
        sphere_radius=0.3, angle_span=0.5, room=ROOM)


def test_groundtruth_mode_reconstruction(sequence):
    depths, poses = sequence
    cfg = make_config()
    pipe = DenseSLAMSystem((W, H), cfg, init_pose=poses[0])
    for i, (d, p) in enumerate(zip(depths, poses)):
        pipe.process_frame(d, i, is_mm=False, gt_pose=p)
    assert pipe.block_count() > 50

    # raycast from the last pose reproduces the observed depth
    vert = np.asarray(pipe.vertex)
    valid = np.asarray(pipe.valid)
    pose = poses[-1]
    p_cam = (vert - pose[:3, 3]) @ pose[:3, :3]
    z = p_cam[..., 2]
    d_true = depths[-1]
    mask = valid & (d_true > 0) & (z > 0)
    assert mask.mean() > 0.5
    err = np.abs(z[mask] - d_true[mask])
    assert np.median(err) < 0.02, f"median depth err {np.median(err):.4f}"


def test_icp_tracking_recovers_poses(sequence):
    """Bootstrap the map with ground-truth poses for the first frames
    (raycast maps only exist from frame 3, as in the reference), then
    track the rest with ICP only."""
    depths, poses = sequence
    cfg = make_config()
    pipe = DenseSLAMSystem((W, H), cfg, init_pose=poses[0])
    errs = []
    for i, d in enumerate(depths):
        if i <= 3:
            pipe.process_frame(d, i, is_mm=False, gt_pose=poses[i])
        else:
            res = pipe.process_frame(d, i, is_mm=False)
            assert res["tracked"], f"frame {i} lost tracking"
            est = pipe.get_pose()
            errs.append(np.linalg.norm(est[:3, 3] - poses[i][:3, 3]))
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.02, f"ATE RMSE {ate:.4f} m, per-frame {errs}"


def test_tracking_rollback_on_garbage():
    depths, poses = synthetic.orbit_sequence(
        4, K, width=W, height=H, radius=0.8, center=(1.0, 1.0, 1.0),
        sphere_radius=0.3, angle_span=0.2, room=ROOM)
    cfg = make_config()
    pipe = DenseSLAMSystem((W, H), cfg, init_pose=poses[0])
    for i, d in enumerate(depths):
        pipe.process_frame(d, i, is_mm=False)
    pose_before = pipe.get_pose()
    # all-zero depth: no residuals -> checkPose must roll back
    res = pipe.process_frame(np.zeros((H, W), np.float32), len(depths),
                             is_mm=False)
    assert not res["tracked"]
    np.testing.assert_allclose(pipe.get_pose(), pose_before, atol=1e-6)
    assert np.isfinite(pipe.get_pose()).all()


def test_ofusion_pipeline_groundtruth():
    depths, poses = synthetic.orbit_sequence(
        6, K, width=W, height=H, radius=0.8, center=(1.0, 1.0, 1.0),
        sphere_radius=0.3, angle_span=0.4, room=ROOM)
    cfg = make_config(field="ofusion", mu=0.008)
    pipe = DenseSLAMSystem((W, H), cfg, init_pose=poses[0])
    for i, (d, p) in enumerate(zip(depths, poses)):
        pipe.process_frame(d, i, is_mm=False, gt_pose=p)
    assert pipe.block_count() > 50
    vert = np.asarray(pipe.vertex)
    valid = np.asarray(pipe.valid)
    pose = poses[-1]
    p_cam = (vert - pose[:3, 3]) @ pose[:3, :3]
    z = p_cam[..., 2]
    d_true = depths[-1]
    mask = valid & (d_true > 0) & (z > 0)
    assert mask.mean() > 0.3
    err = np.abs(z[mask] - d_true[mask])
    assert np.median(err) < 0.03, f"median depth err {np.median(err):.4f}"
