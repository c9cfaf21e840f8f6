"""Checkpoint / resume: a resumed pipeline continues the trajectory the
uninterrupted one produces."""

import numpy as np

from supereight_tpu.config import Configuration
from supereight_tpu.io import synthetic
from supereight_tpu.pipeline import DenseSLAMSystem

K = (120.0, 120.0, 80.0, 60.0)
W, H = 160, 120
ROOM = ((0.15, 0.15, 0.15), (1.85, 1.85, 1.85))


def _cfg():
    return Configuration(volume_resolution=128, volume_size=2.0, mu=0.1,
                         camera=K, compute_size_ratio=1,
                         integration_rate=1, pyramid=(4, 3, 2),
                         block_capacity=4096)


def test_resume_matches_uninterrupted(tmp_path):
    depths, poses = synthetic.orbit_sequence(
        10, K, width=W, height=H, radius=0.8, center=(1.0, 1.0, 1.0),
        sphere_radius=0.3, angle_span=0.4, room=ROOM)

    # uninterrupted run
    a = DenseSLAMSystem((W, H), _cfg(), init_pose=poses[0])
    for i, d in enumerate(depths):
        a.process_frame(d, i, is_mm=False,
                        gt_pose=poses[i] if i <= 3 else None)

    # interrupted at frame 6, checkpointed, resumed in a fresh pipeline
    b = DenseSLAMSystem((W, H), _cfg(), init_pose=poses[0])
    for i in range(6):
        b.process_frame(depths[i], i, is_mm=False,
                        gt_pose=poses[i] if i <= 3 else None)
    ckpt = str(tmp_path / "run.npz")
    b.save_checkpoint(ckpt)

    c = DenseSLAMSystem((W, H), _cfg(), init_pose=poses[0])
    c.load_checkpoint(ckpt)
    assert c.block_count() == b.block_count()
    for i in range(6, len(depths)):
        c.process_frame(depths[i], i, is_mm=False)

    np.testing.assert_allclose(c.get_pose(), a.get_pose(), atol=2e-3)
