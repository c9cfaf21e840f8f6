"""Explicit morton-range sharding + halo exchange (parallel/dist_step).

Gates the north-star capability on the virtual 8-CPU mesh: the sharded
step must reproduce the single-device trajectory FRAME BY FRAME (not
just the final pose), for both fields, with the frustum-filtered halo,
and report balanced per-device ownership + zero drop counters.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supereight_tpu.core.map import MapGeometry
from supereight_tpu.fields import get_field
from supereight_tpu.io import synthetic
from supereight_tpu.parallel import dist_step, step as pstep

N_DEV = 8
W, H = 64, 48
DIM = 2.0
K = (48.0, 48.0, 32.0, 24.0)
CAP_LOCAL = 128


@pytest.fixture(scope="module")
def scene():
    return synthetic.orbit_sequence(
        6, K, width=W, height=H, radius=0.4 * DIM, center=(DIM / 2,) * 3,
        sphere_radius=0.15 * DIM, angle_span=0.3,
        room=((0.15,) * 3, (DIM - 0.15,) * 3))


def _run_dist(scene, field_name, frustum_halo, use_gt=False):
    depths, poses = scene
    geom_l = MapGeometry(size=64, dim=DIM, capacity=CAP_LOCAL)
    field = get_field(field_name)
    mu = 0.1 if field_name == "tsdf" else 0.008
    mesh = dist_step.make_mesh(N_DEV)
    step = dist_step.make_dist_step(
        mesh, geom_l, field, frame_size=(W, H), iterations=(3, 2),
        mu=mu, icp_threshold=1e-5, frustum_halo=frustum_halo,
        use_gt_pose=use_gt)
    state = dist_step.init_dist_state(mesh, geom_l, field, (W, H), poses[0])
    kj = jnp.asarray(K, jnp.float32)
    traj, auxes = [], []
    for i, d in enumerate(depths):
        gt = jnp.asarray(poses[i], jnp.float32) if use_gt else None
        state, aux = step(state, jnp.asarray(d), kj, jnp.int32(i), gt)
        traj.append(np.asarray(state.pose))
        auxes.append(jax.tree.map(np.asarray, aux))
    return state, traj, auxes


def _run_single(scene, field_name):
    depths, poses = scene
    geom = MapGeometry(size=64, dim=DIM, capacity=CAP_LOCAL * N_DEV)
    field = get_field(field_name)
    mu = 0.1 if field_name == "tsdf" else 0.008
    fn = functools.partial(
        pstep.frame_step, geom, field, frame_size=(W, H),
        iterations=(3, 2), mu=mu, icp_threshold=1e-5, neg_y=False,
        filter_input=False, use_gt_pose=False, integration_rate=1,
        tracking_rate=1, budget=CAP_LOCAL * N_DEV)
    state = pstep.init_frame_state(geom, field, (W, H), poses[0])
    kj = jnp.asarray(K, jnp.float32)
    traj = []
    for i, d in enumerate(depths):
        state, _ = fn(state, jnp.asarray(d), kj, jnp.int32(i))
        traj.append(np.asarray(state.pose))
    return state, traj


@pytest.mark.parametrize("field_name", ["tsdf", "ofusion"])
def test_dist_matches_single_full_trajectory(scene, field_name):
    """Exact-halo mode: every frame's pose must match the single-device
    fused step (same math, different partitioning)."""
    _, traj_d, auxes = _run_dist(scene, field_name, frustum_halo=False)
    _, traj_1 = _run_single(scene, field_name)
    for i, (a, b) in enumerate(zip(traj_d, traj_1)):
        np.testing.assert_allclose(a, b, atol=2e-3,
                                   err_msg=f"frame {i} diverged")
    for aux in auxes:
        assert int(aux["alloc_overflow"]) == 0
        assert int(aux["blocks_truncated"]) == 0
        assert int(aux["halo_overflow"]) == 0


def test_dist_frustum_halo_tracks(scene):
    """Frustum-filtered halo: tracking must survive and stay close to the
    exact-halo trajectory; the exchanged-block count is visible."""
    _, traj_f, auxes = _run_dist(scene, "tsdf", frustum_halo=True)
    _, traj_e, _ = _run_dist(scene, "tsdf", frustum_halo=False)
    np.testing.assert_allclose(traj_f[-1], traj_e[-1], atol=5e-3)
    assert any(int(a["halo_blocks"]) > 0 for a in auxes)
    assert all(int(a["halo_overflow"]) == 0 for a in auxes)


def test_dist_ownership_balance(scene):
    """Morton-range ownership spreads the room's blocks over every
    device (Z-curve locality: contiguous ranges, no empty shard)."""
    state, _, auxes = _run_dist(scene, "tsdf", frustum_halo=False,
                                use_gt=True)
    per_dev = auxes[-1]["n_blocks_dev"]
    assert per_dev.shape == (N_DEV,)
    assert (per_dev > 0).all(), per_dev
    assert int(per_dev.sum()) > 100


def test_owner_grid_is_morton_block_cyclic():
    geom = MapGeometry(size=64, dim=2.0, capacity=64)
    own = dist_step.owner_grid(geom, 4, tile=64)
    from supereight_tpu.core import morton
    b = geom.blocks_per_side
    g = np.arange(b, dtype=np.int32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([X, Y, Z], -1).reshape(-1, 3)
    codes = np.asarray(morton.encode_v(jnp.asarray(coords)))
    # in morton order: 64-cell tiles, round-robin over 4 devices,
    # equal totals
    order = np.argsort(codes)
    ow = own.reshape(-1)[order]
    assert (ow == (np.arange(b ** 3) // 64) % 4).all()
    counts = np.bincount(ow, minlength=4)
    assert (counts == b ** 3 // 4).all()
    # each 4x4x4-block super-brick is single-owner (spatial locality)
    own4 = own.reshape(b // 4, 4, b // 4, 4, b // 4, 4)
    assert (own4.min(axis=(1, 3, 5)) == own4.max(axis=(1, 3, 5))).all()


def test_dist_checkpoint_resume(scene, tmp_path):
    """A sharded run must checkpoint and resume exactly: save after 3
    frames, restore into a fresh mesh state, and reproduce the
    remaining frames' poses (VERDICT r3 missing #7)."""
    from supereight_tpu.parallel.dist_ckpt import (load_dist_checkpoint,
                                                   save_dist_checkpoint)
    depths, poses = scene
    geom_l = MapGeometry(size=64, dim=DIM, capacity=CAP_LOCAL)
    field = get_field("tsdf")
    mesh = dist_step.make_mesh(N_DEV)
    step = dist_step.make_dist_step(
        mesh, geom_l, field, frame_size=(W, H), iterations=(3, 2),
        mu=0.1, icp_threshold=1e-5, frustum_halo=False)
    kj = jnp.asarray(K, jnp.float32)

    state = dist_step.init_dist_state(mesh, geom_l, field, (W, H),
                                      poses[0])
    mid = None
    ref_traj = []
    for i, d in enumerate(depths):
        state, _ = step(state, jnp.asarray(d), kj, jnp.int32(i), None)
        if i == 2:
            save_dist_checkpoint(str(tmp_path / "ckpt"), state)
        if i > 2:
            ref_traj.append(np.asarray(state.pose))

    fresh = dist_step.init_dist_state(mesh, geom_l, field, (W, H),
                                      poses[0])
    restored = load_dist_checkpoint(str(tmp_path / "ckpt"), mesh, fresh)
    assert int(np.asarray(restored.map.n_blocks).sum()) > 0
    got = []
    for i in range(3, len(depths)):
        restored, _ = step(restored, jnp.asarray(depths[i]), kj,
                           jnp.int32(i), None)
        got.append(np.asarray(restored.pose))
    for a, b in zip(ref_traj, got):
        np.testing.assert_allclose(a, b, atol=1e-5)
