"""Pose-graph optimization tests: log/exp inverses, drift correction with
a loop closure, keyframe manager windowing."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import se3
from supereight_tpu.posegraph import graph as pg
from supereight_tpu.posegraph.keyframes import KeyframeManager


def test_se3_log_exp_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        twist = rng.normal(size=6) * 0.5
        T = se3.exp(jnp.asarray(twist))
        back = np.asarray(pg.se3_log(T))
        np.testing.assert_allclose(back, twist, atol=1e-5)


def test_se3_log_identity():
    np.testing.assert_allclose(np.asarray(pg.se3_log(jnp.eye(4))),
                               np.zeros(6), atol=1e-7)


def _chain_with_drift(n=6, step=0.5, drift=0.05):
    """Ground truth: straight line. Odometry edges are exact; the
    estimated poses accumulate drift. A loop edge ties last to first."""
    gt = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = step * i
        gt.append(T)
    est = []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = step * i + drift * i   # growing drift along x
        T[1, 3] = drift * i
        est.append(T)
    edges = []
    for i in range(n - 1):
        t_meas = np.linalg.inv(gt[i]) @ gt[i + 1]
        edges.append((i, i + 1, t_meas, 1.0))
    # loop closure: exact relative pose between first and last
    t_loop = np.linalg.inv(gt[0]) @ gt[n - 1]
    edges.append((0, n - 1, t_loop, 1.0))
    return gt, est, edges


def test_loop_closure_removes_drift():
    gt, est, edges = _chain_with_drift()
    n, e = len(gt), len(edges)
    g = pg.PoseGraph(
        i=jnp.asarray([x[0] for x in edges], jnp.int32),
        j=jnp.asarray([x[1] for x in edges], jnp.int32),
        t_meas=jnp.asarray(np.stack([x[2] for x in edges])),
        weight=jnp.ones(e), valid=jnp.ones(e, bool))
    out = np.asarray(pg.optimize(jnp.asarray(np.stack(est)), g,
                                 num_nodes=n, iters=15))
    for i in range(n):
        np.testing.assert_allclose(out[i][:3, 3], gt[i][:3, 3], atol=1e-3)


def test_masked_edges_ignored():
    gt, est, edges = _chain_with_drift()
    n = len(gt)
    e = len(edges)
    cap = e + 4   # padding with garbage edges that must not matter
    i = np.zeros(cap, np.int32)
    j = np.zeros(cap, np.int32)
    t = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
    w = np.ones(cap, np.float32)
    valid = np.zeros(cap, bool)
    for k, (ei, ej, et, ew) in enumerate(edges):
        i[k], j[k], t[k], w[k], valid[k] = ei, ej, et, ew, True
    # garbage in the padding
    t[e:] = np.asarray(se3.exp(jnp.asarray([9, 9, 9, 1, 1, 1.0])))
    g = pg.PoseGraph(i=jnp.asarray(i), j=jnp.asarray(j),
                     t_meas=jnp.asarray(t), weight=jnp.asarray(w),
                     valid=jnp.asarray(valid))
    out = np.asarray(pg.optimize(jnp.asarray(np.stack(est)), g,
                                 num_nodes=n, iters=15))
    np.testing.assert_allclose(out[-1][:3, 3], gt[-1][:3, 3], atol=1e-3)


def test_keyframe_manager():
    km = KeyframeManager(window=4, keyframe_every=2)
    for f in range(12):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * f
        km.maybe_add(f, T)
    assert len(km.poses) == 4          # window slid
    assert len(km.edges) == 3          # consecutive edges inside window
    out = km.optimize(iters=5)
    assert out.shape == (4, 4, 4)
    assert np.isfinite(out).all()


def test_pinned_anchor_survives_trim():
    """A loop-closure anchor keyframe must outlive the sliding window
    (frozen as gauge), and its closure edge must survive with it."""
    km = KeyframeManager(window=4, keyframe_every=1)
    for f in range(4):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * f
        km.maybe_add(f, T)
    # closure from keyframe 3 back to keyframe 0 -> 0 is pinned
    km.add_loop_closure(0, 3, np.eye(4, dtype=np.float32), 1.0)
    anchor_frame = km.frames[0]
    # one slide: closure edge must survive the trim that evicts an
    # unpinned keyframe between anchor and target
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.4
    km.maybe_add(4, T)
    assert any(abs(i - j) > 1 for (i, j, _, _) in km.edges)
    for f in range(5, 12):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * f
        km.maybe_add(f, T)
    # the anchor survived eight trims, is frozen, and keeps its maps
    # so the NEXT revisit can re-localize against it
    assert km.frames[0] == anchor_frame
    assert km.pinned[0] and km.frozen[0]
    before = np.asarray(km.poses[0]).copy()
    out = km.optimize(iters=5)
    np.testing.assert_allclose(out[0], before, atol=1e-6)  # held fixed
    assert np.isfinite(out).all()


def test_max_pinned_bounds_anchor_set():
    km = KeyframeManager(window=3, keyframe_every=1, max_pinned=2)
    for f in range(30):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * f
        km.maybe_add(f, T)
        if f >= 3:
            km.add_loop_closure(0, len(km.poses) - 1,
                                np.eye(4, dtype=np.float32), 1.0)
    assert sum(km.pinned) <= 2 + km.window
    assert len(km.poses) <= km.window + 2


def test_nearest_revisit_orientation_gate():
    km = KeyframeManager(window=16, keyframe_every=1)
    fwd = np.eye(4, dtype=np.float32)
    for f in range(6):
        T = fwd.copy()
        T[0, 3] = 0.02 * f
        km.maybe_add(f, T)
    # same position but facing the opposite way: no candidate
    back = np.eye(4, dtype=np.float32)
    back[0, 0] = back[2, 2] = -1.0
    assert km.nearest_revisit(back) is None
    assert km.nearest_revisit(fwd) is not None


def test_frame_corrections_identity_before_optimize():
    """frame_corrections: identity until BA moves keyframes; after a
    closure-driven optimize the corrections are the rigid transforms
    applied per keyframe (used for the FINAL trajectory output,
    cli.py r5)."""
    import numpy as np
    from supereight_tpu.posegraph.keyframes import KeyframeManager
    km = KeyframeManager(window=8, keyframe_every=1)
    rng = np.random.default_rng(3)
    for f in range(5):
        P = np.eye(4, dtype=np.float32)
        P[:3, 3] = [f * 0.1, 0, 0]
        km.maybe_add(f, P)
    for f, C in km.frame_corrections():
        np.testing.assert_allclose(C, np.eye(4), atol=1e-6)
    # inject a closure pulling the last keyframe back 0.1 and optimize
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.3   # kf0 -> kf4 measured as 0.3 (odometry says 0.4)
    km.add_loop_closure(0, 4, T, weight=10.0)
    km.optimize()
    corr = dict(km.frame_corrections())
    assert abs(corr[4][0, 3]) > 0.01     # last keyframe moved
    np.testing.assert_allclose(corr[0], np.eye(4), atol=1e-4)  # anchor
