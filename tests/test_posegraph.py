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
