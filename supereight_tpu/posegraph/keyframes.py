"""Keyframe manager: builds the windowed pose graph from the live pipeline.

Records a keyframe every ``keyframe_every`` tracked frames with the
odometry constraint from the tracker (relative pose between consecutive
keyframes, weighted by the ICP inlier count from the 32-float reduction),
supports injecting loop-closure edges, and optimizes the window with
posegraph.graph.optimize. Corrections are returned per keyframe; the
caller can re-anchor the live pose by composing with the latest
correction.
"""

import numpy as np

import jax.numpy as jnp

from supereight_tpu.core import se3
from supereight_tpu.posegraph import graph as pg


class KeyframeManager:
    def __init__(self, window: int = 32, keyframe_every: int = 10,
                 max_edges: int = 128):
        self.window = window
        self.keyframe_every = keyframe_every
        self.max_edges = max_edges
        self.poses = []          # list of np [4,4]
        self.frames = []         # frame index per keyframe
        self.edges = []          # (i, j, T_meas np[4,4], weight)
        self._frame_count = 0

    def maybe_add(self, frame: int, pose, reduction=None) -> bool:
        """Call once per tracked frame; records a keyframe on schedule."""
        if frame % self.keyframe_every != 0:
            return False
        pose = np.asarray(pose, np.float32)
        idx = len(self.poses)
        self.poses.append(pose)
        self.frames.append(frame)
        if idx > 0:
            prev = self.poses[idx - 1]
            t_meas = np.linalg.inv(prev) @ pose
            weight = 1.0
            if reduction is not None:
                weight = max(float(np.asarray(reduction)[28]), 1.0) ** 0.5
            self.edges.append((idx - 1, idx, t_meas.astype(np.float32),
                               weight))
        self._trim()
        return True

    def add_loop_closure(self, i: int, j: int, t_meas, weight: float = 1.0):
        """Add a non-consecutive constraint (e.g. from re-localization)."""
        self.edges.append((i, j, np.asarray(t_meas, np.float32), weight))

    def _trim(self):
        """Slide the window: drop the oldest keyframes + incident edges."""
        excess = len(self.poses) - self.window
        if excess <= 0:
            return
        self.poses = self.poses[excess:]
        self.frames = self.frames[excess:]
        self.edges = [(i - excess, j - excess, t, w)
                      for (i, j, t, w) in self.edges
                      if i >= excess and j >= excess]

    def optimize(self, iters: int = 10):
        """Optimize the current window; returns corrected poses [N,4,4]."""
        n = len(self.poses)
        if n < 2 or not self.edges:
            return np.asarray(self.poses)
        e = len(self.edges)
        cap = max(self.max_edges, e)
        i = np.zeros(cap, np.int32)
        j = np.zeros(cap, np.int32)
        t = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
        w = np.zeros(cap, np.float32)
        valid = np.zeros(cap, bool)
        for k, (ei, ej, et, ew) in enumerate(self.edges):
            i[k], j[k], t[k], w[k], valid[k] = ei, ej, et, ew, True
        g = pg.PoseGraph(i=jnp.asarray(i), j=jnp.asarray(j),
                         t_meas=jnp.asarray(t), weight=jnp.asarray(w),
                         valid=jnp.asarray(valid))
        out = pg.optimize(jnp.asarray(np.stack(self.poses)), g,
                          num_nodes=n, iters=iters)
        out = np.asarray(out)
        self.poses = [p for p in out]
        return out

    def correction_for_latest(self):
        """Transform mapping the pre-optimization latest pose to the
        optimized one (apply to the live pose to re-anchor tracking)."""
        return self.poses[-1]
