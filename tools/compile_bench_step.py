"""Compile (and persist to the XLA cache) the bench frame_step program.

Run detached when the compile may exceed the 10-minute tool limit.
"""

import functools
import sys
import time

from supereight_tpu.utils import compilecache

compilecache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from supereight_tpu.core.map import MapGeometry  # noqa: E402
from supereight_tpu.fields import get_field  # noqa: E402
from supereight_tpu.io import synthetic  # noqa: E402
from supereight_tpu.parallel import step as pstep  # noqa: E402

W, H = 320, 240
geom = MapGeometry(size=512, dim=4.8, capacity=36864)
field = get_field("tsdf")
k = (240.6, 240.0, 160.0, 120.0)
depths, poses = synthetic.orbit_sequence(
    2, k, width=W, height=H, radius=1.44, center=(2.4,) * 3,
    sphere_radius=0.72, angle_span=0.1,
    room=((0.55,) * 3, (4.25,) * 3))
fn = functools.partial(
    pstep.frame_step, geom, field,
    frame_size=(W, H), iterations=(10, 5, 4),
    mu=0.1, icp_threshold=1e-5, neg_y=False, filter_input=False,
    use_gt_pose=False, integration_rate=1, tracking_rate=1)
state = pstep.init_frame_state(geom, field, (W, H), poses[0])
kj = jnp.asarray(k, jnp.float32)
t0 = time.time()
state, aux = fn(state, jnp.asarray(depths[0]), kj, jnp.int32(0))
jax.block_until_ready(state)
print(f"frame_step compile+run: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
state, aux = fn(state, jnp.asarray(depths[1]), kj, jnp.int32(1))
jax.block_until_ready(state)
print(f"steady frame: {(time.time() - t0) * 1e3:.1f} ms wall", flush=True)
