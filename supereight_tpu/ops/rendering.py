"""Visualization render kernels (RGBA images).

Behavioral reference: renderDepthKernel / renderTrackKernel /
renderVolumeKernel (se_denseslam/src/rendering.cpp:111-283) and the
gray-to-rainbow map gs2rgb (commons.h:105-164).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from supereight_tpu import constants as C
from supereight_tpu.ops import raycast as raycast_mod

AMBIENT = np.array([0.1, 0.1, 0.1], np.float32)


def gs2rgb(d):
    """Scalar [0,1] -> rainbow rgb (ref gs2rgb, commons.h:105-164)."""
    v = jnp.clip(d, 0.0, 1.0) * 6.0
    sector = jnp.floor(v).astype(jnp.int32) % 6
    frac = v - jnp.floor(v)
    one = jnp.ones_like(frac)
    zero = jnp.zeros_like(frac)
    up, down = frac, 1.0 - frac
    # piecewise rainbow: R->Y->G->C->B->M
    rs = jnp.stack([one, down, zero, zero, up, one])
    gs = jnp.stack([up, one, one, down, zero, zero])
    bs = jnp.stack([zero, zero, up, one, one, down])
    idx = sector[None]
    r = jnp.take_along_axis(rs, idx, axis=0)[0]
    g = jnp.take_along_axis(gs, idx, axis=0)[0]
    b = jnp.take_along_axis(bs, idx, axis=0)[0]
    return jnp.stack([r, g, b], axis=-1)


@jax.jit
def render_depth(depth, near=C.NEAR_PLANE, far=C.FAR_PLANE):
    """Depth image -> RGBA (ref renderDepthKernel, rendering.cpp:111-152):
    white below near, black above far, rainbow in between."""
    d = (depth - near) / (far - near)
    rgb = (gs2rgb(d) * 255.0).astype(jnp.uint8)
    white = jnp.full_like(rgb, 255)
    black = jnp.zeros_like(rgb)
    rgb = jnp.where((depth < near)[..., None], white, rgb)
    rgb = jnp.where((depth > far)[..., None], black, rgb)
    alpha = jnp.zeros(depth.shape + (1,), jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


_TRACK_COLORS = np.array([
    [255, 128, 128],   # default / grey case fallthrough
    [128, 128, 128],   # 1: tracked ok
    [0, 0, 0],         # -1: no input
    [255, 0, 0],       # -2: not in image
    [0, 255, 0],       # -3: no correspondence
    [0, 0, 255],       # -4: too far
    [255, 255, 0],     # -5: wrong normal
], jnp.uint8)


@jax.jit
def render_track(result):
    """Tracking-status colours (ref renderTrackKernel, rendering.cpp:154-212,
    legend at DenseSLAMSystem.h:249-258)."""
    idx = jnp.select(
        [result == 1, result == -1, result == -2, result == -3,
         result == -4, result == -5],
        [1, 2, 3, 4, 5, 6], 0)
    rgb = jnp.asarray(_TRACK_COLORS)[idx]
    alpha = jnp.zeros(result.shape + (1,), jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


@functools.partial(jax.jit, static_argnames=("geom", "field", "frame_size",
                                             "reuse_maps"))
def render_volume(geom, state, field, view_pose, k, mu, frame_size,
                  light=None, vertex=None, normal=None, valid=None,
                  reuse_maps=False):
    """Diffuse-shaded surface render (ref renderVolumeKernel,
    rendering.cpp:214-283). When the view pose equals the raycast pose the
    reference reuses the tracking maps; pass reuse_maps=True with the maps
    for that path, otherwise a fresh raycast is traced at 2x far plane.
    """
    from supereight_tpu.core import se3

    if light is None:
        light = view_pose[:3, 3]
    if not reuse_maps:
        view = jnp.matmul(view_pose, se3.inverse_camera_matrix(k),
                          precision=jax.lax.Precision.HIGHEST)
        vertex, normal, valid = raycast_mod.raycast(
            geom, state, field, view, mu, frame_size,
            far=C.FAR_PLANE * 2.0)
    diff = vertex - light
    dn = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    diff = diff / jnp.where(dn == 0, 1.0, dn)
    shade = jnp.maximum(jnp.sum(normal * diff, axis=-1), 0.0)
    col = jnp.clip(shade[..., None] + AMBIENT, 0.0, 1.0) * 255.0
    col = jnp.where(valid[..., None], col, 0.0).astype(jnp.uint8)
    alpha = jnp.zeros(shade.shape + (1,), jnp.uint8)
    return jnp.concatenate([col, alpha], axis=-1)
