"""Metric-space volume facade.

Behavioral reference: VolumeTemplate
(se_denseslam/include/se/continuous/volume_template.hpp:49-115) — the
thin adaptor that scales between meters and voxel coordinates for
get/interp/grad so pipeline code never touches discrete indices.
"""

import dataclasses

import jax.numpy as jnp

from supereight_tpu.core import interp as interp_mod
from supereight_tpu.core import map as m
from supereight_tpu.fields.base import FieldSpec


@dataclasses.dataclass
class Volume:
    """Continuous view over (geom, state, field)."""
    geom: m.MapGeometry
    state: m.MapState
    field: FieldSpec

    @property
    def size(self) -> int:
        return self.geom.size

    @property
    def dim(self) -> float:
        return self.geom.dim

    def pos(self, voxel):
        """Voxel coords -> metric position (ref volume_template.hpp:63-66)."""
        return jnp.asarray(voxel, jnp.float32) * self.geom.voxel_size

    def get(self, pos_m):
        """Nearest-voxel fetch at metric positions [..., 3]
        (ref get -> get_fine, volume_template.hpp:76-83)."""
        v = (jnp.asarray(pos_m) * self.geom.inv_voxel_size).astype(jnp.int32)
        return m.get_voxel(self.geom, self.state, self.field, v)

    def interp(self, pos_m, channel=0):
        """Trilinear sample at metric positions (ref :88-93)."""
        p = jnp.asarray(pos_m) * self.geom.inv_voxel_size
        return interp_mod.interp(self.geom, self.state, self.field, p,
                                 channel)

    def grad(self, pos_m, channel=0):
        """Field gradient at metric positions (ref :95-101)."""
        p = jnp.asarray(pos_m) * self.geom.inv_voxel_size
        return interp_mod.grad(self.geom, self.state, self.field, p,
                               channel)
