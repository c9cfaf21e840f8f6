"""Field-type plugin point.

The reference specializes ``voxel_traits<T>`` per field
(ref: se_core/include/se/voxel_traits.hpp:36-37 and
se_denseslam/include/se/volume_traits.hpp:41-72). Here a field is a small
static descriptor consumed by the map / integration / raycast modules.
Voxel payload is two f32 channels (x, y):
  TSDF:    x = signed distance in [-1, 1],  y = fusion weight
  OFusion: x = log-odds occupancy,          y = last-update timestamp
"""

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a voxel field type (hashable, jit-static)."""

    name: str
    # Value a freshly allocated voxel holds (ref initValue()).
    init: Tuple[float, float]
    # Value reported for *unallocated* space by stencil gathers (ref empty()).
    empty: Tuple[float, float]
    # Whether integration marches the full camera->surface ray and fuses at
    # multiple octree scales (OFusion) or only a band around the surface (TSDF).
    multiscale_alloc: bool
    # Whether raycast surface normals point opposite the field gradient.
    invert_normals: bool

    def __hash__(self):
        return hash((self.name, self.init, self.empty,
                     self.multiscale_alloc, self.invert_normals))
