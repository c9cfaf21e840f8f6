"""Field-type registry (ref: SE_FIELD_TYPE compile switch,
se_denseslam/include/se/DenseSLAMSystem.h:52-56 — here a runtime choice).
"""

from supereight_tpu.fields.base import FieldSpec  # noqa: F401
from supereight_tpu.fields.tsdf import TSDF  # noqa: F401
from supereight_tpu.fields.ofusion import OFUSION  # noqa: F401

_REGISTRY = {"tsdf": TSDF, "sdf": TSDF, "ofusion": OFUSION,
             "occupancy": OFUSION}


def get_field(name: str) -> FieldSpec:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown field type {name!r}; expected one of {sorted(_REGISTRY)}")
