from supereight_tpu.core.map import MapGeometry, MapState, make_map  # noqa: F401
