"""Map snapshots (checkpoint / resume).

Behavioral reference: Octree::save/load (octree.hpp:897-950) +
se_serialise.hpp — the reference streams raw node/block structs and
rebuilds topology from morton codes on load. Here the pool is already
SoA, so a snapshot is the compacted arrays keyed by morton code; topology
(the dense slot grid and mip existence masks) is reconstructed from the
keys on load, preserving the reference's keys-imply-topology property.
"""

import numpy as np

from supereight_tpu.core import map as m
from supereight_tpu.fields import get_field

FORMAT_VERSION = 1


def save_map(path, geom, state, field):
    """Write a .npz snapshot of the allocated part of the map."""
    n = int(state.n_blocks)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        size=geom.size,
        dim=geom.dim,
        capacity=geom.capacity,
        field=field.name,
        n_blocks=n,
        keys=np.asarray(m.morton_keys(state))[:n],
        block_coord=np.asarray(state.block_coord)[:n],
        active=np.asarray(state.active)[:n],
        data_x=np.asarray(state.data_x)[:n],
        data_y=np.asarray(state.data_y)[:n],
        mip_x=np.asarray(state.mip_x[0]),
        mip_y=np.asarray(state.mip_y[0]),
        **{f"mipx_{i}": np.asarray(v) for i, v in enumerate(state.mip_x)},
        **{f"mipy_{i}": np.asarray(v) for i, v in enumerate(state.mip_y)},
        **{f"mipa_{i}": np.asarray(v) for i, v in enumerate(state.mip_alloc)},
    )


def load_map(path):
    """Load a snapshot; returns (geom, state, field)."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    geom = m.MapGeometry(size=int(z["size"]), dim=float(z["dim"]),
                         capacity=int(z["capacity"]))
    field = get_field(str(z["field"]))
    state = m.make_map(geom, field)
    n = int(z["n_blocks"])

    bc = np.asarray(z["block_coord"])
    b = geom.blocks_per_side
    slot = np.full((b, b, b), -1, np.int32)
    slot[bc[:, 0], bc[:, 1], bc[:, 2]] = np.arange(n, dtype=np.int32)

    data_x = np.array(state.data_x)
    data_y = np.array(state.data_y)
    data_x[:n] = z["data_x"]
    data_y[:n] = z["data_y"]
    active = np.zeros(geom.capacity, bool)
    active[:n] = z["active"]
    coords = np.zeros((geom.capacity, 3), np.int32)
    coords[:n] = bc

    nl = geom.num_levels
    state = state._replace(
        data_x=jnp.asarray(data_x), data_y=jnp.asarray(data_y),
        block_coord=jnp.asarray(coords), active=jnp.asarray(active),
        slot=jnp.asarray(slot), n_blocks=jnp.asarray(n, jnp.int32),
        mip_x=tuple(jnp.asarray(z[f"mipx_{i}"]) for i in range(nl)),
        mip_y=tuple(jnp.asarray(z[f"mipy_{i}"]) for i in range(nl)),
        mip_alloc=tuple(jnp.asarray(z[f"mipa_{i}"]) for i in range(nl)),
    )
    return geom, state, field
