"""Marching-cubes tests: table invariants + sphere surface extraction."""

import jax.numpy as jnp
import numpy as np

from supereight_tpu.core import map as m
from supereight_tpu.fields import TSDF
from supereight_tpu.io import meshing
from supereight_tpu.io.mc_tables import (CORNER_A, CORNER_B, EDGE_TABLE,
                                         TRI_TABLE)


def test_table_invariants():
    assert (TRI_TABLE[0] == -1).all() and (TRI_TABLE[255] == -1).all()
    for i in range(256):
        inside = [(i >> c) & 1 for c in range(8)]
        used = TRI_TABLE[i][TRI_TABLE[i] >= 0]
        assert len(used) % 3 == 0
        for e in used:
            assert inside[CORNER_A[e]] != inside[CORNER_B[e]]
        assert EDGE_TABLE[i] == EDGE_TABLE[255 ^ i]


def _sphere_map(size=64, dim=2.0, radius=0.5):
    geom = m.MapGeometry(size=size, dim=dim, capacity=(size // 8) ** 3)
    state = m.make_map(geom, TSDF)
    b = geom.blocks_per_side
    state = m.allocate_blocks(geom, state, jnp.ones((b, b, b), bool))
    g = np.arange(size)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    center = (size / 2.0) * geom.voxel_size
    sdf = (np.linalg.norm(coords * geom.voxel_size - center, axis=-1)
           - radius)
    state = m.set_voxels(state, jnp.asarray(coords),
                         jnp.asarray(np.clip(sdf / 0.1, -1, 1),
                                     dtype=np.float32),
                         jnp.ones(len(coords)))
    return geom, state, center, radius


def test_sphere_mesh():
    geom, state, center, radius = _sphere_map()
    tris = meshing.marching_cubes(geom, state)
    assert len(tris) > 500
    # all vertices on the sphere within a voxel
    verts = tris.reshape(-1, 3)
    r = np.linalg.norm(verts - center, axis=-1)
    assert np.abs(r - radius).max() < 2 * geom.voxel_size
    # total area close to the analytic sphere area
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * radius ** 2, rtol=0.05)


def test_unobserved_cells_skipped():
    geom, state, _, _ = _sphere_map(size=32)
    # zero the weight channel -> nothing observed -> no mesh
    state = state._replace(data_y=jnp.zeros_like(state.data_y))
    tris = meshing.marching_cubes(geom, state)
    assert len(tris) == 0


def test_writers(tmp_path):
    geom, state, _, _ = _sphere_map(size=32)
    tris = meshing.marching_cubes(geom, state)
    vtk = tmp_path / "m.vtk"
    obj = tmp_path / "m.obj"
    meshing.write_vtk(str(vtk), tris)
    meshing.write_obj(str(obj), tris)
    assert vtk.read_text().startswith("# vtk DataFile")
    lines = obj.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 3 * len(tris)
    assert sum(1 for l in lines if l.startswith("f ")) == len(tris)


def test_meshing_512_scale():
    """Block-sparse marching cubes at the flagship 512^3 resolution
    (VERDICT r2 task 8): a ~5k-block sphere shell meshes in seconds with
    no dense size^3 intermediate (the chunked path peaks at ~130 MB)."""
    import time
    import numpy as np
    import jax.numpy as jnp
    from supereight_tpu.core import map as m
    from supereight_tpu.fields import get_field
    from supereight_tpu.io import meshing

    geom = m.MapGeometry(size=512, dim=4.8, capacity=16384)
    field = get_field("tsdf")
    state = m.make_map(geom, field)
    b = geom.blocks_per_side
    g = (np.arange(b) + 0.5) * 8 * geom.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c, r = 2.4, 1.0
    dist = np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - r
    half_diag = 4 * np.sqrt(3) * geom.voxel_size
    touched = jnp.asarray(np.abs(dist) < 2 * half_diag)
    state = m.allocate_blocks(geom, state, touched)
    n = int(state.n_blocks)
    assert n > 4000, n

    # fill allocated voxels with the analytic SDF (vectorized over pool)
    coords = np.asarray(state.block_coord[:n]) * 8
    lin = np.arange(512)
    lx, ly, lz = lin % 8, (lin // 8) % 8, lin // 64
    vx = (coords[:, 0, None] + lx) * geom.voxel_size
    vy = (coords[:, 1, None] + ly) * geom.voxel_size
    vz = (coords[:, 2, None] + lz) * geom.voxel_size
    sdf = (np.sqrt((vx - c) ** 2 + (vy - c) ** 2 + (vz - c) ** 2)
           - r).astype(np.float32)
    state = state._replace(
        data_x=state.data_x.at[:n].set(jnp.asarray(sdf)),
        data_y=state.data_y.at[:n].set(1.0))

    t0 = time.time()
    tris = meshing.marching_cubes(geom, state)
    dt = time.time() - t0
    assert len(tris) > 100_000
    # every vertex lies on the analytic sphere (sub-voxel accuracy)
    v = tris.reshape(-1, 3)
    d = np.abs(np.sqrt(((v - c) ** 2).sum(1)) - r)
    assert d.max() < geom.voxel_size, d.max()
    assert dt < 120, f"marching cubes too slow: {dt:.1f}s"
