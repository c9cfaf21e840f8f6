"""Surface mesh extraction (marching cubes) + VTK/OBJ export.

Behavioral reference: se::algorithms::marching_cube
(se_core/include/se/algorithms/meshing.hpp:115-208) and the writers
writeVtkMesh / writeObjMesh (se_denseslam/include/se/commons.h:325,393).

Like the reference, meshing walks only allocated voxel blocks, skips any
cell with an unobserved corner (weight/timestamp y == 0,
meshing.hpp:131-138), and interpolates zero crossings along cell edges.
This is an offline export path (dump_mesh at end of run), so it runs
vectorized on the host over the downloaded block pool rather than on the
TPU.
"""

import numpy as np

from supereight_tpu.constants import BLOCK_SIDE
from supereight_tpu.io.mc_tables import (CORNER_OFFSETS, TRI_TABLE)


def _dense_from_blocks(geom, state):
    """Expand the allocated bricks into a dense (size^3) pair of arrays.

    Practical for the resolutions the reference ships (<= 512^3 ~ 1 GB);
    avoids per-cell pool lookups in the host path.
    """
    n = int(state.n_blocks)
    size = geom.size
    dense_x = np.full((size, size, size), np.float32(1.0))
    dense_y = np.zeros((size, size, size), np.float32)
    bx = np.asarray(state.data_x[:n]).reshape(n, BLOCK_SIDE, BLOCK_SIDE,
                                              BLOCK_SIDE)
    by = np.asarray(state.data_y[:n]).reshape(n, BLOCK_SIDE, BLOCK_SIDE,
                                              BLOCK_SIDE)
    # brick linear layout is x + 8y + 64z -> axes come out (z, y, x)
    bx = bx.transpose(0, 3, 2, 1)
    by = by.transpose(0, 3, 2, 1)
    coords = np.asarray(state.block_coord[:n]) * BLOCK_SIDE
    for i in range(n):
        x, y, z = coords[i]
        dense_x[x:x + 8, y:y + 8, z:z + 8] = bx[i]
        dense_y[x:x + 8, y:y + 8, z:z + 8] = by[i]
    return dense_x, dense_y


def marching_cubes(geom, state, inside=None):
    """Extract the zero-crossing surface as triangles [N, 3, 3] (meters).

    ``inside``: predicate on the x channel (default x < 0, the reference's
    dump_mesh lambda, DenseSLAMSystem.cpp:305-314).
    """
    dense_x, dense_y = _dense_from_blocks(geom, state)
    size = geom.size
    if inside is None:
        def inside(x):
            return x < 0.0

    # corner values for every cell, vectorized
    cx = np.empty((8,) + (size - 1,) * 3, np.float32)
    cy = np.empty_like(cx)
    for c, (dx, dy, dz) in enumerate(CORNER_OFFSETS):
        cx[c] = dense_x[dx:size - 1 + dx, dy:size - 1 + dy,
                        dz:size - 1 + dz]
        cy[c] = dense_y[dx:size - 1 + dx, dy:size - 1 + dy,
                        dz:size - 1 + dz]

    occupied = inside(cx)
    index = np.zeros((size - 1,) * 3, np.int32)
    for c in range(8):
        index |= occupied[c].astype(np.int32) << c
    observed = (cy != 0).all(axis=0)   # ref meshing.hpp:131-138
    cells = np.argwhere((index != 0) & (index != 255) & observed)
    if len(cells) == 0:
        return np.zeros((0, 3, 3), np.float32)

    ci = index[cells[:, 0], cells[:, 1], cells[:, 2]]
    tris_edges = TRI_TABLE[ci]                  # [M, 16]

    # zero-crossing vertex on each of the 12 edges of each cell
    # (ref interp_vertexes / compute_intersection, meshing.hpp:45-113)
    corner_vals = cx[:, cells[:, 0], cells[:, 1], cells[:, 2]]  # [8, M]
    edge_verts = np.zeros((12, len(cells), 3), np.float32)
    from supereight_tpu.io.mc_tables import CORNER_A, CORNER_B
    cell_pos = cells.astype(np.float32)
    for e in range(12):
        a, b = CORNER_A[e], CORNER_B[e]
        va = corner_vals[a]
        vb = corner_vals[b]
        denom = vb - va
        tpar = np.where(np.abs(denom) < 1e-12, 0.5, -va / np.where(
            np.abs(denom) < 1e-12, 1.0, denom))
        tpar = np.clip(tpar, 0.0, 1.0)
        pa = cell_pos + CORNER_OFFSETS[a]
        pb = cell_pos + CORNER_OFFSETS[b]
        edge_verts[e] = pa + tpar[:, None] * (pb - pa)

    out = []
    for t in range(5):
        cols = tris_edges[:, 3 * t:3 * t + 3]
        valid = cols[:, 0] >= 0
        if not valid.any():
            break
        rows = np.nonzero(valid)[0]
        tri = np.stack([edge_verts[cols[rows, k], rows] for k in range(3)],
                       axis=1)
        out.append(tri)
    tris = np.concatenate(out, axis=0)
    return tris * geom.voxel_size


def write_vtk(path, triangles):
    """Legacy-VTK polydata export (ref writeVtkMesh, commons.h:325).

    Uses the native writer when built (orders of magnitude faster for
    large meshes); falls back to Python."""
    from supereight_tpu.io import native
    if native.available() and native.write_vtk_native(path, triangles):
        return
    n = len(triangles)
    verts = triangles.reshape(-1, 3)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 1.0\n")
        f.write("vtk mesh generated from supereight-tpu\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {3 * n} FLOAT\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write(f"POLYGONS {n} {4 * n}\n")
        for i in range(n):
            f.write(f"3 {3 * i} {3 * i + 1} {3 * i + 2}\n")


def write_obj(path, triangles):
    """Wavefront OBJ export (ref writeObjMesh, commons.h:393)."""
    from supereight_tpu.io import native
    if native.available() and native.write_obj_native(path, triangles):
        return
    with open(path, "w") as f:
        f.write("# OBJ mesh generated from supereight-tpu\n")
        for tri in triangles:
            for v in tri:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        n = len(triangles)
        for i in range(n):
            f.write(f"f {3 * i + 1} {3 * i + 2} {3 * i + 3}\n")
