"""Round-5 gates: OFusion temporal decay semantics (reference
applyWindow, bfusion/mapping_impl.hpp:150-155) exercised unit-level and
end-to-end, and the documented coarse-positive raycast deviation
(ops/raycast.py build_nav: positive coarse octants read UNKNOWN in the
nav payload) pinned and shown benign for surfaces inside blocks
(VERDICT r4 weak #6 / r3 weak #7)."""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.constants import CAPITAL_T
from supereight_tpu.core.map import MapGeometry, make_map, allocate_blocks
from supereight_tpu.fields import get_field, ofusion
from supereight_tpu.ops import allocation, integration, raycast


# ---------------------------------------------------------------------------
# apply_window unit semantics (mapping_impl.hpp:150-155)
# ---------------------------------------------------------------------------

def test_apply_window_matches_reference_closed_form():
    """fraction = 1 / (1 + delta_t / tau), floored at 0.5, times the
    prior log-odds (applyWindow, bfusion/mapping_impl.hpp:150-155)."""
    occ = jnp.asarray([8.0, -6.0, 1000.0])
    # delta_t = 0: no decay
    np.testing.assert_allclose(ofusion.apply_window(occ, 0.0), occ)
    # delta_t = tau: fraction exactly 1/2 (the floor boundary)
    np.testing.assert_allclose(ofusion.apply_window(occ, CAPITAL_T),
                               0.5 * occ)
    # delta_t = tau/3: fraction 3/4, above the floor
    np.testing.assert_allclose(ofusion.apply_window(occ, CAPITAL_T / 3.0),
                               0.75 * occ, rtol=1e-6)
    # delta_t >> tau: floored at 0.5 (never decays below half)
    np.testing.assert_allclose(ofusion.apply_window(occ, 100.0 * CAPITAL_T),
                               0.5 * occ)
    assert CAPITAL_T == 4.0  # volume_traits.hpp:79


def test_update_applies_decay_before_accumulating_and_stamps_time():
    """bfusion_update order (mapping_impl.hpp:170-179): decay the prior
    by the time since ITS timestamp, then accumulate the new sample's
    log2-odds, then stamp y = timestamp. Verified against a scalar
    numpy model."""
    old_x = jnp.asarray([10.0])
    old_y = jnp.asarray([1.0])          # last updated at t = 1
    t_now = 1.0 + 2.0 * CAPITAL_T       # delta_t = 2 tau -> floor 0.5
    z = 1.0
    depth = jnp.asarray([1.3])          # sample well in front: free obs
    pos_cam = (jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([z]))
    voxel = 0.0125
    new_x, new_y, wrote = ofusion.update(
        old_x, old_y, pos_cam, depth, 0.008, t_now, voxel,
        jnp.asarray([True]))
    sigma = np.clip(0.008 * z * z, 2 * voxel, 0.05)
    diff = (z - 1.3) * 1.0
    s = np.clip(float(ofusion.H(jnp.asarray(diff / sigma))), 0.03, 0.97)
    want = 10.0 * 0.5 + np.log2(s / (1 - s))
    np.testing.assert_allclose(float(new_x[0]), want, rtol=1e-5)
    assert float(new_y[0]) == t_now
    assert bool(wrote[0])
    # sample == 0.5 (diff outside the sensor support) -> no write, no
    # decay, timestamp untouched (the `sample == 0.5f` early-out)
    far_behind = jnp.asarray([z - 10.0])   # diff = +10 m >> 6 sigma
    nx2, ny2, w2 = ofusion.update(
        old_x, old_y, pos_cam, far_behind, 0.008, t_now, voxel,
        jnp.asarray([True]))
    assert float(nx2[0]) == 10.0 and float(ny2[0]) == 1.0
    assert not bool(w2[0])


# ---------------------------------------------------------------------------
# end-to-end: revisiting decayed space
# ---------------------------------------------------------------------------

W, H = 64, 48
K = (48.0, 48.0, 32.0, 24.0)
MU = 0.008


def _flat_wall_run(gap):
    """Observe a frontal wall at depth 1.0 for 4 frames, then re-observe
    the scene with the wall moved to depth 2.0, starting ``gap`` seconds
    later. Returns the number of contradicting frames needed before a
    central raycast hits the NEW wall (i.e. the old one has decayed /
    been pushed below the surface boundary)."""
    geom = MapGeometry(size=256, dim=3.2, capacity=2048)
    field = get_field("ofusion")
    m = make_map(geom, field)
    cam = (1.6, 1.6, 0.2)
    pose = jnp.asarray(
        [[1, 0, 0, cam[0]], [0, 1, 0, cam[1]], [0, 0, 1, cam[2]],
         [0, 0, 0, 1]], jnp.float32)
    kj = jnp.asarray(K, jnp.float32)
    near = jnp.full((H, W), 1.0, jnp.float32)
    far = jnp.full((H, W), 2.0, jnp.float32)
    t = 0.0
    for _ in range(4):
        m = allocation.allocate_ofusion(geom, m, near, pose, kj, MU)
        m = integration.integrate(geom, m, field, near, pose, kj, MU, t,
                                  (W, H))
        t += 1.0 / 30.0
    t += gap

    origin = jnp.asarray(cam, jnp.float32)
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    for i in range(1, 9):
        m = allocation.allocate_ofusion(geom, m, far, pose, kj, MU)
        m = integration.integrate(geom, m, field, far, pose, kj, MU, t,
                                  (W, H))
        t += 1.0 / 30.0
        vx, vy, vz, *_, hit, ok, _ = raycast.raycast_rays(
            geom, field, origin, zero, zero, one, MU, state=m)
        if bool(hit[0]) and float(vz[0]) > cam[2] + 1.5:
            return i
    return 99


def test_decayed_wall_flips_faster_than_fresh():
    """A surface revisited after a long absence (delta_t >> CAPITAL_T)
    halves its log-odds on the first contradicting update, so it is
    carved out in strictly fewer frames than an immediately
    re-observed one — the observable effect of applyWindow; and the
    raycast then correctly re-enters the decayed space and lands on
    the new surface behind it."""
    flips_decayed = _flat_wall_run(gap=10.0 * CAPITAL_T)
    flips_fresh = _flat_wall_run(gap=0.0)
    assert flips_decayed < flips_fresh <= 8, (flips_decayed, flips_fresh)


# ---------------------------------------------------------------------------
# coarse-positive nav payload deviation (ops/raycast.py build_nav)
# ---------------------------------------------------------------------------

def _corridor(geom, field, surf_z_block):
    """Free corridor of blocks along +z at block column (0, 0) with a
    positive-occupancy wall at block z = surf_z_block (same fixture as
    test_round4)."""
    m = make_map(geom, field)
    b = geom.blocks_per_side
    touched = np.zeros((b, b, b), bool)
    touched[0, 0, :] = True
    m = allocate_blocks(geom, m, jnp.asarray(touched))
    n = int(m.n_blocks)
    data_x = np.zeros((geom.capacity, 512), np.float32)
    data_y = np.zeros((geom.capacity, 512), np.float32)
    data_x[:n] = -1.0
    data_y[:n] = 1.0
    bc = np.asarray(m.block_coord[:n])
    data_x[:n][bc[:, 2] == surf_z_block] = 2.0
    return m._replace(data_x=jnp.asarray(data_x),
                      data_y=jnp.asarray(data_y))


def _with_mip1(m, value):
    """Give every level-1 octant NEXT to the corridor (block columns
    x=2..3, y=0..1 -> octant (1, 0, *)) an existing coarse value."""
    mx = np.zeros(np.asarray(m.mip_x[1]).shape, np.float32)
    my = np.zeros_like(mx)
    al = np.zeros(mx.shape, bool)
    mx[1, 0, :] = value
    my[1, 0, :] = 1.0
    al[1, 0, :] = True
    mips_x = list(m.mip_x)
    mips_y = list(m.mip_y)
    mips_a = list(m.mip_alloc)
    mips_x[1] = jnp.asarray(mx)
    mips_y[1] = jnp.asarray(my)
    mips_a[1] = jnp.asarray(al)
    return m._replace(mip_x=tuple(mips_x), mip_y=tuple(mips_y),
                      mip_alloc=tuple(mips_a))


def test_coarse_positive_octants_read_unknown_in_nav():
    """build_nav packs coarse FREE space as known (bit 3 + quantized
    value) but leaves coarse POSITIVE octants unknown — the documented
    deviation (a crossing can only happen inside the allocated surface-
    band blocks, so skipping it is safe). Pin both encodings."""
    geom = MapGeometry(size=256, dim=2.0, capacity=64)
    field = get_field("ofusion")
    m = _corridor(geom, field, 30)
    b = geom.blocks_per_side

    for val, expect_known in ((-3.0, True), (3.0, False)):
        nav = np.asarray(raycast.build_nav(
            geom, _with_mip1(m, val), field)).reshape(b, b, b)
        # a block cell inside the level-1 octant (1, 0, z=4) = blocks
        # (2..3, 0..1, 8..9); pick (2, 1, 8), away from the corridor
        e = -int(nav[2, 1, 8]) - 1
        assert e >= 0  # unallocated cell
        assert bool((e >> 3) & 1) == expect_known
        if expect_known:
            np.testing.assert_allclose(-(e >> 4) / 16.0, val, atol=1 / 16)


def test_raycast_hit_unaffected_by_coarse_positive_neighbours():
    """Rays marching the corridor must land on the wall at the same
    position whether the nearby coarse octants are positive (read as
    UNKNOWN -> distance-jumped) or free (read as known free-space) —
    i.e. the deviation never moves a surface that lives inside blocks,
    which is where the occupancy allocator always puts surfaces
    (bfusion/alloc_impl.hpp:75-95)."""
    geom = MapGeometry(size=256, dim=2.0, capacity=64)
    field = get_field("ofusion")
    surf = 30
    base = _corridor(geom, field, surf)

    n = 16
    origin = jnp.asarray([0.031, 0.031, 0.02], jnp.float32)
    rng = np.random.default_rng(1)
    jx = rng.uniform(-0.004, 0.004, n).astype(np.float32)
    jy = rng.uniform(-0.004, 0.004, n).astype(np.float32)
    nz = np.sqrt(jx * jx + jy * jy + 1.0)
    dx, dy, dz = (jnp.asarray(jx / nz), jnp.asarray(jy / nz),
                  jnp.asarray(1.0 / nz))

    hits = {}
    for val in (3.0, -3.0):
        m = _with_mip1(base, val)
        vx, vy, vz, *_ , hit, ok, overflow = raycast.raycast_rays(
            geom, field, origin, dx, dy, dz, MU, state=m)
        assert bool(np.asarray(hit).all())
        assert int(overflow) == 0
        hits[val] = np.asarray(vz)
    np.testing.assert_allclose(hits[3.0], hits[-3.0], atol=1e-6)
    z_expect = surf * 8 * geom.voxel_size
    np.testing.assert_allclose(hits[3.0], z_expect,
                               atol=2.5 * geom.voxel_size)


# ---------------------------------------------------------------------------
# noise-grade levers (VERDICT r4 weak #3)
# ---------------------------------------------------------------------------

def test_median_filter_kills_spikes_keeps_edges():
    """3x3 median: removes range spikes/mm quantization without the edge
    blur that made the reference's bilateral WORSE at fine voxel pitch
    (EVAL.md noise note); invalid pixels stay invalid and never drag
    neighbours."""
    from supereight_tpu.ops import preprocess
    d = np.full((10, 12), 2.0, np.float32)
    d[:, 6:] = 1.0
    d[3, 2] = 2.5
    d[5, 5] = 0.0
    out = np.asarray(preprocess.median_filter3(jnp.asarray(d)))
    assert out[3, 2] == 2.0
    assert out[5, 5] == 0.0
    assert (out[:, :5] == 2.0).all() and (out[:, 7:] == 1.0).all()


def test_noise_weighted_fusion_downweights_far_samples():
    """noise_weighted TSDF fusion: w = clamp((Z0/z)^2, 1/16, 1) per
    sample (constant 1 = reference parity, mapping_impl.hpp:50-57)."""
    from supereight_tpu.fields import tsdf
    ox = jnp.zeros((4,))
    pz = jnp.asarray([1.0, 1.5, 3.0, 6.0])
    dep = pz + 0.05
    _, y_ref, _ = tsdf.update(jnp.zeros(4), jnp.zeros(4), (ox, ox, pz),
                              dep, 0.1, jnp.ones(4, bool))
    x_w, y_w, _ = tsdf.update(jnp.zeros(4), jnp.zeros(4), (ox, ox, pz),
                              dep, 0.1, jnp.ones(4, bool),
                              noise_weighted=True)
    np.testing.assert_allclose(np.asarray(y_ref), 1.0)
    np.testing.assert_allclose(np.asarray(y_w), [1.0, 1.0, 0.25, 1 / 16.0])
    # first-write value is weight-independent (w cancels at y == 0)
    x_ref, _, _ = tsdf.update(jnp.zeros(4), jnp.zeros(4), (ox, ox, pz),
                              dep, 0.1, jnp.ones(4, bool))
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_ref))


def test_alloc_budget_parameter_bounds_new_blocks():
    """allocate_blocks(budget=): the per-frame new-block bound is now a
    parameter (noisy scenes grow it, mirroring the reference's
    allocate-everything, octree.hpp:792-817); overflow is counted."""
    geom = MapGeometry(size=64, dim=2.0, capacity=512)
    m = make_map(geom, get_field("tsdf"))
    t = np.zeros((8, 8, 8), bool)
    t[:4] = True
    m2, s2 = allocate_blocks(geom, m, jnp.asarray(t), with_stats=True,
                             budget=64)
    assert int(m2.n_blocks) == 64 and int(s2["alloc_overflow"]) == 192
    m3, s3 = allocate_blocks(geom, m, jnp.asarray(t), with_stats=True,
                             budget=512)
    assert int(m3.n_blocks) == 256 and int(s3["alloc_overflow"]) == 0
