import numpy as np
import jax.numpy as jnp
import pytest

import conftest
from dodt_tpu.ops import voxel, anchors


AREA = np.array([[-4.0, 4.0], [-5.0, 3.0], [0.0, 7.0]], np.float32)
VOXEL = 0.1
GP = np.array([0.0, -1.0, 0.0, 1.65], np.float32)  # ground at y = 1.65
H_LO, H_HI, N_SLICES = -0.2, 2.3, 5


def make_points(rng, n=4000):
    pts = np.stack([
        rng.uniform(-4.5, 4.5, n),
        rng.uniform(-1.0, 2.0, n),
        rng.uniform(-0.5, 7.5, n)], axis=1).astype(np.float32)
    return pts


def reference_bev(points):
    """Golden oracle via the reference's own numpy wavedata toolkit."""
    conftest.add_reference_path()
    from wavedata.tools.core.voxel_grid_2d import VoxelGrid2D
    from wavedata.tools.core import geometry_utils

    pc = points.T  # (3, N)

    def point_filter(lo, hi):
        x, y, z = pc
        in_area = ((x > AREA[0][0]) & (x < AREA[0][1]) &
                   (y > AREA[1][0]) & (y < AREA[1][1]) &
                   (z > AREA[2][0]) & (z < AREA[2][1]))
        dot = GP[0] * x + GP[1] * y + GP[2] * z + GP[3]
        return in_area & (dot < hi), in_area & (dot < lo)

    div = (H_HI - H_LO) / N_SLICES
    height_maps = []
    for s in range(N_SLICES):
        lo = H_LO + s * div
        hi = lo + div
        f_hi, f_lo = point_filter(lo, hi)
        mask = np.logical_xor(f_hi, f_lo)
        slice_pts = points[mask]
        nx = int(round((AREA[0][1] - AREA[0][0]) / VOXEL))
        nz = int(round((AREA[2][1] - AREA[2][0]) / VOXEL))
        hm = np.zeros((nx, nz))
        if len(slice_pts) > 1:
            vg = VoxelGrid2D()
            vg.voxelize_2d(slice_pts, VOXEL, extents=AREA,
                           ground_plane=GP, create_leaf_layout=False)
            vi = vg.voxel_indices[:, [0, 2]]
            hm[vi[:, 0], vi[:, 1]] = (vg.heights - lo) / div
        height_maps.append(np.flip(hm.transpose(), axis=0))

    f_hi, f_lo = point_filter(H_LO, H_HI)
    mask = np.logical_xor(f_hi, f_lo)
    dens_pts = points[mask]
    vg = VoxelGrid2D()
    vg.voxelize_2d(dens_pts, VOXEL, extents=AREA, ground_plane=GP,
                   create_leaf_layout=False)
    vi = vg.voxel_indices[:, [0, 2]]
    nx = int(round((AREA[0][1] - AREA[0][0]) / VOXEL))
    nz = int(round((AREA[2][1] - AREA[2][0]) / VOXEL))
    dm = np.zeros((nx, nz))
    dm[vi[:, 0], vi[:, 1]] = np.minimum(
        1.0, np.log(vg.num_pts_in_voxel + 1) / np.log(16))
    density = np.flip(dm.transpose(), axis=0)
    return height_maps, density


@pytest.mark.skipif(not conftest.reference_available(),
                    reason="reference wavedata not present")
def test_bev_maps_match_reference():
    rng = np.random.RandomState(7)
    pts = make_points(rng)
    ref_heights, ref_density = reference_bev(pts)

    out = voxel.bev_maps_from_points(
        jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(GP),
        AREA, VOXEL, H_LO, H_HI, N_SLICES)
    feats = np.array(out.features)
    assert feats.shape == (70, 80, 6)
    # The reference picks the first point of the lowest DISCRETIZED y bin
    # per cell (voxel_grid_2d.py lexsorts floor(y/vs)), so its "max
    # height" can be up to voxel_size below the true max that our
    # scatter-max computes. Bound per-cell error by vs/slice_div and
    # require >=99.9% exact cells.
    div = (H_HI - H_LO) / N_SLICES
    for s in range(N_SLICES):
        diff = np.abs(feats[:, :, s] - ref_heights[s])
        assert diff.max() <= VOXEL / div + 1e-4, f"slice {s}: {diff.max()}"
        assert (diff < 1e-4).mean() > 0.999, f"slice {s}"
        # ours should never be LOWER than the reference height
        assert (feats[:, :, s] - ref_heights[s]).min() > -1e-4
    np.testing.assert_allclose(feats[:, :, 5], ref_density, atol=1e-4)


def test_bev_padded_points_ignored():
    rng = np.random.RandomState(8)
    pts = make_points(rng, 500)
    valid = np.ones(1000, bool)
    valid[500:] = False
    padded = np.concatenate([pts, np.zeros((500, 3), np.float32)])
    a = voxel.bev_maps_from_points(
        jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(GP),
        AREA, VOXEL, H_LO, H_HI, N_SLICES)
    b = voxel.bev_maps_from_points(
        jnp.asarray(pts), jnp.ones(500, bool), jnp.asarray(GP),
        AREA, VOXEL, H_LO, H_HI, N_SLICES)
    np.testing.assert_allclose(np.array(a.features), np.array(b.features))
    np.testing.assert_allclose(np.array(a.occupancy), np.array(b.occupancy))


def test_occupancy_and_anchor_filter():
    # one point cluster near (1, ground, 3); anchors on/off the cluster
    pts = np.array([[1.0, 1.0, 3.0], [1.05, 1.2, 3.05]], np.float32)
    out = voxel.bev_maps_from_points(
        jnp.asarray(pts), jnp.ones(2, bool), jnp.asarray(GP),
        AREA, VOXEL, H_LO, H_HI, N_SLICES)
    integral = anchors.integral_image_2d(out.occupancy)
    test_anchors = jnp.array([
        [1.0, 1.0, 3.0, 1.0, 1.5, 1.0],   # covers the cluster
        [-3.0, 1.0, 6.0, 1.0, 1.5, 1.0],  # empty area
    ])
    bev_extents = [[AREA[0][0], AREA[0][1]], [AREA[2][0], AREA[2][1]]]
    mask = np.array(anchors.empty_anchor_mask(
        integral, test_anchors, bev_extents, VOXEL))
    assert mask[0] and not mask[1]


def test_integral_3d_query():
    rng = np.random.RandomState(9)
    grid = rng.randint(0, 3, (10, 8, 12)).astype(np.float32)
    integral = anchors.integral_image_3d(jnp.asarray(grid))
    lo = jnp.array([[2, 1, 3], [0, 0, 0]])
    hi = jnp.array([[7, 5, 9], [10, 8, 12]])
    got = np.array(anchors.query_integral_3d(integral, lo, hi))
    np.testing.assert_allclose(got[0], grid[2:7, 1:5, 3:9].sum())
    np.testing.assert_allclose(got[1], grid.sum())
