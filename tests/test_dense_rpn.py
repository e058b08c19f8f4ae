"""Dense (gather-free) RPN path vs the per-anchor gather path.

The dense lattice formulation must produce the same ROI features and
the same occupancy counts as crop_and_resize / bev_occupancy_counts
over the full production anchor grid geometry (scaled down here).
"""
import numpy as np
import jax.numpy as jnp

from dodt_tpu.ops import boxes as box_ops
from dodt_tpu.ops import dense_rpn
from dodt_tpu.ops.anchors import (bev_occupancy_counts, integral_image_2d,
                                  tile_anchors_3d)
from dodt_tpu.ops.projection import project_to_bev, reorder_boxes_yx
from dodt_tpu.ops.roi import crop_and_resize

AREA = ((-8.0, 8.0), (-5.0, 3.0), (0.0, 12.0))
STRIDES = (0.5, 0.5)
VOXEL = 0.1
BEV_SHAPE = (120, 160)          # rows = z extent/voxel, cols = x
SIZES = ((3.513, 1.581, 1.511), (4.234, 1.653, 1.546))
GP = np.array([0.0, -1.0, 0.0, 1.65], np.float32)


def _lattice(crop_size=3):
    return dense_rpn.build_bev_lattice(AREA, STRIDES, SIZES, BEV_SHAPE,
                                       VOXEL, crop_size)


def _anchors():
    boxes = tile_anchors_3d(np.asarray(AREA, np.float32), SIZES,
                            STRIDES, GP)
    return box_ops.box_3d_to_anchor(boxes)


def test_lattice_geometry():
    lat = _lattice()
    assert lat is not None
    assert lat.period == 5
    assert lat.nx == 32 and lat.nz == 24
    assert lat.n_cfg == 4
    anchors = _anchors()
    assert anchors.shape[0] == lat.nz * lat.nx * lat.n_cfg


def test_lattice_rejects_misaligned():
    assert dense_rpn.build_bev_lattice(
        AREA, (0.25, 0.25), SIZES, BEV_SHAPE, VOXEL, 3) is None
    assert dense_rpn.build_bev_lattice(
        AREA, STRIDES, SIZES, (119, 160), VOXEL, 3) is None


def test_dense_rois_match_gather():
    rng = np.random.RandomState(0)
    h, w = BEV_SHAPE
    fm = jnp.asarray(rng.rand(h, w, 2).astype(np.float32))
    lat = _lattice()
    anchors = _anchors()
    bev_extents = np.asarray([AREA[0], AREA[2]], np.float32)

    _, bev_norm = project_to_bev(anchors, bev_extents)
    want = np.array(crop_and_resize(fm, reorder_boxes_yx(bev_norm), 3))
    got = np.array(dense_rpn.dense_bev_rois(fm, lat))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dense_occupancy_match_gather():
    rng = np.random.RandomState(1)
    nxc = int((AREA[0][1] - AREA[0][0]) / VOXEL)
    nzc = int((AREA[2][1] - AREA[2][0]) / VOXEL)
    occ = (rng.rand(nxc, nzc) > 0.8).astype(np.float32)
    integral = integral_image_2d(jnp.asarray(occ))
    lat = _lattice()
    anchors = _anchors()
    bev_extents = np.asarray([AREA[0], AREA[2]], np.float32)

    want = np.array(bev_occupancy_counts(integral, anchors, bev_extents,
                                         VOXEL))
    got = np.array(dense_rpn.dense_occupancy_counts(integral, lat))
    np.testing.assert_array_equal(got, want)
