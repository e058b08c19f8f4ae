"""Real-data smoke signal: load the reference's miniature REAL KITTI
tracking fixture (3 genuine KITTI videos checked into the reference at
avod/tests/datasets/Kitti/tracking — real images, velodyne scans, oxts,
labels) through our reader stack, cross-check the parsed values against
the reference's own numpy wavedata readers, and run real train steps.

This closes the "synthetic-only fixtures" gap: the reader/ego-motion/
BEV pipeline is exercised on actual sensor data with the AVOD-era
directory naming (image_2/label_2), and the model consumes a real batch.
"""
import os

import numpy as np
import pytest

import conftest
from dodt_tpu import config as cfg_mod
from dodt_tpu.data import kitti, tracking

FIXTURE = "/root/reference/avod/tests/datasets/Kitti/tracking"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="reference fixture not mounted")

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def cfg():
    c = cfg_mod.unittest_pipeline()
    c.dataset.dataset_dir = FIXTURE
    c.dataset.kitti_utils.area_extents = (
        (-40.0, 40.0), (-3.0, 3.0), (0.0, 70.0))
    c.dataset.kitti_utils.anchor_strides = (2.0, 2.0)
    c.dataset.kitti_utils.voxel_size = 0.2
    c.dataset.max_points = 16384
    c.dataset.video_train_ids = (0, 1, 2)
    return c


@pytest.fixture(scope="module")
def dataset(cfg):
    return tracking.KittiTrackingDataset(cfg.dataset, split="train")


def test_couples_from_real_split(dataset):
    # videos 0/1 have 10 frames, video 2 has 20: sliding couples with
    # last-frame duplication -> one couple per frame
    assert len(dataset.couples) == 40
    videos = {c.video_id for c in dataset.couples}
    assert videos == {0, 1, 2}
    # video 0002's frames start at 31, not 0
    v2 = [c for c in dataset.couples if c.video_id == 2]
    assert min(c.frame_a for c in v2) == 31


def test_calib_matches_wavedata(dataset):
    conftest.add_reference_path()
    from wavedata.tools.core import calib_utils

    for vid in (0, 1, 2):
        ours = dataset.calib(vid)
        ref = calib_utils.read_tracking_calibration(
            os.path.join(FIXTURE, "training", "calib"), vid)
        np.testing.assert_allclose(ours.p2, ref.p2, rtol=1e-6)
        np.testing.assert_allclose(ours.r0, ref.r0_rect, rtol=1e-6)
        np.testing.assert_allclose(ours.velo_to_cam, ref.tr_velodyne_to_cam,
                                   rtol=1e-6)


def test_labels_match_wavedata(dataset):
    conftest.add_reference_path()
    from wavedata.tools.obj_detection import tracking_utils

    checked = 0
    for vid, frame in ((0, 0), (0, 5), (1, 3), (2, 35)):
        ref = tracking_utils.read_labels(
            os.path.join(FIXTURE, "training", "label_2"),
            "%02d%04d" % (vid, frame)) or []
        ref_cars = [o for o in ref if o.type == "Car"]
        ours = dataset.labels(vid, frame)
        assert len(ours) == len(ref_cars), (vid, frame)
        if not len(ours):
            continue
        order = np.argsort(ours.box_3d[:, 0])
        ref_x = np.sort([o.t[0] for o in ref_cars])
        np.testing.assert_allclose(ours.box_3d[order, 0], ref_x,
                                   atol=1e-5)
        # l, w, h columns and track ids
        ref_sorted = sorted(ref_cars, key=lambda o: o.t[0])
        np.testing.assert_allclose(
            ours.box_3d[order, 3:6],
            [[o.l, o.w, o.h] for o in ref_sorted], atol=1e-5)
        assert set(ours.track_ids) == {o.object_id for o in ref_cars}
        checked += len(ours)
    assert checked >= 5


def test_lidar_matches_wavedata(dataset):
    conftest.add_reference_path()
    from wavedata.tools.core import calib_utils

    x, y, z, i = calib_utils.read_lidar(
        os.path.join(FIXTURE, "training", "velodyne", "0000"), 0)
    velo_ref = np.stack([x, y, z, i], axis=1)
    velo_ours = kitti.read_lidar(
        os.path.join(FIXTURE, "training", "velodyne", "0000"), "000000")
    assert velo_ours.shape == velo_ref.shape
    np.testing.assert_allclose(velo_ours, velo_ref)


def test_ground_plane_sane_on_real_tracking_planes(dataset):
    """KITTI tracking planes files use a broken convention (ground
    above the camera after normalization); the reference hardcodes
    [0,-1,0,1.65] for tracking (obj_utils.get_road_plane:301). Our
    reader must detect the bogus files and fall back — a wrong plane
    empties every BEV height slice and silently kills all anchors
    (this was a real 0-AP bug on this fixture)."""
    for vid, frame in ((0, 0), (1, 0), (2, 41)):
        gp = dataset.ground_plane(vid, frame)
        assert gp[1] < 0          # normal points up (y-down frame)
        assert gp[3] > 0.5        # ground well below the camera


def test_load_couple_real_scene(dataset, cfg):
    # couple 10 = video 0001 frames (0, 1): 7 Cars in every frame
    s = dataset.load_couple(10)
    p = cfg.dataset.max_points
    assert s["points"].shape == (2, p, 3)
    assert s["points_valid"].any()
    assert np.isfinite(s["points"][s["points_valid"]]).all()
    # real KITTI city scene: both frames carry cars
    assert s["gt_valid"][0].sum() >= 1
    assert s["gt_valid"][1].sum() >= 1
    # image was resized to the configured shape and is a real photo
    # (non-constant)
    assert s["image"].shape[1:3] == cfg.dataset.image_shape
    assert s["image"].std() > 10.0
    assert tuple(s["orig_image_shape"]) == (375, 1242)


def test_train_steps_on_real_data(dataset, cfg, tmp_path):
    from dodt_tpu.models import dt_avod
    from dodt_tpu.runtime.trainer import Trainer

    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    trainer = Trainer(cfg, model, dataset, str(tmp_path / "ckpt"),
                      batch_size=1)
    state, history = trainer.train(max_steps=2, log_every=1)
    assert all(np.isfinite(h["total"]) for h in history)
    assert any(h["rpn_cls"] > 0 for h in history)
