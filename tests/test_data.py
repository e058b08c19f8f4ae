import os

import numpy as np
import pytest

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import kitti, synthetic, tracking


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_tracking"))
    synthetic.write_tracking_fixture(root, num_videos=2, num_frames=6,
                                     ego_speed=1.5)
    return root


@pytest.fixture(scope="module")
def dataset(fixture_root):
    cfg = cfg_mod.unittest_pipeline().dataset
    cfg = type(cfg)(**{**cfg.__dict__})
    cfg.dataset_dir = fixture_root
    cfg.kitti_utils.area_extents = ((-40.0, 40.0), (-3.0, 3.0), (0.0, 70.0))
    cfg.max_points = 8192
    cfg.video_train_ids = (0, 1)
    return tracking.KittiTrackingDataset(cfg, split="train")


def test_readers(fixture_root):
    base = os.path.join(fixture_root, "training")
    calib = kitti.read_tracking_calibration(
        os.path.join(base, "calib"), 0)
    assert calib.p2.shape == (3, 4)
    labels = kitti.read_tracking_labels(
        os.path.join(base, "label_02"), 0, frame=0)
    assert len(labels) >= 3
    assert (labels.track_ids >= 0).all()
    velo = kitti.read_lidar(os.path.join(base, "velodyne", "0000"),
                            "000000")
    assert velo.shape[1] == 4 and len(velo) > 1000
    # velo -> cam roundtrip
    cam = calib.velo_to_rect(velo[:, :3])
    back = calib.rect_to_velo(cam)
    np.testing.assert_allclose(back, velo[:, :3], atol=1e-4)


def test_couple_generation(dataset):
    # sliding couples for train: every frame has a couple
    assert len(dataset.couples) == 2 * 6
    last = dataset.couples[5]
    assert last.frame_a == 5 and last.frame_b == 5  # duplicated last frame


def test_load_couple_shapes(dataset):
    s = dataset.load_couple(0)
    assert s["points"].shape == (2, 8192, 3)
    assert s["image"].shape == (2, 90, 300, 3)
    assert s["gt_boxes"].shape[0] == 2
    assert s["gt_valid"][0].sum() >= 3
    assert s["corr_offsets"].shape[1] == 3


def test_ego_motion_compensation(fixture_root):
    """Ego drives +1.5 m/frame along velo x (east): a frame-B point must
    shift +1.5 m when expressed in frame-A velo coordinates."""
    base = os.path.join(fixture_root, "training")
    oxts_a = kitti.read_oxts(os.path.join(base, "oxts"), 0, 0)
    oxts_b = kitti.read_oxts(os.path.join(base, "oxts"), 0, 1)
    trans, matrix, dyaw = kitti.ego_motion(oxts_a, oxts_b)
    np.testing.assert_allclose(trans, [1.5, 0.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(matrix, np.eye(3), atol=1e-9)
    assert abs(dyaw) < 1e-9
    p_b = np.array([[10.0, 2.0, -1.0]])
    p_a = kitti.transform_points_to_prev_frame(p_b, trans, matrix)
    np.testing.assert_allclose(p_a, [[11.5, 2.0, -1.0]], atol=1e-3)


def test_static_objects_static_after_compensation(dataset):
    """A static-world car must appear at (nearly) the same frame-A
    coordinates whether observed at frame A or at frame B."""
    s = dataset.load_couple(0)
    scene = synthetic.SyntheticScene(0, 6, ego_speed=1.5)
    # slowest car is "most static"; offsets are exactly its velocity,
    # with no ego-motion leakage (checked in corr test); here verify the
    # transform put frame-B boxes into frame-A coords: z of matched pair
    # differs by ~vz, not by vz + ego_speed.
    vel = {c["id"]: c["vz"] for c in scene.cars}
    for i in range(len(s["corr_offsets"])):
        if s["gt_valid"][0][i] and s["corr_coexist"][i]:
            tid = int(s["gt_track_ids"][0][i])
            dz = s["corr_offsets"][i][1]
            assert abs(dz - vel[tid]) < 0.25
            assert abs(dz - (vel[tid] + 1.5)) > 0.5


def test_corr_offsets_match_motion(dataset):
    """GT corr offsets should equal per-car velocity (in frame-A coords,
    car motion only, ego motion compensated)."""
    s = dataset.load_couple(0)
    scene = synthetic.SyntheticScene(0, 6, ego_speed=1.5)
    vel = {c["id"]: (c["vx"], c["vz"]) for c in scene.cars}
    n_checked = 0
    for i in range(len(s["corr_offsets"])):
        if not s["gt_valid"][0][i] or not s["corr_coexist"][i]:
            continue
        tid = int(s["gt_track_ids"][0][i])
        dx, dz, dry = s["corr_offsets"][i]
        vx, vz = vel[tid]
        # label transform is corner-mean based; tolerance for roundtrip
        assert abs(dx - vx) < 0.25, (tid, dx, vx)
        assert abs(dz - vz) < 0.25, (tid, dz, vz)
        assert abs(dry) < 0.1
        n_checked += 1
    assert n_checked >= 2


def test_flip_augmentation(dataset):
    s0 = dataset.load_couple(0, augs=())
    s1 = dataset.load_couple(0, augs=("flipping",))
    va, vb = s0["gt_valid"][0], s1["gt_valid"][0]
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_allclose(s1["gt_boxes"][0][va][:, 0],
                               -s0["gt_boxes"][0][va][:, 0], atol=1e-5)
    # flipped corr offsets flip dx
    co = s0["corr_coexist"]
    np.testing.assert_allclose(s1["corr_offsets"][co][:, 0],
                               -s0["corr_offsets"][co][:, 0], atol=1e-5)


def test_batching(dataset):
    batch = dataset.next_batch(2, shuffle=False, augment=False)
    assert batch["points"].shape == (2, 2, 8192, 3)
    assert batch["gt_boxes"].shape[0] == 2
    assert len(batch["sample_name"]) == 2
