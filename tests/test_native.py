"""Native C++ components vs their Python twins."""
import os

import numpy as np
import pytest

from dodt_tpu import native
from dodt_tpu.eval import kitti_ap

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="native libs not built and toolchain unavailable")


def _random_scene(rng, n_frames=20):
    gts, dets = [], []
    for _ in range(n_frames):
        g = rng.randint(1, 6)
        boxes = np.stack([
            rng.uniform(-20, 20, g), np.full(g, 1.6),
            rng.uniform(5, 60, g), rng.uniform(3.2, 4.5, g),
            rng.uniform(1.5, 1.8, g), rng.uniform(1.3, 1.7, g),
            rng.uniform(-np.pi, np.pi, g)], axis=1)
        bbs = np.stack([rng.uniform(0, 800, g), rng.uniform(0, 200, g),
                        np.zeros(g), np.zeros(g)], axis=1)
        bbs[:, 2] = bbs[:, 0] + rng.uniform(40, 200, g)
        bbs[:, 3] = bbs[:, 1] + rng.uniform(30, 120, g)
        types = ["Car" if rng.rand() > 0.2 else "Van"
                 for _ in range(g)]
        gts.append(kitti_ap.FrameGt(
            boxes_3d=boxes, bbox_2d=bbs, types=types,
            occlusion=rng.randint(0, 3, g).astype(float),
            truncation=rng.uniform(0, 0.4, g),
            dontcare=np.zeros((0, 4))))
        # detections: jittered GT + a couple of FPs
        keep = rng.rand(g) > 0.15
        dboxes = boxes[keep] + rng.normal(0, 0.12, (keep.sum(), 7))
        dbbs = bbs[keep] + rng.normal(0, 3, (keep.sum(), 4))
        n_fp = rng.randint(0, 3)
        fp_boxes = np.stack([
            rng.uniform(-20, 20, n_fp), np.full(n_fp, 1.6),
            rng.uniform(5, 60, n_fp), np.full(n_fp, 3.9),
            np.full(n_fp, 1.6), np.full(n_fp, 1.5),
            rng.uniform(-np.pi, np.pi, n_fp)], axis=1)
        fp_bbs = np.stack([rng.uniform(0, 800, n_fp),
                           rng.uniform(0, 200, n_fp),
                           np.zeros(n_fp), np.zeros(n_fp)], axis=1)
        fp_bbs[:, 2] = fp_bbs[:, 0] + 80
        fp_bbs[:, 3] = fp_bbs[:, 1] + 60
        all_boxes = np.concatenate([dboxes, fp_boxes])
        all_bbs = np.concatenate([dbbs, fp_bbs])
        scores = rng.uniform(0.2, 1.0, len(all_boxes))
        dets.append(kitti_ap.FrameDet(
            boxes_3d=all_boxes, bbox_2d=all_bbs, scores=scores,
            types=["Car"] * len(all_boxes)))
    return gts, dets


def test_native_ap_matches_python():
    rng = np.random.RandomState(11)
    gts, dets = _random_scene(rng)
    for metric in ("image", "ground", "3d"):
        py = kitti_ap.evaluate_ap(gts, dets, "Car", metric, 0.5,
                                  use_native=False)
        cc = kitti_ap.evaluate_ap(gts, dets, "Car", metric, 0.5,
                                  use_native=True)
        for k in py:
            assert abs(py[k] - cc[k]) < 0.15, (metric, k, py[k], cc[k])


def test_native_loader_matches_python(tmp_path):
    from dodt_tpu.data import kitti, synthetic

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=2)
    base = os.path.join(root, "training")
    calib = kitti.read_tracking_calibration(
        os.path.join(base, "calib"), 0)
    path = os.path.join(base, "velodyne", "0000", "000000.bin")

    velo = kitti.read_lidar(os.path.join(base, "velodyne", "0000"),
                            "000000")[:, :3]
    cam = kitti.lidar_to_cam_frame(velo, calib)
    mask = kitti.filter_to_image_fov(cam, calib, (375, 1242))
    want = cam[mask]

    velo_to_rect = (calib.r0 @ np.vstack(
        [calib.velo_to_cam, [0, 0, 0, 1]])[:3])[:3]
    got = native.load_velodyne_cam(path, velo_to_rect, calib.p2,
                                   (375, 1242))
    assert abs(len(got) - len(want)) <= 2  # boundary-epsilon points
    # compare sorted point sets
    a = want[np.lexsort(want.T)][: len(got)]
    b = got[np.lexsort(got.T)][: len(want)]
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-3)
