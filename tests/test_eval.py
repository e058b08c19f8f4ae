import numpy as np

from dodt_tpu.eval import kitti_ap, kitti_writer
from dodt_tpu.data.kitti import FrameCalib


def make_gt(boxes_3d, bboxes, types=None):
    n = len(boxes_3d)
    return kitti_ap.FrameGt(
        boxes_3d=np.asarray(boxes_3d, float),
        bbox_2d=np.asarray(bboxes, float),
        types=types or ["Car"] * n,
        occlusion=np.zeros(n), truncation=np.zeros(n),
        dontcare=np.zeros((0, 4)))


def make_det(boxes_3d, bboxes, scores, types=None):
    return kitti_ap.FrameDet(
        boxes_3d=np.asarray(boxes_3d, float),
        bbox_2d=np.asarray(bboxes, float),
        scores=np.asarray(scores, float),
        types=types or ["Car"] * len(scores))


BOX = [0.0, 1.6, 10.0, 3.9, 1.6, 1.5, 0.1]
BOX2 = [5.0, 1.6, 20.0, 3.9, 1.6, 1.5, -0.5]
BB = [100, 100, 200, 180]   # 80px high -> easy
BB2 = [300, 100, 380, 170]


def test_perfect_detection_ap_100():
    # Official 41-point protocol needs >= 41 valid GT for recall
    # coverage (unfilled recall points average in as zero, matching
    # evaluate_object_3d_offline.cpp).
    rng = np.random.RandomState(0)
    gts, dets = [], []
    for _ in range(30):
        gts.append(make_gt([BOX, BOX2], [BB, BB2]))
        dets.append(make_det([BOX, BOX2], [BB, BB2],
                             rng.uniform(0.5, 1.0, 2)))
    for metric in ("image", "ground", "3d"):
        ap = kitti_ap.evaluate_ap(gts, dets, "Car", metric, 0.7)
        assert ap["easy"] > 95.0, (metric, ap)
        assert ap["moderate"] > 95.0


def test_no_detections_ap_0():
    gts = [make_gt([BOX], [BB])]
    dets = [make_det(np.zeros((0, 7)), np.zeros((0, 4)), [])]
    ap = kitti_ap.evaluate_ap(gts, dets, "Car", "3d", 0.7)
    assert ap["easy"] == 0.0


def test_false_positives_reduce_ap():
    gts = [make_gt([BOX], [BB]) for _ in range(4)]
    far = [50.0, 1.6, 60.0, 3.9, 1.6, 1.5, 0.0]
    # FPs score HIGHER than the TPs -> precision at every recall < 1
    dets = [make_det([BOX, far], [BB, [400, 100, 460, 160]],
                     [0.6, 0.95]) for _ in range(4)]
    ap = kitti_ap.evaluate_ap(gts, dets, "Car", "3d", 0.7)
    ap_clean = kitti_ap.evaluate_ap(
        gts, [make_det([BOX], [BB], [0.6])] * 4, "Car", "3d", 0.7)
    assert ap["easy"] < ap_clean["easy"]


def test_van_ignored_for_car():
    rng = np.random.RandomState(1)
    gts, dets = [], []
    for _ in range(50):
        gts.append(make_gt([BOX, BOX2], [BB, BB2],
                           types=["Car", "Van"]))
        # detection on the Van scores high: must be absorbed (not FP)
        dets.append(make_det([BOX, BOX2], [BB, BB2],
                             [rng.uniform(0.3, 0.7), 0.95]))
    ap = kitti_ap.evaluate_ap(gts, dets, "Car", "3d", 0.7)
    assert ap["easy"] > 95.0, ap


def test_hard_gt_ignored_in_easy():
    # 30px-high box: moderate/hard only
    rng = np.random.RandomState(2)
    small_bb = [100, 100, 140, 130]
    gts, dets = [], []
    for _ in range(50):
        gts.append(make_gt([BOX, BOX2], [BB, small_bb]))
        dets.append(make_det([BOX], [BB], [rng.uniform(0.3, 0.9)]))
    ap = kitti_ap.evaluate_ap(gts, dets, "Car", "image", 0.7)
    assert ap["easy"] > 95.0, ap   # small gt ignored at easy
    assert ap["moderate"] < 60.0   # counted (and missed) at moderate


def test_writer_format():
    calib = FrameCalib(
        p2=np.array([[700.0, 0, 600, 0], [0, 700, 180, 0],
                     [0, 0, 1, 0]], np.float32),
        r0=np.eye(3, dtype=np.float32),
        velo_to_cam=np.hstack([np.eye(3), np.zeros((3, 1))]).astype(
            np.float32))
    boxes = np.array([BOX, [200.0, 1.6, 10.0, 3.9, 1.6, 1.5, 0.0]])
    lines = kitti_writer.predictions_to_kitti_lines(
        boxes, np.array([0.9, 0.95]), np.array([0, 0]), calib,
        (1242, 375))
    # second box projects far outside the image -> dropped
    assert len(lines) == 1
    fields = lines[0].split()
    assert fields[0] == "Car"
    assert len(fields) == 16
    assert float(fields[15]) == 0.9
    # h, w, l columns (KITTI order) match the box dims
    assert abs(float(fields[8]) - 1.5) < 1e-3
    assert abs(float(fields[9]) - 1.6) < 1e-3
    assert abs(float(fields[10]) - 3.9) < 1e-3


def test_writer_score_threshold():
    calib = FrameCalib(
        p2=np.array([[700.0, 0, 600, 0], [0, 700, 180, 0],
                     [0, 0, 1, 0]], np.float32),
        r0=np.eye(3, dtype=np.float32),
        velo_to_cam=np.hstack([np.eye(3), np.zeros((3, 1))]).astype(
            np.float32))
    boxes = np.array([BOX])
    lines = kitti_writer.predictions_to_kitti_lines(
        boxes, np.array([0.05]), np.array([0]), calib, (1242, 375),
        score_threshold=0.1)
    assert lines == []
