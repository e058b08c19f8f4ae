import numpy as np

from dodt_tpu.tracking import iou_tracker, kalman, moi, mot_eval
from dodt_tpu.utils import np_iou


def det(x, z, frame=0, score=0.9, offsets=None, coexist=1.0):
    return {"frame_id": frame,
            "box_3d": np.array([x, 1.6, z, 3.9, 1.6, 1.5, 0.0]),
            "score": score,
            "offsets": np.zeros(3) if offsets is None
            else np.asarray(offsets, float),
            "coexist": coexist}


def test_np_iou_consistency():
    a = np.array([0.0, 0.0, 4.0, 2.0, 0.3])
    assert abs(np_iou.rotated_iou(a, a[None])[0] - 1.0) < 1e-6
    b = np.array([10.0, 0.0, 4.0, 2.0, 0.3])
    assert np_iou.rotated_iou(a, b[None])[0] == 0.0
    box = np.array([0, 1.6, 10, 3.9, 1.6, 1.5, 0.0])
    assert abs(np_iou.three_d_iou(box, box[None])[0] - 1.0) < 1e-6


def test_iou_tracker_follows_motion():
    # one car moving +2m z per keyframe with correct offsets
    frames = []
    for f in range(5):
        frames.append([det(0.0, 10.0 + 2 * f, f, score=0.95,
                           offsets=[0.0, 2.0, 0.0])])
    tracks = iou_tracker.track_through_ious(
        frames, high_threshold=0.85, iou_threshold=0.005, t_min=3)
    assert len(tracks) == 1
    assert len(tracks[0]["trajectory"]) == 5


def test_iou_tracker_two_objects_no_swap():
    frames = []
    for f in range(4):
        frames.append([
            det(-5.0, 10.0 + 2 * f, f, 0.95, offsets=[0, 2, 0]),
            det(5.0, 30.0 - 2 * f, f, 0.95, offsets=[0, -2, 0]),
        ])
    tracks = iou_tracker.track_through_ious(frames, 0.85, 0.005, 3)
    assert len(tracks) == 2
    for t in tracks:
        xs = [d["box_3d"][0] for d in t["trajectory"]]
        assert np.ptp(xs) < 0.1  # no identity swap


def test_iou_tracker_score_gate():
    frames = [[det(0, 10, f, score=0.5, offsets=[0, 0, 0])]
              for f in range(5)]
    tracks = iou_tracker.track_through_ious(frames, 0.85, 0.005, 3)
    assert len(tracks) == 0  # max score below high_threshold


def test_moi_interpolation_linear():
    d0 = det(0.0, 10.0, 0, 0.9, offsets=[0.0, 3.0, 0.0])
    d1 = det(0.0, 13.0, 3, 0.8)
    frames = moi.interpolate_non_keyframes([d0], [d1], num_frames=4)
    assert [len(f) for f in frames] == [1, 1, 1, 1]
    zs = [f[0]["box_3d"][2] for f in frames]
    np.testing.assert_allclose(zs, [10.0, 11.0, 12.0, 13.0], atol=1e-6)
    # interpolated scores take the max of the endpoints
    assert frames[1][0]["score"] == 0.9


def test_moi_miss_extrapolation():
    # unmatched frame-0 det whose coexist head says "exists in both"
    # (P(both)=1) -> detector miss at frame tau: extrapolate forward
    # along the predicted motion
    d0 = det(0.0, 10.0, 0, 0.9, offsets=[1.0, 2.0, 0.0], coexist=1.0)
    frames = moi.interpolate_non_keyframes([d0], [], num_frames=3)
    assert len(frames[0]) == 1 and len(frames[2]) == 1
    np.testing.assert_allclose(frames[2][0]["box_3d"][[0, 2]],
                               [1.0, 12.0], atol=1e-6)


def test_moi_death_blanks_half():
    # coexist head says "dies before frame tau" (P(both)=0): the late
    # half of the gap stays blank. Dets without a coexist head carry
    # 0.5 and take the same conservative branch.
    for coexist in (0.0, 0.5):
        d0 = det(0.0, 10.0, 0, 0.9, offsets=[0, 0, 0], coexist=coexist)
        frames = moi.interpolate_non_keyframes([d0], [], num_frames=5)
        assert len(frames[0]) == 1
        assert len(frames[-1]) == 0


def test_moi_birth_blanks_early_half():
    # appears only at frame tau with a low-coexist verdict: true birth,
    # the early half of the gap stays blank; with a high coexist the
    # model says it existed at frame 0 too -> extrapolate backwards
    d1 = det(2.0, 14.0, 2, 0.9, offsets=[1.0, 2.0, 0.0], coexist=0.0)
    frames = moi.interpolate_non_keyframes([], [d1], num_frames=5)
    assert len(frames[0]) == 0 and len(frames[-1]) == 1

    d1b = det(2.0, 14.0, 2, 0.9, offsets=[1.0, 2.0, 0.0], coexist=1.0)
    frames = moi.interpolate_non_keyframes([], [d1b], num_frames=3)
    assert len(frames[0]) == 1
    # reference parity: the backward branch scales by (n-i-2)/(n-1)
    # (interpolate_trajectory:536-539), so the first slot moves back by
    # (n-2)/(n-1) of the gap offsets, not the full gap
    np.testing.assert_allclose(frames[0][0]["box_3d"][[0, 2]],
                               [1.5, 13.0], atol=1e-6)


def test_kalman_tracker():
    frames = []
    for f in range(6):
        frames.append([det(0.0, 10.0 + 1.5 * f, f, 0.9)])
    tracks = kalman.kf_pipeline(frames)
    assert len(tracks) == 1
    assert len(tracks[0]["trajectory"]) == 6


def test_kalman_direction_correction():
    trk = kalman.KalmanBoxTracker(
        np.array([0, 1.6, 10, 3.9, 1.6, 1.5, 0.0]), 0)
    trk.predict()
    trk.update(np.array([0, 1.6, 10.5, 3.9, 1.6, 1.5, np.pi - 0.05]))
    # measurement flipped by pi -> heading stays near 0
    assert abs(trk.x[6]) < 0.5


def test_mot_eval_perfect():
    gt, pred = [], []
    for f in range(10):
        boxes = [(0, 0, 50, 50), (100, 0, 160, 60)]
        gt.append({"ids": [1, 2], "boxes": boxes})
        pred.append({"ids": [7, 8], "boxes": boxes})
    res = mot_eval.evaluate_tracking(gt, pred)
    assert res["MOTA"] == 100.0
    assert res["IDS"] == 0
    assert res["MT"] == 100.0


def test_mot_eval_id_switch():
    gt, pred = [], []
    for f in range(10):
        boxes = [(0, 0, 50, 50)]
        gt.append({"ids": [1], "boxes": boxes})
        pred.append({"ids": [7 if f < 5 else 9], "boxes": boxes})
    res = mot_eval.evaluate_tracking(gt, pred)
    assert res["IDS"] == 1
    assert res["MOTA"] == 90.0  # 1 switch / 10 gt


def test_mot_eval_misses():
    """Official fragment semantics (evaluate_tracking.py:704-713): a
    fragmentation is a gap followed by a re-acquisition that persists
    for at least two frames."""
    gt, pred = [], []
    for f in range(10):
        gt.append({"ids": [1], "boxes": [(0, 0, 50, 50)]})
        present = f < 4 or f >= 7   # gap at frames 4-6
        pred.append({"ids": [3], "boxes": [(0, 0, 50, 50)]} if present
                    else {"ids": [], "boxes": []})
    res = mot_eval.evaluate_tracking(gt, pred)
    assert res["FN"] == 3
    assert res["FM"] == 1
    assert res["IDS"] == 0
    assert res["ML"] == 0.0 and res["MT"] == 0.0  # 70% coverage -> PT
    assert res["PT"] == 100.0
