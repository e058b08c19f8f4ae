import numpy as np

from dodt_tpu.runtime import video
from dodt_tpu.utils import format_checker, metrics


def det(x, z, frame, score=0.9, offsets=(0, 2.0, 0)):
    # ry = pi/2: car heading along +z (it moves in z below)
    return {"frame_id": frame,
            "box_3d": np.array([x, 1.6, z, 3.9, 1.6, 1.5, np.pi / 2]),
            "bbox_2d": np.array([100.0, 100, 180, 160]),
            "score": score, "type": "Car",
            "offsets": np.asarray(offsets, float), "coexist": 1.0}


def make_video(stride=3, n_keyframes=4):
    frames = {}
    for k in range(n_keyframes):
        f = k * stride
        frames[f] = [det(0.0, 10.0 + 2.0 * k, f,
                         offsets=(0, 2.0, 0))]
    return {0: frames}


def test_video_iou_pipeline_interpolates():
    vd = make_video(stride=3)
    lines = video.run_video_pipeline(vd, tracker="iou", stride=3,
                                     sigma_h=0.3, t_min=1)
    rows = [l.split() for l in lines[0]]
    frames = sorted(int(r[0]) for r in rows)
    # keyframes 0,3,6,9 plus interpolated 1,2,4,5,7,8
    assert frames == list(range(10))
    # all one track id
    assert len(set(r[1] for r in rows)) == 1
    # z advances ~2/3 m per frame
    zs = [float(r[15]) for r in sorted(rows, key=lambda r: int(r[0]))]
    dz = np.diff(zs)
    np.testing.assert_allclose(dz, 2.0 / 3, atol=1e-3)  # 4-dp output


def test_video_kf_pipeline():
    vd = make_video(stride=1, n_keyframes=6)
    lines = video.run_video_pipeline(vd, tracker="kf", stride=1,
                                     t_min=2)
    assert len(lines[0]) == 6
    assert len(set(l.split()[1] for l in lines[0])) == 1


def test_load_kitti_detections_roundtrip(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "010002.txt").write_text(
        "Car -1 -1 -10 100.0 100.0 180.0 160.0 "
        "1.5 1.6 3.9 0.0 1.6 10.0 0.1 0.9\n")
    out = video.load_kitti_detections(str(d))
    assert 1 in out and 2 in out[1]
    det0 = out[1][2][0]
    np.testing.assert_allclose(det0["box_3d"],
                               [0.0, 1.6, 10.0, 3.9, 1.6, 1.5, 0.1])
    assert det0["score"] == 0.9


def test_couple_file_roundtrip(tmp_path):
    """Extended per-couple prediction files (reference
    dt_evaluator.py:1134-1259 columns) must round-trip offsets +
    coexist so offline MOT runs reproduce the in-memory pipeline
    exactly (VERDICT r4 missing #1)."""
    from dodt_tpu.eval import kitti_writer

    couples_dir = tmp_path / "couples"
    couples_dir.mkdir()
    vd_mem = make_video(stride=3, n_keyframes=4)[0]
    # give the dets distinguishable offsets/coexist
    for i, f in enumerate(sorted(vd_mem)):
        for d in vd_mem[f]:
            d["coexist"] = 0.9 - 0.1 * i
            d["offsets_span"] = 3
            del d["bbox_2d"]       # in-memory decode dets carry none
    keyframes = sorted(vd_mem)
    for fa, fb in zip(keyframes[:-1], keyframes[1:]):
        lines = kitti_writer.couple_detections_to_lines(
            {fa: vd_mem[fa], fb: vd_mem[fb]})
        kitti_writer.write_kitti_file(
            str(couples_dir / f"00{fa:04d}_00{fb:04d}.txt"), lines)

    loaded = video.load_couple_detections(str(couples_dir))
    assert sorted(loaded[0]) == keyframes
    for f in keyframes:
        for dm, dl in zip(vd_mem[f], loaded[0][f]):
            np.testing.assert_allclose(dl["box_3d"], dm["box_3d"],
                                       atol=1e-6)
            np.testing.assert_allclose(dl["offsets"], dm["offsets"],
                                       atol=1e-6)
            assert abs(dl["coexist"] - dm["coexist"]) < 1e-6
            assert dl["offsets_span"] == 3
            assert abs(dl["score"] - dm["score"]) < 1e-6

    # identical tracks through the full pipeline
    out_mem = video.run_video_pipeline({0: vd_mem}, tracker="iou",
                                       stride=3, sigma_h=0.3, t_min=1)
    out_file = video.run_video_pipeline(loaded, tracker="iou",
                                        stride=3, sigma_h=0.3, t_min=1)
    assert out_mem[0] == out_file[0]


def test_offline_pipeline_matches_in_memory_on_hard_fixture(tmp_path):
    """The from-files MOT run must score exactly like the in-memory run
    on the hard scenario — before the extended contract, file reload
    zeroed the offsets and silently degraded to pure-IoU tracking."""
    from dodt_tpu.eval import kitti_writer
    from dodt_tpu.tracking import iou_tracker, mot_eval
    from dodt_tpu.tracking.scenarios import (hard_mot_scenario,
                                             tracks_to_pred_frames)

    n = 32
    gt, dets = hard_mot_scenario(n_frames=n)
    couples_dir = tmp_path / "couples"
    couples_dir.mkdir()
    for f in range(n - 1):
        kitti_writer.write_kitti_file(
            str(couples_dir / f"00{f:04d}_00{f + 1:04d}.txt"),
            kitti_writer.couple_detections_to_lines(
                {f: dets[f], f + 1: dets[f + 1]}))
    loaded = video.load_couple_detections(str(couples_dir))
    dets_file = [loaded[0].get(f, []) for f in range(n)]

    def score(seq):
        tracks = iou_tracker.track_through_ious(
            seq, high_threshold=0.85, iou_threshold=0.005, t_min=3,
            ttl=4)
        return mot_eval.evaluate_tracking(
            gt, tracks_to_pred_frames(tracks, n))

    r_mem, r_file = score(dets), score(dets_file)
    for k in ("MOTA", "IDS", "FN", "FP", "MT", "ML"):
        assert r_mem[k] == r_file[k], k
    assert r_mem["MOTA"] > 85.0      # offsets survived the round trip


def test_format_checker():
    import pytest
    format_checker.check_box_3d(np.zeros((4, 7)))
    with pytest.raises(format_checker.FormatError):
        format_checker.check_box_3d(np.zeros((4, 6)))
    bad = np.zeros((1, 7))
    bad[0, 3] = -1
    with pytest.raises(format_checker.FormatError):
        format_checker.check_box_3d(bad)
    format_checker.check_anchor(np.ones((2, 6)))
    with pytest.raises(format_checker.FormatError):
        format_checker.check_anchor(np.zeros((2, 6)))  # zero dims
    format_checker.check_box_8c(np.zeros((5, 3, 8)))


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = metrics.MetricsLogger(path)
    log.log(1, loss=0.5)
    log.log(2, loss=0.25, lr=1e-4)
    import json
    lines = [json.loads(l) for l in open(path)]
    assert lines[1]["loss"] == 0.25
    stats = metrics.latency_stats([0.1, 0.2, 0.3])
    assert abs(stats["mean_s"] - 0.2) < 1e-9
    assert abs(stats["fps"] - 5.0) < 1e-6


def test_viz_smoke(tmp_path):
    from dodt_tpu import viz
    bev = np.random.rand(70, 80, 6).astype(np.float32)
    boxes = np.array([[0.0, 1.6, 3.0, 3.9, 1.6, 1.5, 0.3]])
    p = viz.draw_bev(bev, [[-4, 4], [-3, 3], [0, 7]],
                     gt_boxes=boxes, pred_boxes=boxes,
                     scores=[0.9], path=str(tmp_path / "bev.png"))
    import os
    assert os.path.getsize(p) > 1000
    img = np.zeros((100, 300, 3), np.uint8)
    p2 = viz.draw_image_boxes(img, [(10, 10, 60, 60)], [0.5],
                              path=str(tmp_path / "img.png"))
    assert os.path.getsize(p2) > 500
    # 3D point-cloud scene (mayavi-class capability, matplotlib 3D):
    # height-colored cloud + GT wireframes + track-id-colored preds
    pts = np.random.rand(2000, 4).astype(np.float32) * [8, 3, 7, 1]
    p3 = viz.draw_point_cloud_3d(
        pts, gt_boxes=boxes, pred_boxes=np.vstack([boxes, boxes]),
        track_ids=np.array([0, 3]), path=str(tmp_path / "cloud.png"))
    assert os.path.getsize(p3) > 1000
    p4 = viz.draw_point_cloud_3d(pts, pred_boxes=boxes, scores=[0.7],
                                 path=str(tmp_path / "cloud2.png"))
    assert os.path.getsize(p4) > 1000


def test_video_pipeline_ego_alignment(tmp_path):
    """align_fn gives the post-detection video pipeline the reference's
    ego-transformed association IoU (cal_transformed_ious): at 2 m/frame
    ego speed with tau=3 keyframes, tracks fragment without it and stay
    whole with it."""
    from dodt_tpu.data import synthetic, tracking
    from dodt_tpu import config as cfg_mod

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=7,
                                     ego_speed=2.0, num_cars=3, seed=4)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.video_train_ids = (0,)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    scene = synthetic.SyntheticScene(0, 7, num_cars=3, seed=4,
                                     ego_speed=2.0)

    def make_dets():
        frames = {}
        for f in (0, 3, 6):
            frames[f] = [{"box_3d": np.asarray(b, float), "score": 0.9,
                          "offsets": np.zeros(3), "coexist": 1.0}
                         for _, b in scene.camera_boxes_at(f)]
        return {0: frames}

    def track_count(lines):
        return len({ln.split()[1] for ln in lines})

    aligned = video.run_video_pipeline(
        make_dets(), tracker="iou", stride=3, sigma_iou=0.01,
        t_min=2, interpolate=False,
        align_fn=video.dataset_align_fn(ds))
    broken = video.run_video_pipeline(
        make_dets(), tracker="iou", stride=3, sigma_iou=0.01,
        t_min=2, interpolate=False)
    assert track_count(aligned[0]) == 3, aligned[0]
    # without alignment, the 6 m apparent shift kills every association
    assert track_count(broken[0]) == 0, broken[0]
