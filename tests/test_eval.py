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


def test_multiclass_people_preset_eval(tmp_path):
    """The people preset (multi-class head) must be scorable: the
    evaluator loops all classes with per-class min IoU (0.7 Car, 0.5
    others) and reports ap_per_class (VERDICT round-1 item 9)."""
    import jax
    import jax.numpy as jnp
    from dodt_tpu import config as cfg_mod
    from dodt_tpu.data import synthetic, tracking
    from dodt_tpu.models import dt_avod
    from dodt_tpu.runtime.trainer import (CheckpointIO,
                                          create_train_state)
    from dodt_tpu.runtime.evaluator import Evaluator

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(
        root, num_videos=1, num_frames=3,
        object_classes=("Pedestrian", "Cyclist"))
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.classes = ("Pedestrian", "Cyclist")
    cfg.dataset.num_clusters = (1, 1)
    cfg.dataset.video_train_ids = (0,)
    cfg.dataset.max_points = 4096

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    clusters = ((0.8, 0.6, 1.7), (1.8, 0.6, 1.7))
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=clusters)

    batch = {k: jnp.asarray(v)[None]
             for k, v in ds.load_couple(0, augs=()).items()
             if isinstance(v, np.ndarray)}
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    ck = CheckpointIO(str(tmp_path / "ckpt"))
    ck.save(1, state._replace(step=np.int32(1)))

    ev = Evaluator(cfg, model, ds, ckpt_dir=str(tmp_path / "ckpt"),
                   output_dir=str(tmp_path / "eval"))
    results = ev.run_checkpoint_once(1)
    assert set(results["ap_per_class"]) == {"Pedestrian", "Cyclist"}
    for cls_name in ("Pedestrian", "Cyclist"):
        per = results["ap_per_class"][cls_name]
        assert set(per) == {"AP_2D", "AP_BEV", "AP_3D"}
        for m in per.values():
            assert set(m) == {"easy", "moderate", "hard"}
    # primary-class view stays backward compatible
    assert results["ap"] is results["ap_per_class"]["Pedestrian"]
    # the 0.5-IoU second pass (reference evaluate_object_3d_offline_05_iou)
    assert set(results["ap_05_per_class"]) == {"Pedestrian", "Cyclist"}
    for per in results["ap_05_per_class"].values():
        assert set(per) == {"AP_2D", "AP_BEV", "AP_3D"}


def test_stride_eval_interpolates_non_keyframes(tmp_path):
    """tau=3 stride evaluation (reference DtEvaluatorStride): with
    interpolate=True the evaluator must write prediction files for the
    tau-1 non-keyframes between each strided couple and include them in
    the MOT bookkeeping."""
    import os
    import jax
    import jax.numpy as jnp
    from dodt_tpu import config as cfg_mod
    from dodt_tpu.data import synthetic, tracking
    from dodt_tpu.models import dt_avod
    from dodt_tpu.runtime.trainer import CheckpointIO, create_train_state
    from dodt_tpu.runtime.evaluator import Evaluator

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=7)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.data_stride = 3
    cfg.dataset.video_train_ids = (0,)
    cfg.dataset.max_points = 4096

    # strided couples: frames (0,3), (3,6), (6,6)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="test")
    assert [(c.frame_a, c.frame_b) for c in ds.couples] == \
        [(0, 3), (3, 6), (6, 6)]

    model = dt_avod.DtAvodNet(cfg=cfg,
                              cluster_sizes=((3.9, 1.6, 1.52),))
    batch = {k: jnp.asarray(v)[None]
             for k, v in ds.load_couple(0, augs=()).items()
             if isinstance(v, np.ndarray)}
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    ck = CheckpointIO(str(tmp_path / "ckpt"))
    ck.save(1, state._replace(step=np.int32(1)))

    ev = Evaluator(cfg, model, ds, ckpt_dir=str(tmp_path / "ckpt"),
                   output_dir=str(tmp_path / "eval"))
    ev.run_checkpoint_once(1, interpolate=True)
    pred_dir = str(tmp_path / "eval" / "predictions_1" / "data")
    names = sorted(os.listdir(pred_dir))
    # keyframes 0,3,6 AND interpolated 1,2,4,5 all written
    assert names == [f"00{f:04d}.txt" for f in range(7)], names


def test_fixture_ceiling_is_100(tmp_path):
    """keep_in_view fixtures (the default) place every GT inside the
    camera FOV and BEV area for ALL frames, so perfect detections score
    AP 100 instead of the 9/11 = 81.82 protocol ceiling an out-of-view
    GT imposes — at-ceiling trajectories could not regress (VERDICT r2
    item 7). One unconstrained scene keeps the legacy behavior for the
    border/offset logic."""
    from dodt_tpu import config as cfg_mod
    from dodt_tpu.data import synthetic, tracking

    from dodt_tpu.eval import kitti_ap

    # the official 41-threshold protocol needs >= 41 valid GT per
    # difficulty to reach AP 100 (one threshold per true positive);
    # easy demands bbox height >= 40 px i.e. z <~ 25 m, so cap z
    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=8,
                                     ego_speed=0.8, num_cars=6, seed=2,
                                     z_range=(7.0, 24.0))
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.video_train_ids = (0,)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")

    rng = np.random.RandomState(0)
    gts, dets = [], []
    for f in range(8):
        raw = ds.raw_labels(0, f)
        dc = np.array([t == "DontCare" for t in raw.types], bool)
        gts.append(kitti_ap.FrameGt.from_labels(
            raw.select(~dc), dontcare=raw.bbox_2d[dc]))
        lab = ds.labels(0, f)
        scores = rng.uniform(0.5, 1.0, len(lab))  # distinct scores
        dets.append(kitti_ap.FrameDet(
            lab.box_3d.astype(np.float64), lab.bbox_2d.astype(np.float64),
            scores, ["Car"] * len(lab)))
    for metric in ("image", "ground", "3d"):
        ap = kitti_ap.evaluate_ap(gts, dets, "Car", metric, 0.7)
        for diff, v in ap.items():
            assert v > 99.0, (metric, diff, ap)

    # unconstrained placement stays available (objects may leave view)
    scene = synthetic.SyntheticScene(0, 8, num_cars=6, seed=0,
                                     ego_speed=2.0, keep_in_view=False)
    in_view = [len(scene.camera_boxes_at(f)) for f in range(8)]
    assert min(in_view) < 6  # someone left the scene


def test_val_health_and_batched_eval(tmp_path):
    """VERDICT r2 items 5+9: the evaluator's val loop runs batched
    through one jit (results invariant to eval batch size), and
    val_health emits per-checkpoint val losses + RPN proposal recall
    (reference save_proposal_losses_results, dt_evaluator.py:764-810)."""
    import jax
    import jax.numpy as jnp
    from dodt_tpu import config as cfg_mod
    from dodt_tpu.data import synthetic, tracking
    from dodt_tpu.models import dt_avod
    from dodt_tpu.runtime.trainer import CheckpointIO, create_train_state
    from dodt_tpu.runtime.evaluator import Evaluator
    from dodt_tpu.eval import reporting

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=5,
                                     ego_speed=0.5)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.video_train_ids = (0,)
    cfg.dataset.max_points = 4096

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    model = dt_avod.DtAvodNet(cfg=cfg,
                              cluster_sizes=((3.9, 1.6, 1.52),))
    batch = {k: jnp.asarray(v)[None]
             for k, v in ds.load_couple(0, augs=()).items()
             if isinstance(v, np.ndarray)}
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    ck = CheckpointIO(str(tmp_path / "ckpt"))
    ck.save(1, state._replace(step=np.int32(1)))

    cfg.eval.val_health = True
    ev1 = Evaluator(cfg, model, ds, ckpt_dir=str(tmp_path / "ckpt"),
                    output_dir=str(tmp_path / "eval_b1"))
    r1 = ev1.run_checkpoint_once(1)

    vh = r1["val_health"]
    assert set(vh) >= {"val_losses", "proposal_recall", "num_gt"}
    assert np.isfinite(vh["val_losses"]["total"])
    for v in vh["proposal_recall"].values():
        assert 0.0 <= v <= 1.0
    # the table surfaces the health columns
    table = reporting.format_table([r1])
    assert "val_loss" in table and "recall@0.5" in table

    # batched eval: same results through a batch-2 jit (last chunk
    # padded)
    cfg2 = cfg_mod.PipelineConfig.from_json(cfg.to_json())
    cfg2.eval.batch_size = 2
    cfg2.eval.val_health = False
    ev2 = Evaluator(cfg2, model, ds, ckpt_dir=str(tmp_path / "ckpt"),
                    output_dir=str(tmp_path / "eval_b2"))
    r2 = ev2.run_checkpoint_once(1)
    for metric in ("AP_3D", "AP_BEV", "AP_2D"):
        for diff in ("easy", "moderate", "hard"):
            np.testing.assert_allclose(
                r2["ap"][metric][diff], r1["ap"][metric][diff],
                atol=1e-6, err_msg=f"{metric}/{diff}")

    # val_health must also work on the two-pass RPN route (production
    # anchor counts activate it: fusion_top_k < n_anchors).  The
    # mini-batch is sampled whenever mode=='train' carries gt — NOT
    # gated on the dropout flag — so the train=False health pass still
    # gets in-forward mini-batch losses (regression: real-data holdout
    # eval crashed in compute_losses here).
    cfg3 = cfg_mod.PipelineConfig.from_json(cfg.to_json())
    cfg3.model.rpn.fusion_top_k = 64          # < tiny-grid anchor count
    model3 = dt_avod.DtAvodNet(cfg=cfg3,
                               cluster_sizes=((3.9, 1.6, 1.52),))
    ev3 = Evaluator(cfg3, model3, ds, ckpt_dir=str(tmp_path / "ckpt"),
                    output_dir=str(tmp_path / "eval_2pass"))
    vh3 = ev3.val_health(ev3.ckpt.restore_params(1))
    assert np.isfinite(vh3["val_losses"]["total"])
    assert np.isfinite(vh3["val_losses"]["rpn_cls"])
