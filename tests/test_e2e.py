"""End-to-end slice: train a few steps -> checkpoint -> evaluate ->
AP + MOT metrics + KITTI prediction files (SURVEY.md section 7 stage 4
milestone, extended to the paired-frame model)."""
import os

import numpy as np
import pytest

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_e2e"))
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=4,
                                     ego_speed=0.5)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    cfg.dataset.video_train_ids = (0,)
    cfg.train.checkpoint_interval = 2
    cfg.train.max_iterations = 2
    return root, cfg


def test_train_then_eval(world, tmp_path):
    root, cfg = world
    from dodt_tpu.runtime.trainer import Trainer
    from dodt_tpu.runtime.evaluator import Evaluator

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    ckpt_dir = str(tmp_path / "ckpt")

    trainer = Trainer(cfg, model, ds, ckpt_dir, batch_size=1)
    state, history = trainer.train(max_steps=2, log_every=1)
    assert int(state.step) == 2
    assert all(np.isfinite(h["total"]) for h in history)
    assert trainer.ckpt.latest_step() == 2

    # persistent metrics trail (reference TensorBoard summaries,
    # trainer.py:108-116): a killed run must leave a readable JSONL
    from dodt_tpu.eval import reporting
    tm_path = os.path.join(ckpt_dir, "train_metrics.jsonl")
    assert os.path.exists(tm_path)
    tm = reporting.load_train_metrics(tm_path)
    assert [r["step"] for r in tm] == [1, 2]
    assert all(np.isfinite(r["total"]) for r in tm)

    # resume: restores step
    trainer2 = Trainer(cfg, model, ds, ckpt_dir, batch_size=1)
    state2 = trainer2.init_or_restore()
    assert int(state2.step) == 2

    # evaluate the checkpoint on the train split (fixture videos are in
    # video_train_ids, so val would be empty)
    ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    out_dir = str(tmp_path / "eval")
    ev = Evaluator(cfg, model, ev_ds, ckpt_dir, out_dir)
    results = ev.run_checkpoint_once(2)
    assert "ap" in results and "mot" in results
    assert set(results["ap"].keys()) == {"AP_2D", "AP_BEV", "AP_3D"}
    pred_dir = os.path.join(out_dir, "predictions_2", "data")
    files = os.listdir(pred_dir)
    assert len(files) == len(ev_ds.couples)
    # results json exists
    assert os.path.exists(os.path.join(out_dir, "results_2.json"))

    # extended per-couple files: offsets + coexist round-trip into the
    # offline pipeline (reference dt_evaluator.py:1134-1259 contract)
    from dodt_tpu.runtime import video
    couples_dir = os.path.join(out_dir, "predictions_2", "couples")
    assert len(os.listdir(couples_dir)) == len(ev_ds.couples)
    loaded = video.load_couple_detections(couples_dir)
    n_dets = sum(len(d) for frames in loaded.values()
                 for d in frames.values())
    if n_dets:   # 2-step checkpoint may detect nothing
        any_det = next(d for frames in loaded.values()
                       for dd in frames.values() for d in dd)
        assert "coexist" in any_det and "box_3d" in any_det
