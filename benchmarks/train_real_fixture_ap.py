"""REAL-data learning evidence: train the flagship model on the
reference's miniature real KITTI tracking fixture (3 genuine KITTI
videos — real velodyne scans, real images, real labels) and record the
AP/MOT trajectory through the official-protocol evaluators.

This is an overfit-style benchmark (40 frames), but on actual sensor
data: it demonstrates the full pipeline — readers, ego compensation,
BEV rasterization, towers, two-stage heads, correlation — learns real
KITTI structure, which no synthetic fixture can show.

Results land in results_r02/real_fixture_ap.json.
Run: python benchmarks/train_real_fixture_ap.py [steps]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

FIXTURE = "/root/reference/avod/tests/datasets/Kitti/tracking"
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
EVAL_EVERY = STEPS // 4

cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = FIXTURE
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1, 2)
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
print(f"{len(ds.couples)} couples from the real fixture")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="realfix_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
out_dir = tempfile.mkdtemp(prefix="realfix_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step)
    row = {"step": step,
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
           "AP_3D_05_moderate":
               r["ap_05_per_class"]["Car"]["AP_3D"]["moderate"],
           "MOTA": r["mot"].get("overall", {}).get("MOTA")}
    trajectory.append(row)
    print(row)

os.makedirs("results_r02", exist_ok=True)
with open("results_r02/real_fixture_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory,
               "data": "reference real mini-KITTI tracking fixture "
                       "(3 genuine KITTI videos, 40 frames)"}, f,
              indent=2)
print("wrote results_r02/real_fixture_ap.json")
