"""Multi-class (people preset) accuracy evidence: train the
Pedestrian+Cyclist model on a class-mixed synthetic fixture and record
per-class AP through the official-protocol evaluator (others scored at
min IoU 0.5, like the official CLASS/MIN_OVERLAP tables).

Results land in results_r03/people_ap.json.
Run: python benchmarks/train_people_ap.py [steps]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
EVAL_EVERY = STEPS // 3

root = tempfile.mkdtemp(prefix="people_fix_")
# 12 objects x 12 frames: the official 41-point threshold vector fills
# one entry per TP, so each class needs >= 41 VALID moderate GT across
# the eval keyframes (difficulty filters drop small/far boxes) for a
# perfect detector to score AP 100 rather than an N_gt/41 ceiling
synthetic.write_tracking_fixture(
    root, num_videos=2, num_frames=12, ego_speed=0.3, num_cars=12,
    points_per_car=768, object_classes=("Pedestrian", "Cyclist"))
cfg = cfg_mod.people_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule
cfg.eval.batch_size = 4                # batched val loop

CLUSTERS = ((0.7, 0.65, 1.75), (1.7, 0.55, 1.65))

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
ck = tempfile.mkdtemp(prefix="people_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
out_dir = tempfile.mkdtemp(prefix="people_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step)
    row = {"step": step}
    for cls_name in cfg.dataset.classes:
        row[cls_name] = {
            "AP_3D_moderate":
                r["ap_per_class"][cls_name]["AP_3D"]["moderate"],
            "AP_BEV_moderate":
                r["ap_per_class"][cls_name]["AP_BEV"]["moderate"]}
    trajectory.append(row)
    print(row)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/people_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory},
              f, indent=2)
print("wrote results_r03/people_ap.json")
