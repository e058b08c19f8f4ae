"""Stack-model (integrated BEV, N frames) accuracy evidence: train
StackAvodNet on stride-2 stacks and record AP/MOT through the generic
Evaluator's stack branch (first/last-frame detections).

Results land in results_r03/stack_ap.json.
Run: python benchmarks/train_stack_ap.py [steps]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import stack as stack_data  # noqa: E402
from dodt_tpu.data import synthetic  # noqa: E402
from dodt_tpu.models import stack as stack_model  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
EVAL_EVERY = STEPS // 2

root = tempfile.mkdtemp(prefix="stack_fix_")
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking(data_stride=2)  # stacks of 3 frames
cfg.model.model_name = "stack_avod_model"
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule
cfg.eval.batch_size = 4                # batched val loop

ds = stack_data.KittiTrackingStackDataset(cfg.dataset, split="train")
print(f"{len(ds.couples)} stacks of {ds.num_frames} frames")
model = stack_model.StackAvodNet(cfg=cfg,
                                 cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="stack_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

ev_ds = stack_data.KittiTrackingStackDataset(cfg.dataset,
                                             split="trainval")
out_dir = tempfile.mkdtemp(prefix="stack_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step)
    row = {"step": step,
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "MOTA": r["mot"].get("overall", {}).get("MOTA")}
    trajectory.append(row)
    print(row)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/stack_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory},
              f, indent=2)
print("wrote results_r03/stack_ap.json")
