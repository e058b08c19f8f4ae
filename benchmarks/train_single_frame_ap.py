"""Single-frame AVOD baseline accuracy evidence (reference AVOD
baseline row): train DtAvodNet(num_frames=1) on the detection fixture
and record AP through the official-protocol evaluator.

Results land in results_r03/single_frame_ap.json.
Run: python benchmarks/train_single_frame_ap.py [steps]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import detection, synthetic  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 900
EVAL_EVERY = STEPS // 3

root = tempfile.mkdtemp(prefix="sf_fix_")
synthetic.write_detection_fixture(root, num_frames=12)
cfg = cfg_mod.cars_dt_tracking()
cfg.model.model_name = "avod_model"
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule
cfg.eval.batch_size = 4                # batched val loop

ds = detection.KittiDataset(cfg.dataset, split="train")
print(f"{len(ds)} detection samples")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),),
                          num_frames=1)
ck = tempfile.mkdtemp(prefix="sf_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

ev_ds = detection.KittiDataset(cfg.dataset, split="trainval")
out_dir = tempfile.mkdtemp(prefix="sf_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step)
    row = {"step": step,
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"]}
    trajectory.append(row)
    print(row)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/single_frame_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory},
              f, indent=2)
print("wrote results_r03/single_frame_ap.json")
