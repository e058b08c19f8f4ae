"""Flagship-mode (tau=3, S+T+M) accuracy evidence: train the paired
model with stride-3 couples, then evaluate with MoI interpolation
filling the 2 non-keyframes per couple — the reference's headline
configuration (DODT tau=3 S+T+M, README.md:96-106) — and score
detection AP on keyframes plus MOT over ALL frames (keyframes +
interpolated).

Results land in results_r03/fixture_tau3_ap.json.
Run: python benchmarks/train_fixture_tau3.py [steps]
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

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
EVAL_EVERY = STEPS // 2

root = tempfile.mkdtemp(prefix="tau3_fix_")
# ego 1.2 m/frame (3.6 m per stride-3 couple): at this platform speed
# the round-2 pipeline (no ego recovery / unaligned association) would
# collapse; keep_in_view fixtures keep every GT detectable (AP ceiling
# 100, not 81.82)
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=13,
                                 ego_speed=1.2, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking(data_stride=3)
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule
cfg.eval.batch_size = 4                # batched val loop (round 3)

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
print(f"{len(ds.couples)} stride-3 couples")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="tau3_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

# evaluation uses STRIDED couples (the tau protocol: one couple per
# stride, non-keyframes filled by MoI) — the "test" split parses the
# same videos non-sliding
ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="test")
out_dir = tempfile.mkdtemp(prefix="tau3_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step, interpolate=True)
    row = {"step": step,
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "MOTA_all_frames": r["mot"].get("overall", {}).get("MOTA"),
           "MOTP_all_frames": r["mot"].get("overall", {}).get("MOTP")}
    trajectory.append(row)
    print(row)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/fixture_tau3_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory,
               "mode": "tau=3 S+T+M: stride-3 couples, ego 1.2 m/frame, MoI "
                       "fills 2 non-keyframes per couple with ego "
                       "recovery into per-frame coordinates, MOT "
                       "scored over all frames, batched eval (B=4)"}, f, indent=2)
print("wrote results_r03/fixture_tau3_ap.json")
