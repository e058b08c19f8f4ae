"""First accuracy trajectory: train the flagship DT model on a rich
synthetic fixture and record AP_3D/AP_BEV/MOT per checkpoint.

The fixture is fully learnable (box-surface lidar points, known
motion), so a working detector must drive AP from ~0 to high values
within a few hundred steps — this is the detection-quality smoke signal
VERDICT round 1 asked for. Results land in results_r03/fixture_ap.json.

Run: python benchmarks/train_fixture_ap.py [steps]
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
EVAL_EVERY = STEPS // 4

root = tempfile.mkdtemp(prefix="fixture_ap_")
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = EVAL_EVERY
cfg.eval.batch_size = 4  # batched val loop (round 3)
cfg.train.optimizer.initial_lr = 1e-3  # fixture-scale schedule: 3x
# faster to AP than the reference's 120k-step 1e-4 (LR sweep, round 2)

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="fixture_ck_")

trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=EVAL_EVERY)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])

ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
out_dir = tempfile.mkdtemp(prefix="fixture_eval_")
ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck, output_dir=out_dir)
trajectory = []
for step in trainer.ckpt.all_steps():
    r = ev.run_checkpoint_once(step)
    row = {"step": step,
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
           "MOTA": r["mot"].get("overall", {}).get("MOTA")}
    trajectory.append(row)
    print(row)

# ---- NMS-mode A/B on the trained checkpoint (VERDICT item 8): the
# `fast` parallel NMS keeps a subset of exact greedy's picks; measure
# the AP delta through the parity-proven evaluator.
nms_ab = {}
for mode in ("fast", "greedy"):
    cfg_m = cfg_mod.PipelineConfig.from_json(cfg.to_json())
    cfg_m.model.nms_mode = mode
    model_m = dt_avod.DtAvodNet(cfg=cfg_m,
                                cluster_sizes=((3.9, 1.6, 1.52),))
    ev_m = Evaluator(cfg_m, model_m, ev_ds, ckpt_dir=ck,
                     output_dir=tempfile.mkdtemp(prefix=f"nms_{mode}_"))
    r = ev_m.run_checkpoint_once(STEPS)
    nms_ab[mode] = {k: r["ap"][k]["moderate"]
                    for k in ("AP_3D", "AP_BEV", "AP_2D")}
    print("nms", mode, nms_ab[mode])

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/fixture_ap.json", "w") as f:
    json.dump({"loss_history": history, "ap_trajectory": trajectory,
               "nms_ab_moderate": nms_ab}, f, indent=2)
print("wrote results_r03/fixture_ap.json")
