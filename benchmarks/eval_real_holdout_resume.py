"""Resume the held-out real-data evaluation from already-trained
checkpoints (train_real_holdout_ap.py's eval half).

The 4000-step training leg is expensive (~hours on the tunneled chip);
when only the eval loop needs re-running (e.g. after an evaluator fix),
point this at the surviving checkpoint dir instead of retraining.

Run: python benchmarks/eval_real_holdout_resume.py <ckpt_dir> [loss_json]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import CheckpointIO  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

FIXTURE = "/root/reference/avod/tests/datasets/Kitti/tracking"
CK = sys.argv[1]
LOSS_JSON = sys.argv[2] if len(sys.argv) > 2 else None

cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = FIXTURE
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)   # clip 2 held out
cfg.train.optimizer.initial_lr = 1e-3
cfg.eval.val_health = True
cfg.eval.batch_size = 4

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))


def row_of(r):
    out = {"step": r["step"],
           "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
           "AP_3D_05_moderate":
               r["ap_05_per_class"]["Car"]["AP_3D"]["moderate"],
           "MOTA": r["mot"].get("overall", {}).get("MOTA")}
    if "val_health" in r:
        out["val_loss"] = r["val_health"]["val_losses"]["total"]
        out["proposal_recall_05"] = \
            r["val_health"]["proposal_recall"]["iou_0.5"]
    return out


val_ds = tracking.KittiTrackingDataset(cfg.dataset, split="val")
print(f"{len(val_ds.couples)} held-out couples (clip 2)")
ev_val = Evaluator(cfg, model, val_ds, ckpt_dir=CK,
                   output_dir=tempfile.mkdtemp(prefix="holdout_val_"))
cfg_trn = cfg_mod.PipelineConfig.from_json(cfg.to_json())
cfg_trn.eval.val_health = False
ev_trn = Evaluator(cfg_trn, model, ds, ckpt_dir=CK,
                   output_dir=tempfile.mkdtemp(prefix="holdout_trn_"))

holdout_traj, train_traj = [], []
for step in CheckpointIO(CK).all_steps():
    r = ev_val.run_checkpoint_once(step)
    holdout_traj.append(row_of(r))
    print("holdout", holdout_traj[-1], flush=True)
    r = ev_trn.run_checkpoint_once(step)
    train_traj.append(row_of(r))
    print("train  ", train_traj[-1], flush=True)

history = []
if LOSS_JSON and os.path.exists(LOSS_JSON):
    with open(LOSS_JSON) as f:
        history = json.load(f)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/real_holdout_ap.json", "w") as f:
    json.dump({
        "loss_history": history,
        "holdout_trajectory": holdout_traj,
        "train_trajectory": train_traj,
        "setup": "train on genuine KITTI clips 0+1 (~27 frames), "
                 "evaluate on unseen clip 2; official-protocol "
                 "evaluators; val_health = val loss + RPN proposal "
                 "recall on the held-out clip"}, f, indent=2)
print("wrote results_r03/real_holdout_ap.json")
