#!/usr/bin/env python
"""Same-checkpoint AP A/B of the windowed Pallas second-stage BEV crop.

The fixture re-run with round-3 defaults (remat + window) posted a
different 600-step AP than the committed 1200-step trajectory; training
is chaotic under fusion-level rounding changes, so the only clean
isolation of the *eval-time* window path is: one trained checkpoint,
two evals differing ONLY in avod.bev_roi_window.

Usage: python benchmarks/ab_window_eval.py <fixture_root> <ckpt_dir> <step>
Writes results_r03/window_eval_ab.json.
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
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

root, ck, step = sys.argv[1], sys.argv[2], int(sys.argv[3])

out = {}
for name, window in (("generic", 0), ("window64", 64)):
    cfg = cfg_mod.cars_dt_tracking()
    cfg.dataset.dataset_dir = root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0, 1)
    cfg.eval.batch_size = 4
    cfg.model.avod.bev_roi_window = window
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck,
                   output_dir=tempfile.mkdtemp(prefix=f"abwin_{name}_"))
    r = ev.run_checkpoint_once(step)
    out[name] = {
        "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
        "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
        "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
        "MOTA": r["mot"].get("overall", {}).get("MOTA"),
    }
    print(name, out[name], flush=True)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/window_eval_ab.json", "w") as f:
    json.dump({"checkpoint_step": step, **out}, f, indent=2)
print("wrote results_r03/window_eval_ab.json")
