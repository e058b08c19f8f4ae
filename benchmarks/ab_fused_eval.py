#!/usr/bin/env python
"""Same-checkpoint AP/MOTA A/B of the fused Pallas conv-chain interior.

One trained checkpoint, two evals differing ONLY in
FeatureExtractorConfig.fused_interior (tower math re-expressed as
VMEM-resident shifted matmuls vs XLA convs; expected difference is
f32-accumulation-order in the last bf16 bit). The windowed-ROI
precedent: eval-time kernel swaps must prove AP/MOTA identical before
they dispatch by default.

Usage: python benchmarks/ab_fused_eval.py [<fixture_root> <ckpt_dir> <step>]
(no args: generates the fixture and trains a 600-step checkpoint with
the standard towers first). Writes results_r04/fused_eval_ab.json.
"""
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402

if len(sys.argv) > 3:
    root, ck, step = sys.argv[1], sys.argv[2], int(sys.argv[3])
else:
    step = 600
    root = tempfile.mkdtemp(prefix="abfus_fixture_")
    synthetic.write_tracking_fixture(root, num_videos=2, num_frames=10,
                                     ego_speed=0.4, num_cars=7,
                                     points_per_car=512)
    cfg = cfg_mod.cars_dt_tracking()
    cfg.dataset.dataset_dir = root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0, 1)
    cfg.train.checkpoint_interval = step
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    ck = tempfile.mkdtemp(prefix="abfus_ck_")
    Trainer(cfg, model, ds, ck, batch_size=1).train(max_steps=step,
                                                    log_every=step)
    print(f"trained checkpoint: {ck} (fixture {root})", flush=True)

out = {}
for name, fused in (("std", ()), ("fused", ("conv4",))):
    cfg = cfg_mod.cars_dt_tracking()
    cfg.dataset.dataset_dir = root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0, 1)
    cfg.eval.batch_size = 4
    cfg.model.bev_extractor = dataclasses.replace(
        cfg.model.bev_extractor, fused_interior=fused)
    cfg.model.img_extractor = dataclasses.replace(
        cfg.model.img_extractor, fused_interior=fused)
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck,
                   output_dir=tempfile.mkdtemp(prefix=f"abfus_{name}_"))
    r = ev.run_checkpoint_once(step)
    out[name] = {
        "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
        "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
        "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
        "MOTA": r["mot"].get("overall", {}).get("MOTA"),
    }
    print(name, out[name], flush=True)

os.makedirs("results_r04", exist_ok=True)
with open("results_r04/fused_eval_ab.json", "w") as f:
    json.dump({"checkpoint_step": step, **out}, f, indent=2)
print("wrote results_r04/fused_eval_ab.json")
