#!/usr/bin/env python
"""Same-checkpoint accuracy + latency A/B over the two-pass fusion
candidate count (`rpn.fusion_top_k`).

The roofline (results_r03/roofline.md) flags k_fuse=8192 as
"deliberately generous": pass-1 ranking (approx_max_k over 90k anchors
+ the candidate gather) and the pass-2 image fuse (K tiny ROI crops +
fused FC heads) both scale with K, together ~2.7 ms of the ~15.7 ms
keyframe. The RPN only keeps test_nms_size=300 proposals, so K merely
needs to cover NMS's effective input; if AP/MOT are unchanged at
K=4096 or 2048, the smaller K is free latency.

k_fuse is eval-compute only — the parameter pytree is identical for
every K (training appends its IoU-sampled mini-batch to the interest
set, so the loss never depends on K's coverage) — which makes a
one-checkpoint multi-K eval a clean isolation.

Writes results_r03/kfuse_ab.json:
  per K: AP_3D/AP_BEV/AP_2D moderate + MOTA on the fixture checkpoint,
  and production-shape streaming keyframe latency (bench.py
  methodology: async dispatch queue + device_sync).

Run: python benchmarks/ab_kfuse.py [train_steps]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
KS = (8192, 4096, 2048, 1024)
CLUSTERS = ((3.9, 1.6, 1.52),)

# ---- one trained checkpoint (default K) ----------------------------
root = tempfile.mkdtemp(prefix="kfuse_fix_")
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = STEPS
cfg.train.optimizer.initial_lr = 1e-3
cfg.eval.batch_size = 4

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
ck = tempfile.mkdtemp(prefix="kfuse_ck_")
trainer = Trainer(cfg, model, ds, ck, batch_size=1)
_, history = trainer.train(max_steps=STEPS, log_every=STEPS)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history], flush=True)

# ---- accuracy per K on the SAME checkpoint -------------------------
ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
acc = {}
for k in KS:
    cfg_k = cfg_mod.PipelineConfig.from_json(cfg.to_json())
    cfg_k.model.rpn.fusion_top_k = k
    model_k = dt_avod.DtAvodNet(cfg=cfg_k, cluster_sizes=CLUSTERS)
    ev = Evaluator(cfg_k, model_k, ev_ds, ckpt_dir=ck,
                   output_dir=tempfile.mkdtemp(prefix=f"kfuse_{k}_"))
    r = ev.run_checkpoint_once(STEPS)
    acc[k] = {
        "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
        "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
        "AP_2D_moderate": r["ap"]["AP_2D"]["moderate"],
        "MOTA": r["mot"].get("overall", {}).get("MOTA"),
    }
    print("acc", k, acc[k], flush=True)

# ---- production-shape streaming latency per K ----------------------
# weights don't affect latency; random init at KITTI shapes.
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import bench  # noqa: E402  (repo-root bench.py: shapes + sync method)
from dodt_tpu.runtime.predictor import StreamingPredictor  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

lat = {}
for k in KS:
    cfg_p = cfg_mod.cars_dt_tracking()
    cfg_p.dataset.max_points = 65536
    cfg_p.model.rpn.fusion_top_k = k
    model_p = dt_avod.DtAvodNet(cfg=cfg_p, cluster_sizes=CLUSTERS)
    rng = np.random.RandomState(0)
    batch = {kk: jnp.asarray(v)
             for kk, v in bench.make_batch(cfg_p, rng).items()}
    key = jax.random.PRNGKey(0)
    init_fn = jax.jit(model_p.init, static_argnames=("train", "mode"))
    variables = init_fn({"params": key, "dropout": key,
                         "pathdrop": key}, batch, train=False,
                        mode="val")
    pred = StreamingPredictor(model_p, variables["params"])
    frame = {
        "points": batch["points"][:, 0],
        "points_valid": batch["points_valid"][:, 0],
        "image": batch["image"][:, 0],
        "ground_plane": batch["ground_plane"],
        "p2": batch["p2"],
        "orig_image_shape": batch["orig_image_shape"],
    }
    out = None
    for _ in range(3):
        out = pred.push_keyframe(frame, fetch=False)
    device_sync(out["final_boxes_3d"])
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pred.push_keyframe(frame, fetch=False)
    device_sync(out["final_boxes_3d"])
    dt = (time.perf_counter() - t0) / n_iters
    lat[k] = {"stream_keyframe_ms": round(dt * 1000, 2),
              "fps_tau3": round(3.0 / dt, 1)}
    print("lat", k, lat[k], flush=True)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/kfuse_ab.json", "w") as f:
    json.dump({"checkpoint_step": STEPS,
               "accuracy_same_checkpoint": acc,
               "latency_production_shapes": lat,
               "loss_history": history}, f, indent=2)
print("wrote results_r03/kfuse_ab.json")
