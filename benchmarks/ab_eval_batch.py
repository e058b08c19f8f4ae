#!/usr/bin/env python
"""Batched val-loop throughput A/B (VERDICT r2 item 5).

The reference evaluator feeds couples one at a time through a batch-1
graph (dt_evaluator.py:233-365); this repo's Evaluator pads couples
into B-sized batches through one jit (`predict_couples`). Outputs are
batch-invariant (tests/test_eval.py), so the only question is the
speedup — measured here by sweeping the full couple list at
B ∈ {1, 2, 4, 8} with untrained params (eval compute is
trajectory-independent: same ops, same shapes).

Timing is wall-clock over the predict loop only (host load + device
dispatch + fetch), excluding the AP/MOT scoring that follows either
way. First sweep per B is discarded (jit compile).

Writes results_r04/eval_batch_ab.json.
Run: python benchmarks/ab_eval_batch.py
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

root = tempfile.mkdtemp(prefix="evalbatch_fix_")
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=21,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)

results = {}
for bsz in (1, 2, 4, 8):
    cfg = cfg_mod.cars_dt_tracking()
    cfg.dataset.dataset_dir = root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0, 1)
    cfg.eval.batch_size = bsz
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    ev = Evaluator(cfg, model, ds, ckpt_dir=tempfile.mkdtemp(),
                   output_dir=tempfile.mkdtemp())
    sample = ds.load_couple(0, augs=())
    init_batch = {k: jnp.asarray(np.stack([v]))
                  for k, v in sample.items()
                  if isinstance(v, np.ndarray)}
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init,
                        static_argnames=("train", "mode"))(
        {"params": rng, "dropout": rng, "pathdrop": rng},
        init_batch, train=False, mode="val")
    params = variables["params"]
    idxs = list(range(len(ds.couples)))
    chunks = [idxs[i:i + bsz] for i in range(0, len(idxs), bsz)]
    for rep in range(2):            # rep 0 = compile, discarded
        t0 = time.perf_counter()
        n = 0
        for ch in chunks:
            n += len(ev.predict_couples(params, ch))
        dt = time.perf_counter() - t0
    results[f"B{bsz}"] = {
        "couples": n, "wall_s": round(dt, 3),
        "couples_per_s": round(n / dt, 2)}
    print(f"B={bsz}: {n} couples in {dt:.2f}s "
          f"({n / dt:.2f} couples/s)")

results["speedup_B4_over_B1"] = round(
    results["B4"]["couples_per_s"] / results["B1"]["couples_per_s"], 2)
results["setup"] = ("full val predict loop (host load + jit dispatch "
                    "+ fetch) over the 40-couple fixture, untrained "
                    "params, second sweep timed")
os.makedirs("results_r04", exist_ok=True)
with open("results_r04/eval_batch_ab.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r04/eval_batch_ab.json")
