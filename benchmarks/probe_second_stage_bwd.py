"""A/B the second-stage backward forms at fixed batch (VERDICT r4
item 1 follow-up).

results_r05/train_bwd_stages.json localizes the superlinear backward
term: towers scale fine by B=4 (45 -> 26.1 ms/couple) but the second
stage grows 40.9 -> 57.1 -> 80.6 ms/couple. The candidates live in the
crop-and-resize VJP (ops/roi.py): the matmul-form backward's chunked
rowred scan (granularity _BWD_CHUNK) vs the plain gather/scatter VJP.
This probe times the FULL train step (make_train_step, the metric
train_batched.json records) per arm:

  * mm_c128 / mm_c256 / mm_c512 — matmul VJP, chunk granularity sweep
  * mm_nochunk — matmul VJP, rowred materialized whole
  * gather — plain gather forward/scatter backward
  * any arm + "_remat" — same, with remat_towers=True (if the
    superlinear term is HBM-pressure spills at peak liveness — tower
    activations alive across the second stage — remat buys headroom)

Run: python benchmarks/probe_second_stage_bwd.py [B] [arm ...]
Writes results_r05/second_stage_bwd.json (merging; keyed arm_B{B}).
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

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.ops import roi  # noqa: E402
from dodt_tpu.runtime import trainer as trainer_lib  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ARMS = sys.argv[2:] or ["mm_c128", "mm_c256", "mm_c512", "mm_nochunk",
                        "gather"]
OUT = "results_r05/second_stage_bwd.json"

root = tempfile.mkdtemp(prefix="ssbwd_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
key = jax.random.PRNGKey(0)

results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))


def dump():
    os.makedirs("results_r05", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


for arm in ARMS:
    name = f"{arm}_B{B}"
    if name in results and "error" not in results[name]:
        continue
    cfg = cfg_mod.cars_dt_tracking()
    cfg.dataset.dataset_dir = root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0,)
    arm, remat_tag, _ = arm.partition("_remat")
    cfg.model.remat_towers = bool(remat_tag)
    if arm == "gather":
        cfg.model.train_crop_vjp = "gather"
        roi._BWD_CHUNK = 128
        roi._BWD_CHUNK_BYTES = 64 * 1024 * 1024
    else:
        cfg.model.train_crop_vjp = "mmbwd"
        if arm == "mm_nochunk":
            roi._BWD_CHUNK_BYTES = 1 << 60
        else:
            roi._BWD_CHUNK = int(arm.split("_c")[1])
            roi._BWD_CHUNK_BYTES = 64 * 1024 * 1024
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    batch = {k: jnp.asarray(v)
             for k, v in ds.next_batch(B, shuffle=False,
                                       augment=False).items()
             if not isinstance(v, list)}
    try:
        state = trainer_lib.create_train_state(cfg, model, batch, key)
        step_fn = trainer_lib.make_train_step(cfg, model)
        state, losses = step_fn(state, batch, key)
        device_sync(losses["total"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = step_fn(state, batch, key)
        device_sync(losses["total"])
        ms = (time.perf_counter() - t0) / n * 1000
        results[name] = {"device_ms_per_step": round(ms, 1),
                         "couples_per_s": round(B / ms * 1000, 2)}
    except Exception as e:  # noqa: BLE001
        results[name] = {"error": type(e).__name__,
                         "detail": str(e).splitlines()[0][:300]
                         if str(e) else ""}
    print(f"{name}: {results[name]}", flush=True)
    dump()
    try:
        del state, losses
    except NameError:
        pass

dump()
print(f"wrote {OUT}")
