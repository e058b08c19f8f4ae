"""Isolate the B=8 train-step compile failure (r4 train_batched.json:
remat_B8 died with `remote_compile: HTTP 500: tpu_compile_helper
subprocess exit code 1` and the sweep never reached store_B8).

Runs ONLY B=8, both remat arms, with full error capture, and tries the
obvious mitigations one at a time so the artifact can say WHICH of them
(if any) unblocks the compile:
  * baseline            — exactly what the sweep ran
  * no-donate           — drop buffer donation (donation bloats live
                          ranges during compile on some backends)
  * flags               — XLA_FLAGS autotune level 0 (must be set in the
                          environment before process start; recorded
                          here only as an instruction, not attempted)

Usage: python benchmarks/probe_train_b8.py [remat|store] [--no-donate]
Prints one JSON line per attempt; caller merges into train_batched.json.
"""
import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime import trainer as trainer_lib  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

arm = sys.argv[1] if len(sys.argv) > 1 else "remat"
donate = "--no-donate" not in sys.argv

root = tempfile.mkdtemp(prefix="trainb8_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0,)
cfg.model.remat_towers = arm == "remat"

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
key = jax.random.PRNGKey(0)

batch_np = ds.next_batch(8, shuffle=False, augment=False)
batch = {k: jnp.asarray(v) for k, v in batch_np.items()
         if not isinstance(v, list)}

row = {"arm": arm, "donate": donate, "B": 8}
try:
    state = trainer_lib.create_train_state(cfg, model, batch, key)
    step_fn = trainer_lib.make_train_step(cfg, model)
    t0 = time.perf_counter()
    state, losses = step_fn(state, batch, key)
    device_sync(losses["total"])
    row["compile_s"] = round(time.perf_counter() - t0, 1)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, losses = step_fn(state, batch, key)
    device_sync(losses["total"])
    dt_ms = (time.perf_counter() - t0) / n * 1000
    row["device_ms_per_step"] = round(dt_ms, 1)
    row["couples_per_s"] = round(8 / dt_ms * 1000, 2)
except Exception as e:  # noqa: BLE001
    row["error"] = type(e).__name__
    row["detail"] = str(e)[:2000]
    traceback.print_exc()
print(json.dumps(row))
