"""Split the batched-train superlinearity between forward and backward.

Isolated conv blocks scale SUBLINEARLY with batch (per-sample TF/s
improves ~2.3x from B=1 to 8 — results_r03/conv_forms.json), yet the
full train step degrades from 8.5 to 5.1 couples/s (train_batched.json,
remat and store alike). This times, at each batch size:

  * loss-only forward (mode='train', no grad) — all forward stages
    including mini-batch target assignment,
  * loss + grad (jax.value_and_grad, as the train step runs it),

so bwd = grad_time - fwd_time isolates where the superlinear term
lives. Prime suspect: the gather-form ROI crops' VJP is a scatter-add
over B x K x 49 x 4 taps, and TPU scatters serialize.

Run: python benchmarks/profile_train_fwd_bwd.py [max_log2]
Writes results_r04/train_fwd_bwd.json.
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
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

MAX_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 2

root = tempfile.mkdtemp(prefix="fwdbwd_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0,)

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
key = jax.random.PRNGKey(0)

results = {}


def dump():
    os.makedirs("results_r04", exist_ok=True)
    with open("results_r04/train_fwd_bwd.json", "w") as f:
        json.dump(results, f, indent=2)


def timeit(fn, *args, n=10):
    out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000


for log2 in range(0, MAX_LOG2 + 1):
    b = 1 << log2
    batch = {k: jnp.asarray(v)
             for k, v in ds.next_batch(b, shuffle=False,
                                       augment=False).items()
             if not isinstance(v, list)}
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": key, "dropout": key, "pathdrop": key}, batch,
        train=True, mode="train")
    params = variables["params"]

    def loss_fn(p, batch, key):
        out = model.apply({"params": p}, batch, train=True, mode="train",
                          rngs={"dropout": key, "pathdrop": key,
                                "sampling": key})
        total, _ = dt_avod.compute_losses(cfg, out, batch, key)
        return total

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn))
    fwd_ms = timeit(fwd, params, batch, key)
    grad_ms = timeit(grad, params, batch, key)
    row = {"fwd_ms": round(fwd_ms, 1), "fwd_plus_bwd_ms": round(grad_ms, 1),
           "bwd_ms": round(grad_ms - fwd_ms, 1),
           "fwd_per_couple": round(fwd_ms / b, 1),
           "bwd_per_couple": round((grad_ms - fwd_ms) / b, 1)}
    results[f"B{b}"] = row
    print(f"B={b}: {row}", flush=True)
    dump()

print("wrote results_r04/train_fwd_bwd.json")
