"""Per-stage backward roofline for batched training (VERDICT r3 item 2).

train_batched.json shows couples/s essentially FLAT in batch size
(store 9.45 -> 8.25 from B=1 to 4) with device ms/step scaling
~linearly. Flat couples/s means batching buys nothing — which is only
legitimate if every stage of the step is already THROUGHPUT-bound at
B=1 (the chip saturated, nothing latency- or dispatch-bound left to
amortize). This script proves or refutes that per stage:

For cumulative prefixes of the train step (towers -> RPN heads ->
second stage -> full loss), time jit(grad(prefix_loss)) at each batch
size. A prefix loss is the sum of the captured intermediates of the
stage's modules, so XLA dead-code-eliminates everything after the
stage in BOTH forward and backward; consecutive differences are true
marginal fwd+bwd stage costs. If marginal per-couple cost is flat in
B for every stage, each stage scales linearly on its own — the step is
compute/memory-throughput-bound at B=1 and the batching ceiling is
structural, not a fixable serialization.

Also localizes the B=8 compile failure: per-stage prefixes are smaller
programs, so whichever prefix first trips the remote-compile error
names the stage whose backward blows up the compile.

Run: python benchmarks/profile_train_bwd_stages.py [max_log2]
Writes results_r05/train_bwd_stages.json.
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
MIN_LOG2 = int(sys.argv[2]) if len(sys.argv) > 2 else 0

root = tempfile.mkdtemp(prefix="bwdstage_")
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

# cumulative module sets, pipeline order
STAGES = [
    ("towers", {"bev_vgg_pyr", "img_vgg_pyr"}),
    ("rpn_heads", {"rpn_cls", "rpn_reg"}),
    ("second_stage", {"avod_fc", "corr_fc", "bev_corr_bottleneck"}),
]

results = {"method": __doc__.split("\n\n")[1]}
# resumable: remote-TPU compiles can outlive a wall-clock bound, so a
# re-run with MIN_LOG2 merges into the existing artifact
if os.path.exists("results_r05/train_bwd_stages.json"):
    results.update(json.load(open("results_r05/train_bwd_stages.json")))


def dump():
    os.makedirs("results_r05", exist_ok=True)
    with open("results_r05/train_bwd_stages.json", "w") as f:
        json.dump(results, f, indent=2)


def timeit(fn, *args, n=8):
    out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000


for log2 in range(MIN_LOG2, MAX_LOG2 + 1):
    b = 1 << log2
    batch = {k: jnp.asarray(v)
             for k, v in ds.next_batch(b, shuffle=False,
                                       augment=False).items()
             if not isinstance(v, list)}
    variables = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": key, "dropout": key, "pathdrop": key}, batch,
        train=True, mode="train")
    params = variables["params"]

    rows = []
    cum_mods = set()
    prev = 0.0
    for label, mods in STAGES:
        cum_mods |= mods
        mods_now = frozenset(cum_mods)

        def filt(mdl, _method, mods_now=mods_now):
            return mdl.name in mods_now

        def prefix_loss(p, batch, key, filt=filt):
            _, inter = model.apply(
                {"params": p}, batch, train=True, mode="train",
                rngs={"dropout": key, "pathdrop": key, "sampling": key},
                capture_intermediates=filt)
            leaves = jax.tree_util.tree_leaves(inter)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        try:
            g = jax.jit(jax.grad(prefix_loss))
            ms = timeit(g, params, batch, key)
        except Exception as e:  # noqa: BLE001 — record which prefix dies
            rows.append({"stage": label, "error": type(e).__name__,
                         "detail": str(e)[:300]})
            print(f"B={b} {label}: FAILED {type(e).__name__}",
                  flush=True)
            prev = float("nan")
            continue
        rows.append({"stage": label, "cum_ms": round(ms, 1),
                     "marginal_ms": round(ms - prev, 1),
                     "marginal_per_couple_ms": round((ms - prev) / b, 1)})
        prev = ms
        print(f"B={b} {label}: cum {ms:.1f} ms "
              f"(marginal/couple {rows[-1]['marginal_per_couple_ms']})",
              flush=True)

    def full_loss(p, batch, key):
        out = model.apply({"params": p}, batch, train=True, mode="train",
                          rngs={"dropout": key, "pathdrop": key,
                                "sampling": key})
        total, _ = dt_avod.compute_losses(cfg, out, batch, key)
        return total

    try:
        g = jax.jit(jax.grad(full_loss))
        ms = timeit(g, params, batch, key)
        rows.append({"stage": "full_loss", "cum_ms": round(ms, 1),
                     "marginal_ms": round(ms - prev, 1),
                     "marginal_per_couple_ms": round((ms - prev) / b, 1)})
        print(f"B={b} full_loss: cum {ms:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        rows.append({"stage": "full_loss", "error": type(e).__name__,
                     "detail": str(e)[:300]})
        print(f"B={b} full_loss: FAILED {type(e).__name__}", flush=True)

    results[f"B{b}"] = rows
    dump()

print("wrote results_r05/train_bwd_stages.json")
