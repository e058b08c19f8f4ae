"""Towers-only backward forms across batch sizes (VERDICT r4 item 1).

train_bwd_stages.json localizes the superlinear backward growth; this
probe isolates the TOWERS term and asks which form fixes it:

  * store   — remat_towers=False (default): full-res activations kept.
  * remat   — remat_towers=True: towers recomputed in backward.

For each form and B in {1, 2, 4, 8}: time jit(grad(sum(tower
outputs))) — everything after the towers is dead-code-eliminated, so
this is the pure tower fwd+bwd cost, the term that must scale linearly
for batching to pay.

Run: python benchmarks/profile_tower_bwd_forms.py [max_log2]
Writes results_r05/tower_bwd_forms.json (merging).
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

MAX_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT = "results_r05/tower_bwd_forms.json"

root = tempfile.mkdtemp(prefix="towbwd_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=10,
                                 ego_speed=0.4, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0,)
ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
key = jax.random.PRNGKey(0)

results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))


def dump():
    os.makedirs("results_r05", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def timeit(fn, *args, n=8):
    out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000


TOWER_MODS = frozenset({"bev_vgg_pyr", "img_vgg_pyr"})

for remat in (False, True):
    cfg.model.remat_towers = remat
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
    tag = "remat" if remat else "store"
    for log2 in range(0, MAX_LOG2 + 1):
        b = 1 << log2
        name = f"{tag}_B{b}"
        if name in results and "error" not in results[name]:
            continue
        batch = {k: jnp.asarray(v)
                 for k, v in ds.next_batch(b, shuffle=False,
                                           augment=False).items()
                 if not isinstance(v, list)}
        variables = jax.jit(model.init,
                            static_argnames=("train", "mode"))(
            {"params": key, "dropout": key, "pathdrop": key}, batch,
            train=True, mode="train")
        params = variables["params"]

        def filt(mdl, _method):
            return mdl.name in TOWER_MODS

        def loss(p, batch, key):
            _, inter = model.apply(
                {"params": p}, batch, train=True, mode="train",
                rngs={"dropout": key, "pathdrop": key, "sampling": key},
                capture_intermediates=filt)
            leaves = jax.tree_util.tree_leaves(inter)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        try:
            g = jax.jit(jax.grad(loss))
            ms = timeit(g, params, batch, key)
        except Exception as e:  # noqa: BLE001 — OOMs are data
            results[name] = {"error": type(e).__name__,
                             "detail": str(e)[:300]}
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            dump()
            continue
        results[name] = {"ms": round(ms, 1),
                         "ms_per_couple": round(ms / b, 1)}
        print(f"{name}: {results[name]}", flush=True)
        dump()

dump()
print(f"wrote {OUT}")
