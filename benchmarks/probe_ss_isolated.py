"""Isolate the second-stage backward cost term-by-term.

train_bwd_stages.json shows the second stage saturating at ~80 ms per
couple from B=4 while its raw work (three crop VJPs + the FC trunks)
prices out at ~15-20 ms at moderate MFU. This probe rebuilds the stage
STANDALONE — inputs are synthetic tower features + proposals at
production shapes — and times jit(grad) of nested prefixes:

  crops      — ss bev/img/corr crop_and_resize only (sum of crops)
  trunk      — crops + avod_trunk FCs
  full       — crops + trunk + corr head (the real stage)

each at the gather VJP and the matmul VJP, for B couples. Small
programs -> fast compiles, so the sweep is cheap compared to the
whole-model prefixes.

Run: python benchmarks/probe_ss_isolated.py [B ...]
Writes results_r05/ss_isolated.json (merging).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.ops.roi import crop_and_resize  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

BS = [int(a) for a in sys.argv[1:]] or [1, 4]
OUT = "results_r05/ss_isolated.json"

# production shapes (decode_stride=2 feature maps)
BH, BW, C = 350, 400, 32
IH, IW = 180, 600
K, S = 1024, 7

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


cfg = cfg_mod.cars_dt_tracking()
trunk = dt_avod.AvodTrunk(cfg.model.avod.fc_layer_sizes, (2, 10, 2),
                          cfg.model.avod.keep_prob,
                          cfg.model.avod.fusion_type,
                          cfg.model.avod.fusion_method,
                          dtype=jnp.bfloat16)

rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)

for B in BS:
    F = 2 * B  # frames
    bev = jnp.asarray(rng.rand(F, BH, BW, C), jnp.bfloat16)
    img = jnp.asarray(rng.rand(F, IH, IW, C), jnp.bfloat16)
    corr = jnp.asarray(rng.rand(B, BH, BW, 1), jnp.bfloat16)
    # proposal boxes: normalized [y1, x1, y2, x2], plausible BEV sizes
    cy = rng.rand(F, K, 1)
    cx = rng.rand(F, K, 1)
    hh = rng.uniform(0.01, 0.05, (F, K, 1))
    ww = rng.uniform(0.01, 0.05, (F, K, 1))
    bev_boxes = jnp.asarray(np.clip(np.concatenate(
        [cy - hh, cx - ww, cy + hh, cx + ww], -1), 0, 1), jnp.float32)
    img_boxes = jnp.asarray(np.clip(np.concatenate(
        [cy - 2 * hh, cx - ww, cy + 2 * hh, cx + ww], -1), 0, 1),
        jnp.float32)

    tvars = trunk.init(key, jnp.zeros((4, S * S * C)),
                       jnp.zeros((4, S * S * C)),
                       jnp.ones((4, 1)), jnp.ones((4, 1)), False)

    for method in ("auto", "auto_train"):
        tag = {"auto": "gather", "auto_train": "mmbwd"}[method]

        def crops_fn(bev, img, corr, bev_boxes, img_boxes):
            cb = jax.vmap(lambda m, bx: crop_and_resize(
                m, bx, S, method))(bev, bev_boxes)
            ci = jax.vmap(lambda m, bx: crop_and_resize(
                m, bx, S, method))(img, img_boxes)
            cc = jax.vmap(lambda m, bx: crop_and_resize(
                m, bx, S, method))(corr, bev_boxes[0::2])
            return cb, ci, cc

        def loss_crops(args):
            cb, ci, cc = crops_fn(*args)
            return (jnp.sum(cb.astype(jnp.float32))
                    + jnp.sum(ci.astype(jnp.float32))
                    + jnp.sum(cc.astype(jnp.float32)))

        def loss_trunk(args):
            cb, ci, cc = crops_fn(*args)
            n = cb.shape[0] * cb.shape[1]
            outs = trunk.apply(tvars, cb.reshape(n, -1),
                               ci.reshape(n, -1),
                               jnp.ones((n, 1)), jnp.ones((n, 1)),
                               False)
            return (sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                    + jnp.sum(cc.astype(jnp.float32)))

        args = (bev, img, corr, bev_boxes, img_boxes)
        for pname, lf in (("crops", loss_crops), ("trunk", loss_trunk)):
            name = f"{tag}_{pname}_B{B}"
            if name in results and "error" not in results[name]:
                continue
            try:
                g = jax.jit(jax.grad(lf))
                ms = timeit(g, args)
                results[name] = {"ms": round(ms, 1),
                                 "ms_per_couple": round(ms / B, 1)}
            except Exception as e:  # noqa: BLE001
                results[name] = {"error": type(e).__name__,
                                 "detail": str(e)[:300]}
            print(f"{name}: {results[name]}", flush=True)
            dump()

dump()
print(f"wrote {OUT}")
