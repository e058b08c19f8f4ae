"""A/B the ROI crop-and-resize variants at the model's production
shapes on the real chip (feeds the roi.auto_method dispatch rules and
results_r03/roofline.md).

Second stage (the gather-bound survivor after the pass-2 matmul form):
K proposals x 7x7 crops from the 32-ch f32 feature maps. Variants:

* gather4      — current c>8 path: 4 separate gathers
* packed       — pack the 4 bilinear taps into channels (4C-wide map,
                 built once per map, ONE gather per sample): trades a
                 4x map materialization for 4x fewer accesses; TPU
                 gathers are per-access bound, so this should win
                 whenever the map build amortizes over the crop batch
* gather4_bf16 / packed_bf16 — same with bf16 maps (half the bytes
                 per access; the consumer trunk is bf16 anyway)
* matmul       — the interp-matmul form (known-bad at c=32, for the
                 record)

Run: python benchmarks/profile_roi_crop.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu.ops import roi, roi_pallas  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402


def timeit(name, fn, n=50):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name}: {dt:.3f} ms", flush=True)
    return dt


def packed_crop(image, boxes_norm, crop_size):
    """Packed-tap gather for ANY channel count (the c<=8 path's
    strategy applied to wide maps)."""
    h, w, c = image.shape
    packed = roi.pack_bilinear_taps(image)
    ys = roi.sample_grid(boxes_norm, h, boxes_norm[:, 0],
                         boxes_norm[:, 2], crop_size)
    xs = roi.sample_grid(boxes_norm, w, boxes_norm[:, 1],
                         boxes_norm[:, 3], crop_size)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    y_frac = (ys - y0f)[:, :, None, None]
    x_frac = (xs - x0f)[:, None, :, None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    taps = packed[y0[:, :, None], x0[:, None, :]]
    tl = taps[..., 0 * c:1 * c]
    tr = taps[..., 1 * c:2 * c]
    bl = taps[..., 2 * c:3 * c]
    br = taps[..., 3 * c:4 * c]
    top_i = tl + (tr - tl) * x_frac
    bot_i = bl + (br - bl) * x_frac
    return top_i + (bot_i - top_i) * y_frac


rng = np.random.RandomState(0)
SHAPES = [
    # (name, map_hwc, num_boxes_per_frame, crop_size, frames)
    ("second-stage img (eval K=300)", (180, 600, 32), 300, 7, 2),
    ("second-stage bev (eval K=300)", (352, 400, 32), 300, 7, 2),
    ("second-stage img (train K=1024)", (180, 600, 32), 1024, 7, 2),
    ("pass-2 rank bottleneck", (180, 600, 1), 8192, 3, 2),
]

results = {}
for name, (h, w, c), k, s, f in SHAPES:
    img = jnp.asarray(rng.rand(f, h, w, c).astype(np.float32))
    boxes = rng.rand(f, k, 4).astype(np.float32)
    boxes = np.sort(boxes.reshape(f, k, 2, 2), axis=2).reshape(f, k, 4)
    boxes = jnp.asarray(boxes)
    print(f"== {name}: {f}x{k} x {s}x{s} from {h}x{w}x{c}")
    variants = {
        "gather4": jax.jit(jax.vmap(
            lambda im, bx: roi.crop_and_resize(im, bx, s,
                                               method="gather"))),
        "packed": jax.jit(jax.vmap(
            lambda im, bx: packed_crop(im, bx, s))),
        "gather4_bf16": jax.jit(jax.vmap(
            lambda im, bx: roi.crop_and_resize(
                im.astype(jnp.bfloat16), bx, s,
                method="gather").astype(jnp.float32))),
        "packed_bf16": jax.jit(jax.vmap(
            lambda im, bx: packed_crop(
                im.astype(jnp.bfloat16), bx, s).astype(jnp.float32))),
        "matmul": jax.jit(jax.vmap(
            lambda im, bx: roi.crop_and_resize(im, bx, s,
                                               method="matmul"))),
    }
    if h >= 64 and w >= 64:
        # windowed Pallas form (ops/roi_pallas.py) — the model's eval
        # dispatch for metric-bounded BEV maps
        variants["window"] = jax.jit(jax.vmap(
            lambda im, bx: roi_pallas.crop_and_resize_window(
                im, bx, s, window=64).astype(jnp.float32)))
    row = {}
    for vname, fn in variants.items():
        if vname == "matmul" and k >= 1024 and c > 2:
            print(f"  {vname}: skipped (OOM-scale rowred)", flush=True)
            continue
        try:
            row[vname] = timeit(vname, lambda fn=fn: fn(img, boxes))
        except Exception as e:  # noqa: BLE001
            print(f"  {vname}: FAILED {type(e).__name__}", flush=True)
    results[name] = row

import json  # noqa: E402
os.makedirs("results_r03", exist_ok=True)
with open("results_r03/roi_crop_ab.json", "w") as fo:
    json.dump(results, fo, indent=2)
print("wrote results_r03/roi_crop_ab.json")
