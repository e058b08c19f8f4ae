"""Locate the early-tower inefficiency (results_r03/tower_bisect.json:
the conv1+conv2 prefix runs ~10x above its compute/memory bounds).

Times isolated conv forms at the exact production shapes (B=1, bf16)
and reports achieved TFLOP/s against the 197 TFLOP/s bf16 peak:

  * conv1 standard (704x800x6 -> 32, 3x3 x2 + pool) vs the s2d stem
    form the model uses (352x400x24, 2x2 kernels, 4x channels)
  * conv2 block (352x400, 32 -> 64 -> 64, 3x3)
  * conv2 as explicit im2col matmul (same math, MXU-shaped contraction)
  * conv2 with 128 channels (not the same op — an MXU ceiling probe)
  * the full conv1+conv2 prefix fused in one jit

Run: python benchmarks/profile_conv_forms.py   (TPU)
Writes results_r03/conv_forms.json.
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

from dodt_tpu.utils.metrics import device_sync  # noqa: E402

REPS = 30
results = {}


def bench(name, fn, *args, flops=None):
    fn = jax.jit(fn)
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    row = {"ms": round(ms, 3)}
    if flops:
        row["tflops"] = round(flops / ms / 1e9, 1)
    results[name] = row
    print(f"{name:34s} {ms:8.3f} ms" +
          (f"  {row['tflops']:7.1f} TF/s" if flops else ""))
    return out


def conv(x, k, window_strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, window_strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


rng = np.random.RandomState(0)


def rnd(*shape):
    return jnp.asarray(rng.rand(*shape).astype(np.float32), jnp.bfloat16)


H, W = 704, 800
px = H * W

# ---- conv1 forms -----------------------------------------------------
x6 = rnd(1, H, W, 6)
k1a = rnd(3, 3, 6, 32)
k1b = rnd(3, 3, 32, 32)
fl = px * 9 * (6 * 32 + 32 * 32) * 2


def conv1_std(x, ka, kb):
    h = jax.nn.relu(conv(x, ka))
    h = jax.nn.relu(conv(h, kb))
    return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


bench("conv1 std 3x3 @704x800", conv1_std, x6, k1a, k1b, flops=fl)

xs2d = rnd(1, H // 2, W // 2, 24)
k1as = rnd(2, 2, 24, 128)
k1bs = rnd(2, 2, 128, 128)
fls = (px // 4) * 4 * (24 * 128 + 128 * 128) * 2


def conv1_s2d(x, ka, kb):
    h = jax.nn.relu(conv(x, ka))
    h = jax.nn.relu(conv(h, kb))
    return h.reshape(1, H // 2, W // 2, 2, 2, 32).max(axis=(3, 4))


bench("conv1 s2d 2x2 @352x400", conv1_s2d, xs2d, k1as, k1bs, flops=fls)

# ---- conv2 forms -----------------------------------------------------
h2, w2 = H // 2, W // 2
x32 = rnd(1, h2, w2, 32)
k2a = rnd(3, 3, 32, 64)
k2b = rnd(3, 3, 64, 64)
fl2 = (px // 4) * 9 * (32 * 64 + 64 * 64) * 2


def conv2_block(x, ka, kb):
    h = jax.nn.relu(conv(x, ka))
    return jax.nn.relu(conv(h, kb))


bench("conv2 block 3x3 @352x400", conv2_block, x32, k2a, k2b, flops=fl2)


def conv2_im2col(x, ka, kb):
    def one(x, k):
        ci, co = k.shape[2], k.shape[3]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + h2, dx:dx + w2] for dy in range(3)
                for dx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)      # (1,H,W,9Ci)
        return patches.reshape(-1, 9 * ci) @ k.reshape(9 * ci, co)
    h = jax.nn.relu(one(x, ka)).reshape(1, h2, w2, 64)
    return jax.nn.relu(one(h, kb)).reshape(1, h2, w2, 64)


bench("conv2 im2col matmul", conv2_im2col, x32, k2a, k2b, flops=fl2)

x128 = rnd(1, h2, w2, 128)
k128a = rnd(3, 3, 128, 128)
fl128 = (px // 4) * 9 * 128 * 128 * 2


def conv2_wide(x, k):
    return jax.nn.relu(conv(x, k))


bench("conv 3x3 128ch (MXU probe)", conv2_wide, x128, k128a,
      flops=fl128)

# ---- fused prefix ----------------------------------------------------
fl_pref = fls + fl2


def prefix(x, ka, kb, kc, kd):
    h = conv1_s2d(x, ka, kb)
    return conv2_block(h, kc, kd)


bench("s2d-conv1 + conv2 fused", prefix, xs2d, k1as, k1bs, k2a, k2b,
      flops=fl_pref)

# ---- image-tower twin ------------------------------------------------
Hi, Wi = 360, 1200
xi = rnd(1, Hi // 2, Wi // 2, 12)
ki_a = rnd(2, 2, 12, 128)
ki_b = rnd(2, 2, 128, 128)
fli = (Hi * Wi // 4) * 4 * (12 * 128 + 128 * 128) * 2


def img_conv1_s2d(x, ka, kb):
    h = jax.nn.relu(conv(x, ka))
    h = jax.nn.relu(conv(h, kb))
    return h.reshape(1, Hi // 2, Wi // 2, 2, 2, 32).max(axis=(3, 4))


bench("img conv1 s2d @180x600", img_conv1_s2d, xi, ki_a, ki_b,
      flops=fli)

# ---- batch scaling (the train sweep's superlinearity is forward-side:
# couples/s degrades 8.5 -> 5.1 from B=1 to B=8 with OR without remat,
# and the B=4 streams probe already showed negative inference scaling.
# Localize which conv form loses per-sample throughput with batch; the
# compile memory dump points at 4x lane-padding on 32-ch buffers) ----
for B in (1, 2, 4, 8):
    xb = rnd(B, h2, w2, 32)
    bench(f"conv2 block B={B} (per-B ms)",
          conv2_block, xb, k2a, k2b, flops=B * fl2)
    results[f"conv2 block B={B} (per-B ms)"]["per_sample_ms"] = round(
        results[f"conv2 block B={B} (per-B ms)"]["ms"] / B, 3)
for B in (1, 2, 4, 8):
    xb = rnd(B, h2, w2, 128)
    bench(f"conv 128ch B={B}", conv2_wide, xb, k128a, flops=B * fl128)
    results[f"conv 128ch B={B}"]["per_sample_ms"] = round(
        results[f"conv 128ch B={B}"]["ms"] / B, 3)
# batch folded into height: same conv math except at the B-1 seams;
# if this restores linear scaling the fix is layout, not bandwidth
for B in (2, 4, 8):
    xb = rnd(1, B * h2, w2, 32)
    bench(f"conv2 block B={B} folded-H", conv2_block, xb, k2a, k2b,
          flops=B * fl2)
    results[f"conv2 block B={B} folded-H"]["per_sample_ms"] = round(
        results[f"conv2 block B={B} folded-H"]["ms"] / B, 3)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/conv_forms.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r03/conv_forms.json")
