"""Micro A/B of BEV feature-warp formulations at the production map
shape (352, 400, 64) — the streaming ego arm pays ~3.2 ms per keyframe
for the affine feature warp (stream_keyframe_ms_ego 16.4 vs 13.3,
results_r04/roofline.md).

TPU gathers are descriptor-bound (one gather row per output element),
not byte-bound, so packing the 4 bilinear corners as channel groups of
ONE gather (neighbor map built with two cheap shifted pads) wins ~2.1x;
a bf16 payload (the towers' compute dtype anyway) is what makes the
packed row narrow enough to pay off — measured here, shipped as
ops/warp.warp_bev_features(method="packed").

Run on TPU: python benchmarks/probe_warp_forms.py
Writes results_r04/warp_forms.json.
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

from dodt_tpu.ops.warp import warp_bev_features  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

H, W, C = 352, 400, 64
BEV_EXTENTS = [[-40.0, 40.0], [0.0, 70.0]]
TH = np.radians(0.5)
A2 = np.array([[np.cos(TH), -np.sin(TH)], [np.sin(TH), np.cos(TH)]],
              np.float32)
B2 = np.array([0.05, 3.6], np.float32)


def timeit(fn, *args, n=50):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(H, W, C), jnp.float32)
    a2 = jnp.asarray(A2)
    b2 = jnp.asarray(B2)

    forms = {
        "gather4_f32": jax.jit(lambda f, a, b: warp_bev_features(
            f, a, b, BEV_EXTENTS, method="gather4")),
        "packed_bf16": jax.jit(lambda f, a, b: warp_bev_features(
            f, a, b, BEV_EXTENTS, method="packed")),
    }

    ref = np.asarray(forms["gather4_f32"](feats, a2, b2))
    res = {}
    for name, fn in forms.items():
        ms = timeit(fn, feats, a2, b2)
        out = np.asarray(fn(feats, a2, b2))
        err = float(np.max(np.abs(out - ref)))
        res[name] = {"ms": round(ms, 3), "maxdiff_vs_f32": round(err, 5)}
        print(f"{name:14s} {ms:7.3f} ms  maxdiff {err:.5f}", flush=True)

    os.makedirs("results_r04", exist_ok=True)
    with open("results_r04/warp_forms.json", "w") as f:
        json.dump(res, f, indent=2)
    print("wrote results_r04/warp_forms.json")


if __name__ == "__main__":
    main()
