#!/usr/bin/env python
"""A/B the windowed Pallas second-stage BEV crop on real hardware.

1. Op-level: compiled (non-interpret) kernel vs the gather path at the
   production second-stage shape (350x400x32 bf16, K=300 crops).
2. Model-level: full eval forward with avod.bev_roi_window=64 vs 0 —
   max |final_scores| delta and pair latency both ways.

Writes results_r03/window_roi_ab.json.
"""
import json
import time

import numpy as np

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu.ops import roi, roi_pallas  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402


def op_level():
    rng = np.random.RandomState(0)
    h, w, c, k, s = 350, 400, 32, 300, 7
    img = jnp.asarray(rng.rand(h, w, c).astype(np.float32), jnp.bfloat16)
    # metric-bounded boxes: spans <= ~45 px of the 350x400 map
    y1 = rng.uniform(0, 0.85, k)
    x1 = rng.uniform(0, 0.88, k)
    boxes = np.stack([y1, x1,
                      y1 + rng.uniform(0.01, 0.12, k),
                      x1 + rng.uniform(0.01, 0.10, k)], axis=1)
    boxes = jnp.asarray(boxes.astype(np.float32))

    win = jax.jit(lambda im, bx: roi_pallas.crop_and_resize_window(
        im, bx, s, window=64))
    gat = jax.jit(lambda im, bx: roi.crop_and_resize(
        im, bx, s, method="gather"))
    a = np.array(win(img, boxes), np.float32)
    b = np.array(gat(img, boxes), np.float32)
    err = float(np.abs(a - b).max())

    def t(fn):
        device_sync(fn(img, boxes))
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(img, boxes)
        device_sync(out)
        return (time.perf_counter() - t0) / 50 * 1e3

    return {"max_abs_err": err, "window_ms": t(win), "gather_ms": t(gat)}


def model_level():
    from bench import make_batch
    from dodt_tpu.config import cars_dt_tracking
    from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
    from dodt_tpu.models.dt_avod import DtAvodNet

    rng = np.random.RandomState(0)
    res = {}
    outs = {}
    for name, window in (("window64", 64), ("generic", 0)):
        cfg = cars_dt_tracking()
        cfg.dataset.max_points = 65536
        cfg.model.avod.bev_roi_window = window
        model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)
        batch = {k: jnp.asarray(v)
                 for k, v in make_batch(cfg, np.random.RandomState(0)).items()}
        key = jax.random.PRNGKey(0)
        init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
        variables = init_fn({"params": key, "dropout": key,
                             "pathdrop": key}, batch,
                            train=False, mode="val")
        apply_fn = jax.jit(model.apply, static_argnames=("train", "mode"))
        out = apply_fn(variables, batch, train=False, mode="val")
        device_sync(out["final_boxes_3d"])
        t0 = time.perf_counter()
        for _ in range(20):
            out = apply_fn(variables, batch, train=False, mode="val")
        device_sync(out["final_boxes_3d"])
        res[name + "_pair_ms"] = (time.perf_counter() - t0) / 20 * 1e3
        outs[name] = {k: np.array(v, np.float32)
                      for k, v in out.items()
                      if k in ("final_scores", "final_boxes_3d")}
    res["score_max_delta"] = float(np.abs(
        np.sort(outs["window64"]["final_scores"], axis=-1)
        - np.sort(outs["generic"]["final_scores"], axis=-1)).max())
    return res


if __name__ == "__main__":
    out = {"op": op_level(), "model": model_level(),
           "device": str(jax.devices()[0])}
    print(json.dumps(out, indent=2))
    Path("results_r03/window_roi_ab.json").write_text(
        json.dumps(out, indent=2))
