#!/usr/bin/env python
"""Benchmark: streaming detection throughput of the flagship DT model.

Measures steady-state keyframe-pair latency of the full jitted forward
(device BEV rasterization -> siamese towers -> correlation -> two-stage
heads -> NMS) at production KITTI shapes on the available accelerator,
and reports frames/s with the tau=3 MoI amortization the reference
uses for its headline FPS (README table: DODT tau=3 S+T+M = 11.4 FPS).

Prints ONE JSON line:
  {"metric": "stream_fps_tau3", "value": ..., "unit": "frames/s",
   "vs_baseline": value / 11.4}
"""
import json
import time

import numpy as np

TAU = 3
BASELINE_FPS = 11.4  # reference DODT tau=3 S+T+M (BASELINE.md)


def make_batch(cfg, rng):
    p = cfg.dataset.max_points
    h, w = cfg.dataset.image_shape
    pts = np.stack([
        rng.uniform(-40, 40, p),
        rng.uniform(-1.0, 2.0, p),
        rng.uniform(0, 70, p)], axis=1).astype(np.float32)
    batch = {
        "points": np.stack([pts, pts + rng.normal(0, 0.05, pts.shape)
                            .astype(np.float32)])[None],
        "points_valid": np.ones((1, 2, p), bool),
        "image": rng.uniform(0, 255, (1, 2, h, w, 3)).astype(np.float32),
        "ground_plane": np.array([[0.0, -1.0, 0.0, 1.65]], np.float32),
        "p2": np.array([[[721.5, 0, 609.5, 44.9],
                         [0, 721.5, 172.8, 0.2],
                         [0, 0, 1.0, 0.003]]], np.float32),
        "orig_image_shape": np.array([[375, 1242]], np.int32),
    }
    return batch


def main():
    import jax
    import jax.numpy as jnp
    from dodt_tpu.config import cars_dt_tracking
    from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
    from dodt_tpu.models.dt_avod import DtAvodNet

    cfg = cars_dt_tracking()
    cfg.dataset.max_points = 65536
    model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)

    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, rng).items()}

    key = jax.random.PRNGKey(0)
    init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
    variables = init_fn({"params": key, "dropout": key, "pathdrop": key},
                        batch, train=False, mode="val")

    # Timing methodology: queue N async dispatches on device-resident
    # inputs, then force completion with one small host fetch.
    # (block_until_ready can return early on remote/tunneled platforms,
    # and a per-step host fetch would bill network round trips to the
    # chip.) Per-step cost = wall / N with the one round trip amortized.
    from dodt_tpu.utils.metrics import device_sync

    # ---- monolithic pair forward (keyframe pair recompute) ----------
    apply_fn = jax.jit(model.apply, static_argnames=("train", "mode"))

    def run(b):
        return apply_fn(variables, b, train=False, mode="val")

    device_sync(run(batch)["final_boxes_3d"])  # compile + settle
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(batch)
    device_sync(out["final_boxes_3d"])
    pair_dt = (time.perf_counter() - t0) / n_iters

    # ---- streaming path: one encode + one pair stage per keyframe ---
    from dodt_tpu.runtime.predictor import StreamingPredictor
    pred = StreamingPredictor(model, variables["params"])
    frame = {
        "points": batch["points"][:, 0],
        "points_valid": batch["points_valid"][:, 0],
        "image": batch["image"][:, 0],
        "ground_plane": batch["ground_plane"],
        "p2": batch["p2"],
        "orig_image_shape": batch["orig_image_shape"],
    }
    out = None
    for _ in range(3):  # compile + warm
        out = pred.push_keyframe(frame, fetch=False)
    device_sync(out["final_boxes_3d"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pred.push_keyframe(frame, fetch=False)
    device_sync(out["final_boxes_3d"])
    stream_dt = (time.perf_counter() - t0) / n_iters

    dt = min(pair_dt, stream_dt)
    fps = TAU / dt
    print(json.dumps({
        "metric": "stream_fps_tau3",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "pair_latency_ms": round(pair_dt * 1000, 2),
        "stream_keyframe_ms": round(stream_dt * 1000, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
