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


def velodyne_like_points(rng, n):
    """Synthetic scan mimicking a 64-beam velodyne's density profile in
    the camera frame (x right, y down, z forward; sensor ~1.65 m above
    ground): ground returns whose range follows the beam elevation,
    range-decaying clutter, and a handful of car-like clusters. Real
    scans are highly non-uniform and the dense-lattice occupancy
    filter's work depends on that distribution, so the bench should
    not use uniform points."""
    beams = 64
    per = n // beams
    elev = np.radians(np.linspace(-24.8, 2.0, beams))[:, None]
    az = rng.uniform(-np.pi / 4.2, np.pi / 4.2, (beams, per))
    sensor_h = 1.65
    # ground-return range per beam; upward beams mostly see far clutter
    with np.errstate(divide="ignore"):
        r_ground = np.where(elev < -0.005, sensor_h / np.tan(-elev), 80.0)
    r = r_ground * rng.uniform(0.92, 1.08, (beams, per))
    # a third of returns hit vertical structure at a nearer range
    hit = rng.rand(beams, per) < 0.33
    r = np.where(hit, rng.uniform(4, 55, (beams, per)), r)
    r = np.clip(r, 2.0, 79.0)
    x = r * np.cos(elev) * np.sin(az)
    z = r * np.cos(elev) * np.cos(az)
    y = r * np.sin(-elev)  # camera y is down; negative elevation -> +y
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    # car-like clusters
    clusters = []
    for _ in range(12):
        cx, cz = rng.uniform(-20, 20), rng.uniform(6, 60)
        m = 220
        clusters.append(np.stack([
            cx + rng.uniform(-2.0, 2.0, m),
            rng.uniform(0.0, 1.6, m),
            cz + rng.uniform(-0.9, 0.9, m)], axis=1))
    cl = np.concatenate(clusters)
    # mix clusters INTO the scan, then subsample to exactly n (beams
    # alone already total ~n, so appending only a remainder would drop
    # the clusters entirely)
    pts = np.concatenate([pts, cl])
    idx = rng.permutation(len(pts))[:n]
    pts = pts[idx]
    if len(pts) < n:
        pts = np.concatenate(
            [pts, pts[rng.randint(0, len(pts), n - len(pts))]])
    return pts.astype(np.float32)


def make_batch(cfg, rng):
    p = cfg.dataset.max_points
    h, w = cfg.dataset.image_shape
    pts = velodyne_like_points(rng, p)
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

    # ---- streaming with ego-motion feature warp: the cost a MOVING
    # platform pays per keyframe (affine BEV feature+proposal warp into
    # the previous keyframe's coordinates instead of a tower re-encode;
    # highway speed: 1.2 m/frame x tau=3 between keyframes, slight yaw)
    th = np.radians(0.5)
    a2 = np.array([[np.cos(th), -np.sin(th)],
                   [np.sin(th), np.cos(th)]], np.float32)
    b2 = np.array([0.05, 3.6], np.float32)
    ego = (a2, b2)
    for _ in range(3):
        out = pred.push_keyframe(frame, fetch=False, ego_to_prev=ego)
    device_sync(out["final_boxes_3d"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pred.push_keyframe(frame, fetch=False, ego_to_prev=ego)
    device_sync(out["final_boxes_3d"])
    stream_ego_dt = (time.perf_counter() - t0) / n_iters

    # ---- MFU: XLA-counted model flops / (measured time x chip peak).
    # Count flops on the all-XLA twin (fused_interior=()): XLA's cost
    # analysis cannot see inside Pallas kernels, so lowering the fused
    # model would under-count exactly the convs the kernel runs and
    # make the faster path report a LOWER MFU.
    mfu = None
    flops = None
    try:
        import dataclasses as _dc
        cfg_x = cars_dt_tracking()
        cfg_x.dataset.max_points = cfg.dataset.max_points
        cfg_x.model.bev_extractor = _dc.replace(
            cfg_x.model.bev_extractor, fused_interior=())
        cfg_x.model.img_extractor = _dc.replace(
            cfg_x.model.img_extractor, fused_interior=())
        model_x = DtAvodNet(cfg=cfg_x, cluster_sizes=DEFAULT_CAR_CLUSTERS)
        apply_x = jax.jit(model_x.apply,
                          static_argnames=("train", "mode"))
        ca = (apply_x.lower(variables, batch, train=False, mode="val")
              .compile().cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = _peak_flops(jax.devices()[0])
        if flops > 0 and peak:
            mfu = flops / (pair_dt * peak)
    except Exception:
        pass

    dt = min(pair_dt, stream_dt)
    fps = TAU / dt
    print(json.dumps({
        "metric": "stream_fps_tau3",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "pair_latency_ms": round(pair_dt * 1000, 2),
        "stream_keyframe_ms": round(stream_dt * 1000, 2),
        "stream_keyframe_ms_ego": round(stream_ego_dt * 1000, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "pair_gflops": round(flops / 1e9, 1) if flops else None,
        "device": str(jax.devices()[0]),
    }))


def _peak_flops(device) -> float:
    """Peak bf16 FLOP/s for the chip (towers run in bfloat16)."""
    kind = getattr(device, "device_kind", str(device)).lower()
    # TPU v5e ("v5 lite"): 197 bf16 TFLOP/s; v4: 275; v5p: 459; v6e: 918
    table = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
             "v5p": 459e12, "v5": 459e12, "v6 lite": 918e12,
             "v6e": 918e12}
    for k, v in table.items():
        if k in kind:
            return v
    return 0.0


if __name__ == "__main__":
    main()
