#!/usr/bin/env python
"""Tracking-only throughput (detection excluded) — the reference's
"DODT vs public" table reports 76.9 FPS for its tracker alone
(/root/reference/README.md:271,275, evaluated with kf_tracking.py).

Both of this repo's host-side trackers are timed on the same synthetic
detection stream at KITTI-like density (stream of per-frame detection
dicts — exactly what the Evaluator hands them):

* `track_through_ious` — the flagship offset-propagating IoU tracker
  (reference track_iou_v2 semantics + ego-aligned association).
* `kf_pipeline` — the Kalman baseline (reference kf_tracking.py).

Scene: N_OBJ cars on lanes with constant velocities + birth/death every
~30 frames, jittered boxes, FP_RATE spurious dets per frame. Density
matches KITTI tracking val (~5-15 cars/frame); a 2x density arm shows
the scaling. Pure host (numpy) work — no TPU involved.

Writes results_r03/tracker_fps.json.
Run: python benchmarks/bench_tracker.py [frames]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dodt_tpu.tracking.iou_tracker import track_through_ious  # noqa: E402
from dodt_tpu.tracking.kalman import kf_pipeline  # noqa: E402

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def make_stream(frames: int, n_obj: int, fp_rate: float, seed: int):
    """Per-frame detection dicts for n_obj tracks with birth/death."""
    rng = np.random.default_rng(seed)
    # lanes: x offset per object, all driving +z at 0.5-1.5 m/frame
    x0 = rng.uniform(-12, 12, n_obj)
    z0 = rng.uniform(5, 40, n_obj)
    vz = rng.uniform(0.5, 1.5, n_obj)
    phase = rng.integers(0, 30, n_obj)       # birth/death stagger
    stream = []
    for f in range(frames):
        dets = []
        for i in range(n_obj):
            if (f + phase[i]) % 40 >= 34:     # dead 6 of every 40
                continue
            z = (z0[i] + vz[i] * f) % 60.0 + 5.0
            box = np.array([x0[i] + rng.normal(0, 0.05), 1.0, z,
                            3.9, 1.6, 1.52,
                            rng.normal(0, 0.02)])
            dets.append({"frame_id": f, "box_3d": box,
                         "score": float(rng.uniform(0.6, 1.0)),
                         "offsets": np.array([0.0, vz[i], 0.0])})
        for _ in range(rng.poisson(fp_rate)):
            box = np.array([rng.uniform(-15, 15), 1.0,
                            rng.uniform(5, 60), 3.9, 1.6, 1.52, 0.0])
            dets.append({"frame_id": f, "box_3d": box,
                         "score": float(rng.uniform(0.1, 0.4)),
                         "offsets": np.zeros(3)})
        stream.append(dets)
    return stream


def time_tracker(fn, stream, repeats=3):
    best = float("inf")
    n_tracks = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        tracks = fn(stream)
        best = min(best, time.perf_counter() - t0)
        n_tracks = len(tracks)
    return best, n_tracks


results = {"reference_tracking_only_fps": 76.9}
for label, n_obj, fp in (("kitti_density", 10, 2.0),
                         ("dense_2x", 20, 4.0)):
    stream = make_stream(FRAMES, n_obj, fp, seed=0)
    n_dets = sum(len(f) for f in stream)
    arm = {"frames": FRAMES, "dets_total": n_dets,
           "dets_per_frame": round(n_dets / FRAMES, 1)}
    s, k = time_tracker(
        lambda st: track_through_ious(st, high_threshold=0.5,
                                      iou_threshold=0.005, t_min=3,
                                      ttl=2), stream)
    arm["iou_tracker"] = {"wall_s": round(s, 3),
                          "fps": round(FRAMES / s, 1),
                          "tracks": k,
                          "vs_reference": round(FRAMES / s / 76.9, 1)}
    s, k = time_tracker(lambda st: kf_pipeline(st), stream)
    arm["kalman"] = {"wall_s": round(s, 3),
                     "fps": round(FRAMES / s, 1),
                     "tracks": k,
                     "vs_reference": round(FRAMES / s / 76.9, 1)}
    results[label] = arm
    print(label, json.dumps(arm))

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/tracker_fps.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r03/tracker_fps.json")
