"""Detection AP parity vs the OFFICIAL KITTI C++ evaluator.

The reference vendors the official scorer at scripts/offline_eval/
kitti_native_eval/evaluate_object_3d_offline.cpp. It is compiled here
with a minimal boost shim (tests/oracles/boost_shim — ublas 2x2 matmul
+ convex polygon intersection, the only boost surface the scorer
touches) and used as the oracle: randomized multi-frame scenes are
written as KITTI txt, scored by the official binary, and compared to
dodt_tpu.eval.kitti_ap on all 3 metrics x 3 difficulties.

The protocol logic under test (candidate selection, ignore/absorption
rules, threshold discretization, 11-of-41-point AP) is entirely the
official code's; only the polygon-clipping primitives come from the
shim, and those are exact convex geometry either way.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from dodt_tpu.eval import kitti_ap

OFFICIAL_CPP = ("/root/reference/scripts/offline_eval/"
                "kitti_native_eval/evaluate_object_3d_offline.cpp")
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "oracles", "boost_shim")

pytestmark = pytest.mark.skipif(
    not os.path.exists(OFFICIAL_CPP), reason="reference not mounted")


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp("bin") / "eval_3d_offline"
    r = subprocess.run(
        ["g++", "-O2", "-I", SHIM_DIR, "-I", os.path.dirname(OFFICIAL_CPP),
         OFFICIAL_CPP, "-o", str(out)], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:500]}")
    return str(out)


def _f(x):
    """Round-trip through the %.6f text format both sides consume."""
    return float(f"{x:.6f}")


def _random_scene(rng, n_frames, cls="Car"):
    """Random GT + detections per frame. GT boxes_3d are
    [x y z l w h ry] (camera frame, y = bottom); txt rows carry
    h w l X Y Z ry. 2D bboxes are independent random boxes so image
    and 3D metrics exercise different geometry."""
    gts, dets = [], []
    for _ in range(n_frames):
        n_gt = rng.randint(2, 9)
        g_types, g_trunc, g_occ = [], [], []
        g_box7, g_bbox = [], []
        dontcare = []
        d_types, d_scores, d_box7, d_bbox = [], [], [], []
        for i in range(n_gt):
            r = rng.rand()
            typ = ("Car" if r < 0.6 else
                   "Van" if r < 0.75 else
                   "Pedestrian" if r < 0.9 else "Cyclist")
            x = _f(rng.uniform(-30, 30))
            z = _f(rng.uniform(5, 60))
            y = _f(rng.uniform(1.0, 2.0))
            l = _f(rng.uniform(3.0, 5.0))
            w = _f(rng.uniform(1.4, 2.0))
            h = _f(rng.uniform(1.3, 1.8))
            ry = _f(rng.uniform(-np.pi, np.pi))
            bx = _f(rng.uniform(0, 1100))
            by = _f(rng.uniform(50, 300))
            bw = _f(rng.uniform(30, 140))
            bh = _f(rng.uniform(18, 120))   # some below height gates
            g_types.append(typ)
            g_trunc.append(_f(rng.choice([0.0, 0.1, 0.2, 0.4, 0.6])))
            g_occ.append(int(rng.randint(0, 4)))
            g_box7.append([x, y, z, l, w, h, ry])
            g_bbox.append([bx, by, _f(bx + bw), _f(by + bh)])
            # detection: usually a jittered copy; class usually right
            if rng.rand() < 0.8:
                jit3 = rng.uniform(-0.4, 0.4, 3)
                jb = rng.uniform(-8, 8, 4)
                d_types.append(typ if rng.rand() < 0.9 else "Car")
                d_scores.append(_f(rng.uniform(0.05, 1.0)))
                d_box7.append([_f(x + jit3[0]), _f(y + jit3[1] * 0.2),
                               _f(z + jit3[2]), _f(l * rng.uniform(0.9, 1.1)),
                               _f(w * rng.uniform(0.9, 1.1)),
                               _f(h * rng.uniform(0.9, 1.1)),
                               _f(ry + rng.uniform(-0.1, 0.1))])
                d_bbox.append([_f(bx + jb[0]), _f(by + jb[1]),
                               _f(bx + bw + jb[2]), _f(by + bh + jb[3])])
        # pure false positives (some tiny)
        for k in range(rng.randint(0, 4)):
            bx = _f(rng.uniform(0, 1100))
            by = _f(rng.uniform(50, 300))
            bh = _f(rng.uniform(10, 80))
            d_types.append("Car")
            d_scores.append(_f(rng.uniform(0.05, 1.0)))
            d_box7.append([_f(rng.uniform(-30, 30)), _f(1.6),
                           _f(rng.uniform(5, 60)), _f(4.0), _f(1.6),
                           _f(1.5), _f(rng.uniform(-np.pi, np.pi))])
            d_bbox.append([bx, by, _f(bx + rng.uniform(30, 120)),
                           _f(by + bh)])
        # DontCare regions
        for k in range(rng.randint(0, 2)):
            bx = _f(rng.uniform(0, 1100))
            by = _f(rng.uniform(50, 300))
            dontcare.append([bx, by, _f(bx + rng.uniform(60, 250)),
                             _f(by + rng.uniform(40, 120))])

        gts.append(kitti_ap.FrameGt(
            boxes_3d=np.array(g_box7, float).reshape(-1, 7),
            bbox_2d=np.array(g_bbox, float).reshape(-1, 4),
            types=g_types,
            occlusion=np.array(g_occ, float),
            truncation=np.array(g_trunc, float),
            dontcare=np.array(dontcare, float).reshape(-1, 4)))
        dets.append(kitti_ap.FrameDet(
            boxes_3d=np.array(d_box7, float).reshape(-1, 7),
            bbox_2d=np.array(d_bbox, float).reshape(-1, 4),
            scores=np.array(d_scores, float),
            types=d_types))
    return gts, dets


def _write_scene(tmp, gts, dets):
    gt_dir = tmp / "gt"
    data_dir = tmp / "res" / "data"
    gt_dir.mkdir(parents=True, exist_ok=True)
    data_dir.mkdir(parents=True, exist_ok=True)
    for f, (gt, det) in enumerate(zip(gts, dets)):
        with open(gt_dir / f"{f:06d}.txt", "w") as fh:
            for i in range(len(gt.types)):
                b7 = gt.boxes_3d[i]
                bb = gt.bbox_2d[i]
                # type trunc occ alpha x1 y1 x2 y2 h w l X Y Z ry
                fh.write(
                    f"{gt.types[i]} {gt.truncation[i]:.6f} "
                    f"{int(gt.occlusion[i])} 0.0 "
                    f"{bb[0]:.6f} {bb[1]:.6f} {bb[2]:.6f} {bb[3]:.6f} "
                    f"{b7[5]:.6f} {b7[4]:.6f} {b7[3]:.6f} "
                    f"{b7[0]:.6f} {b7[1]:.6f} {b7[2]:.6f} {b7[6]:.6f}\n")
            for dc in gt.dontcare:
                fh.write(f"DontCare -1 -1 -10 {dc[0]:.6f} {dc[1]:.6f} "
                         f"{dc[2]:.6f} {dc[3]:.6f} "
                         f"-1 -1 -1 -1000 -1000 -1000 -10\n")
        with open(data_dir / f"{f:06d}.txt", "w") as fh:
            for i in range(len(det.types)):
                b7 = det.boxes_3d[i]
                bb = det.bbox_2d[i]
                fh.write(
                    f"{det.types[i]} -1 -1 0.5 "
                    f"{bb[0]:.6f} {bb[1]:.6f} {bb[2]:.6f} {bb[3]:.6f} "
                    f"{b7[5]:.6f} {b7[4]:.6f} {b7[3]:.6f} "
                    f"{b7[0]:.6f} {b7[1]:.6f} {b7[2]:.6f} {b7[6]:.6f} "
                    f"{det.scores[i]:.6f}\n")
    return str(gt_dir), str(tmp / "res")


def _run_oracle(oracle_bin, gt_dir, res_dir, cls="car"):
    r = subprocess.run([oracle_bin, gt_dir, res_dir],
                       capture_output=True, text=True)
    out = {}
    for line in r.stdout.splitlines():
        parts = line.split()
        if len(parts) == 5 and parts[1] == "AP:":
            out[parts[0]] = [float(v) for v in parts[2:5]]
    metrics = {}
    if f"{cls}_detection" in out:
        metrics["image"] = out[f"{cls}_detection"]
    if f"{cls}_detection_BEV" in out:
        metrics["ground"] = out[f"{cls}_detection_BEV"]
    if f"{cls}_detection_3D" in out:
        metrics["3d"] = out[f"{cls}_detection_3D"]
    return metrics


@pytest.mark.parametrize("seed,n_frames", [(0, 20), (1, 25), (2, 30)])
def test_ap_parity_car(oracle_bin, tmp_path, seed, n_frames):
    rng = np.random.RandomState(seed)
    gts, dets = _random_scene(rng, n_frames)
    gt_dir, res_dir = _write_scene(tmp_path, gts, dets)
    oracle = _run_oracle(oracle_bin, gt_dir, res_dir, "car")
    assert set(oracle) == {"image", "ground", "3d"}
    for metric, want in oracle.items():
        got = kitti_ap.evaluate_ap(gts, dets, "Car", metric,
                                   min_iou=0.7, use_native=False)
        np.testing.assert_allclose(
            [got["easy"], got["moderate"], got["hard"]], want,
            atol=1e-4, err_msg=f"metric={metric} seed={seed}")


def test_ap_parity_pedestrian(oracle_bin, tmp_path):
    rng = np.random.RandomState(7)
    gts, dets = _random_scene(rng, 20)
    # relabel most cars as pedestrians so the class has support
    for gt, det in zip(gts, dets):
        gt.types[:] = ["Pedestrian" if t == "Car" else t
                       for t in gt.types]
        det.types[:] = ["Pedestrian" if t == "Car" else t
                        for t in det.types]
    gt_dir, res_dir = _write_scene(tmp_path, gts, dets)
    oracle = _run_oracle(oracle_bin, gt_dir, res_dir, "pedestrian")
    for metric, want in oracle.items():
        got = kitti_ap.evaluate_ap(gts, dets, "Pedestrian", metric,
                                   min_iou=0.5, use_native=False)
        np.testing.assert_allclose(
            [got["easy"], got["moderate"], got["hard"]], want,
            atol=1e-4, err_msg=f"metric={metric}")


def test_ap_parity_native_twin(oracle_bin, tmp_path):
    """The C++ batch path must produce the same numbers as the Python
    specification AND the official binary."""
    from dodt_tpu import native
    if not native.build():
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(3)
    gts, dets = _random_scene(rng, 20)
    gt_dir, res_dir = _write_scene(tmp_path, gts, dets)
    oracle = _run_oracle(oracle_bin, gt_dir, res_dir, "car")
    for metric, want in oracle.items():
        got_native = kitti_ap.evaluate_ap(gts, dets, "Car", metric,
                                          min_iou=0.7, use_native=True)
        np.testing.assert_allclose(
            [got_native["easy"], got_native["moderate"],
             got_native["hard"]], want, atol=1e-4,
            err_msg=f"native metric={metric}")
