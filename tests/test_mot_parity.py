"""MOT scorer parity vs the OFFICIAL KITTI tracking evaluator.

The reference ships the official scorer at scripts/offline_eval/
kitti_tracking_native_eval/python/evaluate_tracking.py (with vendored
munkres + mailpy); it parses under Python 3 and is used here as the
oracle: randomized multi-sequence tracking scenarios are written in
KITTI tracking format, scored by the official trackingEvaluation class,
and compared number-for-number against dodt_tpu.tracking.mot_eval.
"""
import os
import sys

import numpy as np
import pytest

from dodt_tpu.tracking.mot_eval import MotEvaluator

OFFICIAL_DIR = ("/root/reference/scripts/offline_eval/"
                "kitti_tracking_native_eval/python")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(OFFICIAL_DIR), reason="reference scorer not mounted")


def _load_official():
    if OFFICIAL_DIR not in sys.path:
        sys.path.insert(0, OFFICIAL_DIR)
    import evaluate_tracking as official
    return official


# --------------------------------------------------------------- data gen

def _random_scenario(rng, n_frames=25, n_tracks=6, cls="car"):
    """Random GT tracks + noisy tracker output with dropouts, id
    switches, false positives, small boxes, vans and DontCare areas.
    Returns (gt_frames, pred_frames) in mot_eval schema."""
    gt_frames, pred_frames = [], []

    tracks = []
    for tid in range(n_tracks):
        start = rng.randint(0, n_frames - 4)
        length = rng.randint(3, n_frames - start)
        x = rng.uniform(50, 1000)
        y = rng.uniform(80, 250)
        w = rng.uniform(40, 160)
        h = rng.uniform(30, 110)
        vx = rng.uniform(-8, 8)
        typ = "van" if (cls == "car" and rng.rand() < 0.2) else cls
        tracks.append(dict(tid=tid, start=start, end=start + length,
                           x=x, y=y, w=w, h=h, vx=vx, typ=typ))

    for f in range(n_frames):
        g_ids, g_boxes, g_types, g_trunc, g_occ = [], [], [], [], []
        dontcare = []
        t_ids, t_boxes, t_types, t_scores = [], [], [], []
        for tr in tracks:
            if not (tr["start"] <= f < tr["end"]):
                continue
            x = tr["x"] + tr["vx"] * f
            box = np.round([x, tr["y"], x + tr["w"], tr["y"] + tr["h"]],
                           2)
            g_ids.append(tr["tid"])
            g_boxes.append(box)
            g_types.append(tr["typ"])
            g_trunc.append(int(rng.rand() < 0.15))  # some truncated
            g_occ.append(rng.randint(0, 4))         # some occluded > 2
            # tracker: mostly present, jittered, occasional id switch
            if rng.rand() < 0.85:
                jit = rng.uniform(-6, 6, 4)
                pbox = np.round(box + jit, 2)
                pid = tr["tid"] + (100 if rng.rand() < 0.08 else 0)
                if pid not in t_ids:
                    t_ids.append(pid)
                    t_boxes.append(pbox)
                    t_types.append(tr["typ"] if rng.rand() < 0.9
                                   else cls)
                    t_scores.append(round(rng.uniform(0.3, 1.0), 3))
        # false positives: some normal, some tiny (ignored by height),
        # some inside DontCare areas
        for k in range(rng.randint(0, 3)):
            x = rng.uniform(0, 1100)
            y = rng.uniform(50, 300)
            w = rng.uniform(30, 120)
            h = rng.uniform(8, 90)   # some below min_height=25
            pid = 1000 + f * 10 + k
            t_ids.append(pid)
            t_boxes.append(np.round([x, y, x + w, y + h], 2))
            t_types.append(cls)
            t_scores.append(round(rng.uniform(0.1, 0.9), 3))
        if rng.rand() < 0.4:
            x = rng.uniform(0, 1100)
            y = rng.uniform(50, 300)
            dontcare.append(np.round([x, y, x + rng.uniform(50, 200),
                                      y + rng.uniform(30, 80)], 2))

        gt_frames.append({"ids": g_ids, "boxes": g_boxes,
                          "types": g_types, "truncation": g_trunc,
                          "occlusion": g_occ, "dontcare": dontcare})
        pred_frames.append({"ids": t_ids, "boxes": t_boxes,
                            "types": t_types, "scores": t_scores})
    return gt_frames, pred_frames


def _write_kitti_files(tmp_path, sequences, cls="car"):
    """Write GT + tracker txt files and the seqmap in the directory
    layout the official scorer expects (cwd-relative)."""
    gt_dir = tmp_path / "data" / "tracking" / "label_02"
    res_dir = tmp_path / "results" / "test_sha" / "data"
    gt_dir.mkdir(parents=True, exist_ok=True)
    res_dir.mkdir(parents=True, exist_ok=True)

    seqmap_lines = []
    for seq_idx, (gt_frames, pred_frames) in enumerate(sequences):
        n = len(gt_frames)
        seqmap_lines.append(f"{seq_idx:04d} empty 000000 {n - 1:06d}")
        with open(gt_dir / f"{seq_idx:04d}.txt", "w") as f:
            for fi, gt in enumerate(gt_frames):
                for i in range(len(gt["ids"])):
                    b = gt["boxes"][i]
                    typ = gt["types"][i].capitalize()
                    if typ == "Person_sitting":
                        typ = "Person_sitting"
                    f.write(f"{fi} {gt['ids'][i]} {typ} "
                            f"{gt['truncation'][i]} {gt['occlusion'][i]}"
                            f" 0.0 {b[0]} {b[1]} {b[2]} {b[3]} "
                            f"1.5 1.6 3.9 1.0 1.5 8.0 0.0\n")
                for b in gt["dontcare"]:
                    f.write(f"{fi} -1 DontCare -1 -1 -10 "
                            f"{b[0]} {b[1]} {b[2]} {b[3]} "
                            f"-1 -1 -1 -1000 -1000 -1000 -10\n")
        with open(res_dir / f"{seq_idx:04d}.txt", "w") as f:
            for fi, pred in enumerate(pred_frames):
                for i in range(len(pred["ids"])):
                    b = pred["boxes"][i]
                    typ = pred["types"][i].capitalize()
                    f.write(f"{fi} {pred['ids'][i]} {typ} 0 0 0.0 "
                            f"{b[0]} {b[1]} {b[2]} {b[3]} "
                            f"1.5 1.6 3.9 1.0 1.5 8.0 0.0 "
                            f"{pred['scores'][i]}\n")
    with open(tmp_path / "data" / "tracking" /
              "evaluate_tracking.seqmap", "w") as f:
        f.write("\n".join(seqmap_lines) + "\n")


def _run_official(tmp_path, cls="car"):
    official = _load_official()
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        e = official.trackingEvaluation(
            t_sha="test_sha", cls=cls,
            mail=__import__("mailpy").Mail(""))
        assert e.loadTracker()
        assert e.loadGroundtruth()
        assert e.compute3rdPartyMetrics()
    finally:
        os.chdir(cwd)
    return e


def _assert_parity(e, mine):
    assert mine["TP"] == e.tp
    assert mine["FP"] == e.fp
    assert mine["FN"] == e.fn
    assert mine["IDS"] == e.id_switches
    assert mine["FM"] == e.fragments
    np.testing.assert_allclose(mine["MOTA"], 100.0 * e.MOTA, atol=1e-9)
    np.testing.assert_allclose(mine["MOTP"], 100.0 * e.MOTP, atol=1e-9)
    np.testing.assert_allclose(mine["MOTAL"], 100.0 * e.MOTAL,
                               atol=1e-9)
    np.testing.assert_allclose(mine["MODA"], 100.0 * e.MODA, atol=1e-9)
    np.testing.assert_allclose(mine["MODP"], 100.0 * e.MODP, atol=1e-9)
    np.testing.assert_allclose(mine["MT"], 100.0 * e.MT, atol=1e-9)
    np.testing.assert_allclose(mine["PT"], 100.0 * e.PT, atol=1e-9)
    np.testing.assert_allclose(mine["ML"], 100.0 * e.ML, atol=1e-9)
    np.testing.assert_allclose(mine["recall"], 100.0 * e.recall,
                               atol=1e-9)
    np.testing.assert_allclose(mine["precision"], 100.0 * e.precision,
                               atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_mot_parity_car(tmp_path, seed):
    rng = np.random.RandomState(seed)
    sequences = [_random_scenario(rng, n_frames=rng.randint(15, 30),
                                  n_tracks=rng.randint(3, 8))
                 for _ in range(3)]
    _write_kitti_files(tmp_path, sequences)
    e = _run_official(tmp_path, cls="car")

    ev = MotEvaluator(cls="car")
    for gt_frames, pred_frames in sequences:
        ev.add_sequence(gt_frames, pred_frames)
    _assert_parity(e, ev.results())


def test_mot_parity_pedestrian(tmp_path):
    rng = np.random.RandomState(11)
    sequences = [_random_scenario(rng, n_frames=20, n_tracks=5,
                                  cls="pedestrian") for _ in range(2)]
    _write_kitti_files(tmp_path, sequences, cls="pedestrian")
    e = _run_official(tmp_path, cls="pedestrian")

    ev = MotEvaluator(cls="pedestrian")
    for gt_frames, pred_frames in sequences:
        ev.add_sequence(gt_frames, pred_frames)
    _assert_parity(e, ev.results())


def test_mot_perfect_tracking_no_ignores():
    """Sanity: perfect tracker on clean GT scores MOTA 100."""
    gt_frames, pred_frames = [], []
    for f in range(10):
        boxes = [(10 + 5 * f, 50, 110 + 5 * f, 150),
                 (300, 60 + 3 * f, 400, 180 + 3 * f)]
        gt_frames.append({"ids": [0, 1], "boxes": boxes})
        pred_frames.append({"ids": [7, 8], "boxes": boxes})
    ev = MotEvaluator()
    ev.add_sequence(gt_frames, pred_frames)
    r = ev.results()
    assert r["MOTA"] == 100.0
    assert r["MOTP"] == 100.0
    assert r["MT"] == 100.0
    assert r["IDS"] == 0 and r["FM"] == 0
