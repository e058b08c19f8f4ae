"""KITTI detection AP evaluator (official 41-point protocol).

Own implementation of the scoring rules of the reference's C++
evaluator (scripts/offline_eval/kitti_native_eval/
evaluate_object_3d_offline.cpp, ~1000 LoC): per-difficulty
valid/ignored/DontCare GT partitioning, score-threshold sweep over 41
recall points, greedy max-IoU assignment, and AP as the mean of
right-monotonized precision. Metrics: image (2D bbox), ground (rotated
BEV), 3D.

The C++ twin in dodt_tpu/native/kitti_ap.cpp is the fast batch path;
this module is the readable specification and test oracle.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import numpy as np

from dodt_tpu.data.kitti import LabelArray
from dodt_tpu.utils.np_iou import (aligned_iou_2d, rotated_iou,
                                   three_d_iou)

N_SAMPLE_PTS = 41

# difficulty: (min bbox height, max occlusion, max truncation)
DIFFICULTY = {
    0: (40.0, 0, 0.15),   # easy
    1: (25.0, 1, 0.30),   # moderate
    2: (25.0, 2, 0.50),   # hard
}

# neighboring classes evaluated as "ignored" (not FP, not TP)
NEIGHBORS = {
    "Car": ("Van",),
    "Pedestrian": ("Person_sitting",),
    "Cyclist": (),
}


@dataclass
class FrameGt:
    boxes_3d: np.ndarray      # (G, 7)
    bbox_2d: np.ndarray       # (G, 4)
    types: Sequence[str]
    occlusion: np.ndarray
    truncation: np.ndarray
    dontcare: np.ndarray      # (D, 4) 2D regions

    @staticmethod
    def from_labels(labels: LabelArray, dontcare=None) -> "FrameGt":
        return FrameGt(
            boxes_3d=labels.box_3d, bbox_2d=labels.bbox_2d,
            types=list(labels.types), occlusion=labels.occlusion,
            truncation=labels.truncation,
            dontcare=np.zeros((0, 4)) if dontcare is None else dontcare)


@dataclass
class FrameDet:
    boxes_3d: np.ndarray      # (N, 7)
    bbox_2d: np.ndarray       # (N, 4)
    scores: np.ndarray
    types: Sequence[str]


def _classify_gt(gt: FrameGt, current_class: str, difficulty: int):
    """0 = valid, 1 = ignored, -1 = other class (FP if matched? no —
    simply not considered)."""
    min_h, max_occ, max_trunc = DIFFICULTY[difficulty]
    out = []
    for i in range(len(gt.boxes_3d)):
        t = gt.types[i]
        h = gt.bbox_2d[i, 3] - gt.bbox_2d[i, 1]
        if t == current_class:
            if (gt.occlusion[i] <= max_occ and
                    gt.truncation[i] <= max_trunc and h >= min_h):
                out.append(0)
            else:
                out.append(1)
        elif t in NEIGHBORS.get(current_class, ()):
            out.append(1)
        else:
            out.append(-1)
    return np.array(out, np.int32)


def _overlap(metric: str, det: FrameDet, gt: FrameGt) -> np.ndarray:
    """(n_det, n_gt) IoU matrix for the chosen metric."""
    nd, ng = len(det.boxes_3d), len(gt.boxes_3d)
    iou = np.zeros((nd, ng))
    for i in range(nd):
        if metric == "image":
            iou[i] = aligned_iou_2d(det.bbox_2d[i], gt.bbox_2d) \
                if ng else []
        elif metric == "ground":
            iou[i] = rotated_iou(det.boxes_3d[i][[0, 2, 3, 4, 6]],
                                 gt.boxes_3d[:, [0, 2, 3, 4, 6]]) \
                if ng else []
        else:  # 3d
            iou[i] = three_d_iou(det.boxes_3d[i], gt.boxes_3d) if ng else []
    return iou


def _det_height_ok(det: FrameDet, difficulty: int) -> np.ndarray:
    min_h = DIFFICULTY[difficulty][0]
    h = det.bbox_2d[:, 3] - det.bbox_2d[:, 1]
    return h >= min_h


def evaluate_ap(gts: List[FrameGt], dets: List[FrameDet],
                current_class: str = "Car",
                metric: str = "3d",
                min_iou: float = 0.7,
                use_native: bool | None = None) -> Dict[str, float]:
    """Returns AP (in %) per difficulty {easy, moderate, hard}.

    Dispatches to the C++ evaluator (native/kitti_ap.cpp) when built;
    the Python path below is the specification / test oracle.
    """
    if use_native is None:
        from dodt_tpu import native
        use_native = native.available()
    results = {}
    names = {0: "easy", 1: "moderate", 2: "hard"}
    for difficulty in (0, 1, 2):
        fn = _eval_one_native if use_native else _eval_one
        results[names[difficulty]] = fn(
            gts, dets, current_class, metric, min_iou, difficulty)
    return results


def _eval_one_native(gts, dets, current_class, metric, min_iou,
                     difficulty):
    from dodt_tpu import native

    gt_counts, det_counts = [], []
    gt_boxes7, gt_bbox4, gt_kind = [], [], []
    det_boxes7, det_bbox4, det_scores, det_is_class = [], [], [], []
    for gt, det in zip(gts, dets):
        gt_counts.append(len(gt.boxes_3d))
        det_counts.append(len(det.boxes_3d))
        gt_boxes7.append(np.asarray(gt.boxes_3d, np.float64).reshape(-1, 7))
        gt_bbox4.append(np.asarray(gt.bbox_2d, np.float64).reshape(-1, 4))
        gt_kind.append(_classify_gt(gt, current_class, difficulty))
        det_boxes7.append(np.asarray(det.boxes_3d,
                                     np.float64).reshape(-1, 7))
        det_bbox4.append(np.asarray(det.bbox_2d,
                                    np.float64).reshape(-1, 4))
        det_scores.append(np.asarray(det.scores, np.float64))
        det_is_class.append(np.array(
            [t == current_class for t in det.types], np.int32))

    def cat(parts, width):
        if not parts:
            return np.zeros((0, width))
        return np.concatenate([p.reshape(-1, width) for p in parts])

    return native.kitti_ap_native(
        np.asarray(gt_counts, np.int32), cat(gt_boxes7, 7),
        cat(gt_bbox4, 4),
        np.concatenate(gt_kind) if gt_kind else np.zeros(0, np.int32),
        np.asarray(det_counts, np.int32), cat(det_boxes7, 7),
        cat(det_bbox4, 4),
        np.concatenate(det_scores) if det_scores else np.zeros(0),
        np.concatenate(det_is_class) if det_is_class
        else np.zeros(0, np.int32),
        metric, min_iou, DIFFICULTY[difficulty][0])


def _eval_one(gts, dets, current_class, metric, min_iou, difficulty):
    # Pass 1: collect TP scores at threshold 0 to derive the 41
    # score thresholds (cpp: getThresholds over valid recalls).
    frame_cache = []
    tp_scores = []
    total_valid_gt = 0
    for gt, det in zip(gts, dets):
        gt_kind = _classify_gt(gt, current_class, difficulty)
        cls_mask = np.array([t == current_class for t in det.types])
        iou = _overlap(metric, det, gt)
        frame_cache.append((gt_kind, cls_mask, iou))
        n_valid = int(np.sum(gt_kind == 0))
        total_valid_gt += n_valid
        # greedy: each valid GT takes its best-overlap detection
        for g in np.where(gt_kind == 0)[0]:
            best, best_iou = -1, min_iou
            for d in np.where(cls_mask)[0]:
                if iou[d, g] >= best_iou:
                    best_iou = iou[d, g]
                    best = d
            if best >= 0:
                tp_scores.append(det.scores[best])

    if total_valid_gt == 0:
        return 0.0
    thresholds = _get_thresholds(np.sort(tp_scores)[::-1], total_valid_gt)

    precisions = np.zeros(N_SAMPLE_PTS)
    for ti, thresh in enumerate(thresholds):
        tp = fp = fn = 0
        for (gt, det), (gt_kind, cls_mask, iou) in zip(
                zip(gts, dets), frame_cache):
            score_ok = det.scores >= thresh
            cand = cls_mask & score_ok
            assigned = np.zeros(len(det.scores), bool)
            # valid GT matching: prefer the highest-IoU candidate
            for g in np.where(gt_kind == 0)[0]:
                best, best_iou = -1, min_iou
                for d in np.where(cand & ~assigned)[0]:
                    if iou[d, g] >= best_iou:
                        best_iou = iou[d, g]
                        best = d
                if best >= 0:
                    tp += 1
                    assigned[best] = True
                else:
                    fn += 1
            # ignored GT absorb detections (not FP)
            for g in np.where(gt_kind == 1)[0]:
                for d in np.where(cand & ~assigned)[0]:
                    if iou[d, g] >= min_iou:
                        assigned[d] = True
                        break
            # DontCare region absorption (image metric)
            if metric == "image" and len(gt.dontcare):
                for d in np.where(cand & ~assigned)[0]:
                    for dc in gt.dontcare:
                        if _inside_frac(det.bbox_2d[d], dc) >= min_iou:
                            assigned[d] = True
                            break
            # small detections don't count as FP either
            height_ok = _det_height_ok(det, difficulty)
            fp += int(np.sum(cand & ~assigned & height_ok))
        denom = tp + fp
        precisions[ti] = tp / denom if denom > 0 else 0.0

    # right-monotonize and average
    for i in range(N_SAMPLE_PTS - 2, -1, -1):
        precisions[i] = max(precisions[i], precisions[i + 1])
    # pad unused thresholds with 0 precision (they were initialized 0,
    # but monotonization may have propagated values backwards — mask)
    n_t = len(thresholds)
    return 100.0 * float(np.sum(precisions[:n_t]) / N_SAMPLE_PTS)


def _inside_frac(box, region):
    x1 = max(box[0], region[0])
    y1 = max(box[1], region[1])
    x2 = min(box[2], region[2])
    y2 = min(box[3], region[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area = (box[2] - box[0]) * (box[3] - box[1])
    return inter / area if area > 0 else 0.0


def _get_thresholds(scores_desc: np.ndarray, n_gt: int) -> np.ndarray:
    """Official threshold selection (cpp getThresholds): walk the
    sorted TP scores, keep one threshold per recall step of 1/40."""
    thresholds = []
    current_recall = 0.0
    n = len(scores_desc)
    for i in range(n):
        l_recall = (i + 1) / n_gt
        r_recall = (i + 2) / n_gt if i < n - 1 else l_recall
        if (r_recall - current_recall) < (current_recall - l_recall) \
                and i < n - 1:
            continue
        thresholds.append(scores_desc[i])
        current_recall += 1.0 / (N_SAMPLE_PTS - 1)
    return np.array(thresholds)
