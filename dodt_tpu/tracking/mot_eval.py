"""CLEAR-MOT metrics (MOTA / MOTP / MT / ML / IDS / FM).

Own implementation of the standard CLEAR-MOT protocol as used by the
KITTI tracking benchmark scorer (reference scripts/offline_eval/
kitti_tracking_native_eval/python/evaluate_tracking.py:75-885):
Hungarian matching per frame on 2D bbox IoU >= 0.5, carrying forward
previous matches (the "mapping" continuity rule), id-switch and
fragmentation counting, and MT/PT/ML by per-GT-track coverage.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from dodt_tpu.utils.np_iou import aligned_iou_2d


@dataclass
class MotAccumulator:
    min_iou: float = 0.5
    tp: int = 0
    fp: int = 0
    fn: int = 0
    ids: int = 0
    frag: int = 0
    total_iou: float = 0.0
    total_gt: int = 0
    # per GT track id: frames seen, frames matched, last matched pred id,
    # whether it was tracked in the previous frame it appeared
    gt_seen: Dict = field(default_factory=dict)
    gt_matched: Dict = field(default_factory=dict)
    last_pred_for_gt: Dict = field(default_factory=dict)
    gt_tracked_prev: Dict = field(default_factory=dict)

    def update(self, gt_ids, gt_boxes, pred_ids, pred_boxes):
        """One frame. boxes are 2D [x1, y1, x2, y2]."""
        gt_ids = list(gt_ids)
        pred_ids = list(pred_ids)
        n_gt, n_pr = len(gt_ids), len(pred_ids)
        self.total_gt += n_gt
        for g in gt_ids:
            self.gt_seen[g] = self.gt_seen.get(g, 0) + 1

        matches: List[Tuple[int, int]] = []
        if n_gt and n_pr:
            iou = np.zeros((n_gt, n_pr))
            for i in range(n_gt):
                iou[i] = aligned_iou_2d(np.asarray(gt_boxes[i]),
                                        np.asarray(pred_boxes))
            # continuity: prefer keeping last frame's (gt, pred) pairs
            bonus = np.zeros_like(iou)
            for i, g in enumerate(gt_ids):
                lp = self.last_pred_for_gt.get(g)
                if lp is not None and lp in pred_ids:
                    j = pred_ids.index(lp)
                    if iou[i, j] >= self.min_iou:
                        bonus[i, j] = 1.0
            rows, cols = linear_sum_assignment(-(iou + bonus))
            for r, c in zip(rows, cols):
                if iou[r, c] >= self.min_iou:
                    matches.append((r, c))

        matched_gt = set()
        matched_pred = set()
        for r, c in matches:
            g, p = gt_ids[r], pred_ids[c]
            matched_gt.add(g)
            matched_pred.add(p)
            self.tp += 1
            self.total_iou += float(aligned_iou_2d(
                np.asarray(gt_boxes[r]),
                np.asarray([pred_boxes[c]]))[0])
            last = self.last_pred_for_gt.get(g)
            if last is not None and last != p:
                self.ids += 1
            if g in self.gt_tracked_prev and not self.gt_tracked_prev[g]:
                self.frag += 1
            self.last_pred_for_gt[g] = p
            self.gt_matched[g] = self.gt_matched.get(g, 0) + 1

        self.fn += n_gt - len(matched_gt)
        self.fp += n_pr - len(matched_pred)
        for g in gt_ids:
            self.gt_tracked_prev[g] = g in matched_gt

    def results(self) -> Dict[str, float]:
        mota = 1.0 - (self.fn + self.fp + self.ids) / max(self.total_gt, 1)
        motp = self.total_iou / max(self.tp, 1)
        mt = ml = pt = 0
        for g, seen in self.gt_seen.items():
            cov = self.gt_matched.get(g, 0) / seen
            if cov >= 0.8:
                mt += 1
            elif cov <= 0.2:
                ml += 1
            else:
                pt += 1
        n_tracks = max(len(self.gt_seen), 1)
        return {
            "MOTA": 100.0 * mota,
            "MOTP": 100.0 * motp,
            "MT": 100.0 * mt / n_tracks,
            "PT": 100.0 * pt / n_tracks,
            "ML": 100.0 * ml / n_tracks,
            "IDS": self.ids,
            "FM": self.frag,
            "TP": self.tp, "FP": self.fp, "FN": self.fn,
        }


def evaluate_tracking(gt_frames: List[Dict], pred_frames: List[Dict],
                      min_iou: float = 0.5) -> Dict[str, float]:
    """Score a sequence.

    gt_frames/pred_frames: list over frames of
      {"ids": [...], "boxes": [(x1, y1, x2, y2), ...]}.
    """
    acc = MotAccumulator(min_iou=min_iou)
    for gt, pred in zip(gt_frames, pred_frames):
        acc.update(gt["ids"], gt["boxes"], pred["ids"], pred["boxes"])
    return acc.results()
