"""Numpy rotated/3D IoU for host-side tracking and evaluation.

Analytic convex-quad intersection (same algorithm as ops/iou.py, numpy
edition) — replaces the reference's PIL rasterization
(wavedata evaluation.py:44-261) with exact geometry.
"""
from __future__ import annotations

import numpy as np


def _rect_corners(box):
    """box [x, z, l, w, ry] -> (4, 2) corners."""
    x, z, l, w, ry = box
    c, s = np.cos(ry), np.sin(ry)
    xc = np.array([l, l, -l, -l]) / 2.0
    zc = np.array([w, -w, -w, w]) / 2.0
    return np.stack([c * xc + s * zc + x, -s * xc + c * zc + z], axis=1)


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    x, z = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def _clip_poly(poly, a, b):
    """Sutherland-Hodgman clip of polygon by half-plane left of a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        d_cur = (b[0] - a[0]) * (cur[1] - a[1]) - \
                (b[1] - a[1]) * (cur[0] - a[0])
        d_nxt = (b[0] - a[0]) * (nxt[1] - a[1]) - \
                (b[1] - a[1]) * (nxt[0] - a[0])
        if d_cur >= 0:
            out.append(cur)
        if (d_cur > 0) != (d_nxt > 0) and (d_cur < 0 or d_nxt < 0):
            t = d_cur / (d_cur - d_nxt)
            out.append(cur + t * (nxt - cur))
    return np.array(out) if out else np.zeros((0, 2))


def rect_intersection_area(box_a, box_b) -> float:
    pa = _rect_corners(box_a)
    pb = _rect_corners(box_b)
    # ensure CCW orientation of the clip rect
    if _signed_area(pb) < 0:
        pb = pb[::-1]
    poly = pa
    for i in range(4):
        if len(poly) == 0:
            return 0.0
        poly = _clip_poly(poly, pb[i], pb[(i + 1) % 4])
    return _poly_area(poly)


def _signed_area(pts):
    x, z = pts[:, 0], pts[:, 1]
    return 0.5 * (np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def rotated_iou(box_a, boxes_b) -> np.ndarray:
    """box_a (5,) [x, z, l, w, ry] vs boxes_b (M, 5) -> (M,) IoU."""
    boxes_b = np.atleast_2d(boxes_b)
    out = np.zeros(len(boxes_b))
    area_a = box_a[2] * box_a[3]
    for j, bb in enumerate(boxes_b):
        inter = rect_intersection_area(box_a, bb)
        union = area_a + bb[2] * bb[3] - inter
        out[j] = inter / union if union > 0 else 0.0
    return out


def three_d_iou(box_a, boxes_b) -> np.ndarray:
    """box_3d (7,) [x, y, z, l, w, h, ry] vs (M, 7) -> (M,) 3D IoU.

    Height overlap x rotated footprint (reference three_d_iou:44,
    camera frame: box spans y in [y - h, y])."""
    boxes_b = np.atleast_2d(boxes_b)
    bev_a = box_a[[0, 2, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 2, 3, 4, 6]]
    out = np.zeros(len(boxes_b))
    vol_a = box_a[3] * box_a[4] * box_a[5]
    for j in range(len(boxes_b)):
        inter2d = rect_intersection_area(bev_a, bev_b[j])
        h_ov = max(0.0, min(box_a[1], boxes_b[j, 1]) -
                   max(box_a[1] - box_a[5], boxes_b[j, 1] - boxes_b[j, 5]))
        inter = inter2d * h_ov
        vol_b = boxes_b[j, 3] * boxes_b[j, 4] * boxes_b[j, 5]
        union = vol_a + vol_b - inter
        out[j] = inter / union if union > 0 else 0.0
    return out


def box_3d_corners(box_3d: np.ndarray) -> np.ndarray:
    """box_3d (7,) -> (8, 3) corners, numpy (host-side twin of
    ops/boxes.box_3d_to_corners; bottom face first)."""
    x, y, z, l, w, h, ry = box_3d[:7]
    c, s = np.cos(ry), np.sin(ry)
    xc = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    zc = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    yc = np.array([0, 0, 0, 0, -h, -h, -h, -h])
    return np.stack([c * xc + s * zc + x, yc + y,
                     -s * xc + c * zc + z], axis=1)


def aligned_iou_2d(box_a, boxes_b) -> np.ndarray:
    """[x1, y1, x2, y2] vs (M, 4)."""
    boxes_b = np.atleast_2d(boxes_b)
    x1 = np.maximum(box_a[0], boxes_b[:, 0])
    y1 = np.maximum(box_a[1], boxes_b[:, 1])
    x2 = np.minimum(box_a[2], boxes_b[:, 2])
    y2 = np.minimum(box_a[3], boxes_b[:, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * \
        (boxes_b[:, 3] - boxes_b[:, 1])
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)
