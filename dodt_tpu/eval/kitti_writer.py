"""KITTI prediction-file writer (bit-compatible output contract).

Produces the exact txt format consumed by the official KITTI offline
evaluators (reference dt_inference_utils.convert_pred_to_kitti_format:
135 and evaluator_utils.save_predictions_in_kitti_format:22):

  type trunc occ alpha x1 y1 x2 y2 h w l x y z ry score

with truncation/occlusion set to -1, alpha -10, boxes projected to the
image plane and clipped; fully-out-of-image boxes dropped.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from dodt_tpu.data.kitti import FrameCalib


def project_box_to_image(box_3d: np.ndarray, calib: FrameCalib,
                         image_size) -> Optional[np.ndarray]:
    """3D box -> clipped 2D image box; None if fully outside
    (reference wavedata box_3d_projector.project_to_image_space with
    truncate=True)."""
    x, y, z, l, w, h, ry = box_3d[:7]
    c, s = np.cos(ry), np.sin(ry)
    xc = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    zc = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    yc = np.array([0, 0, 0, 0, -h, -h, -h, -h])
    corners = np.stack([c * xc + s * zc + x, yc + y,
                        -s * xc + c * zc + z], axis=1)
    if np.all(corners[:, 2] <= 0.1):
        return None
    corners = corners[corners[:, 2] > 0.1]
    uv = calib.project_rect_to_image(corners)
    img_w, img_h = image_size
    x1, y1 = uv.min(axis=0)
    x2, y2 = uv.max(axis=0)
    # discard boxes entirely outside the image
    if x2 < 0 or y2 < 0 or x1 > img_w or y1 > img_h:
        return None
    return np.array([max(x1, 0), max(y1, 0),
                     min(x2, img_w), min(y2, img_h)])


def predictions_to_kitti_lines(boxes_3d: np.ndarray, scores: np.ndarray,
                               class_indices: np.ndarray,
                               calib: FrameCalib, image_size,
                               classes=("Car",),
                               score_threshold: float = 0.1
                               ) -> List[str]:
    """Format predictions for one frame.

    Args:
      boxes_3d: (N, 7) [x, y, z, l, w, h, ry].
      scores: (N,), class_indices: (N,) 0-based into `classes`.
      image_size: (width, height).
    """
    lines = []
    for i in range(len(boxes_3d)):
        if scores[i] < score_threshold:
            continue
        img_box = project_box_to_image(boxes_3d[i], calib, image_size)
        if img_box is None:
            continue
        x, y, z, l, w, h, ry = np.round(boxes_3d[i][:7], 3)
        x1, y1, x2, y2 = np.round(img_box, 3)
        obj_type = classes[int(class_indices[i])]
        lines.append(
            f"{obj_type} -1 -1 -10 {x1:.3f} {y1:.3f} {x2:.3f} {y2:.3f} "
            f"{h:.3f} {w:.3f} {l:.3f} {x:.3f} {y:.3f} {z:.3f} "
            f"{ry:.3f} {scores[i]:.3f}")
    return lines


def write_kitti_file(path: str, lines: List[str]):
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
