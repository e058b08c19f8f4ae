"""Visualization: BEV prediction review + 2D image boxes (matplotlib).

Replaces the reference's viz stack (viz/prediction_review.py BEV pngs,
demos/show_predictions_2d.py) without the mayavi dependency.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from dodt_tpu.utils.np_iou import box_3d_corners


def _rect_xz(box_3d):
    c = box_3d_corners(np.asarray(box_3d, float))[:4]
    return c[:, [0, 2]]


def draw_bev(bev_features: np.ndarray, area_extents,
             gt_boxes: Optional[np.ndarray] = None,
             pred_boxes: Optional[np.ndarray] = None,
             scores: Optional[np.ndarray] = None,
             path: Optional[str] = None):
    """Render the density channel with GT (green) and predicted (red)
    footprints. bev_features: (H, W, C) with density last."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ae = np.asarray(area_extents, float)
    fig, ax = plt.subplots(figsize=(10, 9))
    ax.imshow(bev_features[..., -1], cmap="magma",
              extent=[ae[0][0], ae[0][1], ae[2][0], ae[2][1]],
              origin="upper", aspect="auto")

    def plot_boxes(boxes, color, labels=None):
        for i, b in enumerate(boxes):
            pts = _rect_xz(b)
            poly = np.vstack([pts, pts[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)
            if labels is not None:
                ax.text(pts[0, 0], pts[0, 1], f"{labels[i]:.2f}",
                        color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        plot_boxes(gt_boxes, "lime")
    if pred_boxes is not None and len(pred_boxes):
        plot_boxes(pred_boxes, "red", scores)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def draw_image_boxes(image: np.ndarray, boxes_2d: List,
                     scores: Optional[List] = None,
                     path: Optional[str] = None):
    """2D prediction review (reference demos/show_predictions_2d.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as patches

    fig, ax = plt.subplots(figsize=(12, 4))
    ax.imshow(image.astype(np.uint8))
    for i, bb in enumerate(boxes_2d):
        x1, y1, x2, y2 = bb
        ax.add_patch(patches.Rectangle(
            (x1, y1), x2 - x1, y2 - y1, fill=False, color="red",
            linewidth=1.2))
        if scores is not None:
            ax.text(x1, y1 - 2, f"{scores[i]:.2f}", color="red",
                    fontsize=7)
    ax.axis("off")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
