"""IoU ops: axis-aligned 2D, rotated BEV rectangles, and 3D boxes.

The reference computes rotated-rectangle intersection by rasterizing
polygons with PIL at 0.01 m resolution (wavedata evaluation.py:44-261).
Here it is analytic and fully vectorized: the intersection of two convex
quads is the convex hull of (corners of A inside B) + (corners of B
inside A) + (edge-edge intersection points); we gather all 24 candidate
points with a validity mask, order them by angle, and apply the shoelace
formula. Exact, jit/vmap-safe, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Axis-aligned IoU
# ---------------------------------------------------------------------------

def aligned_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray
                       ) -> jnp.ndarray:
    """Pairwise IoU of axis-aligned boxes [x1, y1, x2, y2].

    Args:
      boxes_a: (N, 4), boxes_b: (M, 4).
    Returns:
      (N, M) IoU matrix. Degenerate boxes yield 0.
    """
    a = boxes_a[:, None, :]  # (N, 1, 4)
    b = boxes_b[None, :, :]  # (1, M, 4)
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * \
        jnp.maximum(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


# ---------------------------------------------------------------------------
# Rotated rectangle intersection (BEV, xz plane)
# ---------------------------------------------------------------------------

def _rect_corners_xz(boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes (..., 5) [x, z, l, w, ry] -> corners (..., 4, 2) CCW in xz.

    ry is the camera-frame yaw (rotation around y); a point (x, z) on the
    box maps via x' = c*x + s*z ; z' = -s*x + c*z (see boxes.py).
    """
    x, z = boxes[..., 0], boxes[..., 1]
    l2, w2 = boxes[..., 2] / 2.0, boxes[..., 3] / 2.0
    ry = boxes[..., 4]
    xc = jnp.stack([l2, l2, -l2, -l2], axis=-1)
    zc = jnp.stack([w2, -w2, -w2, w2], axis=-1)
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    xr = c * xc + s * zc + x[..., None]
    zr = -s * xc + c * zc + z[..., None]
    return jnp.stack([xr, zr], axis=-1)


def _polygon_area(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of masked candidate points ordered by angle.

    pts: (K, 2), mask: (K,) bool. Invalid points are collapsed onto the
    centroid of the valid set so they don't perturb the hull ordering.
    """
    num_valid = jnp.sum(mask)
    centroid = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / \
        jnp.maximum(num_valid, 1)
    rel = pts - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    # Push invalid points to the end of the ordering and to the centroid.
    ang = jnp.where(mask, ang, jnp.inf)
    order = jnp.argsort(ang)
    p = jnp.where(mask[:, None], rel, 0.0)[order]
    m = mask[order]
    k = pts.shape[0]
    idx = jnp.arange(k)
    # next valid index cycles within the first num_valid entries
    nxt = jnp.where(idx + 1 < num_valid, idx + 1, 0)
    p_next = p[nxt]
    cross = p[:, 0] * p_next[:, 1] - p_next[:, 0] * p[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(m, cross, 0.0)))
    return jnp.where(num_valid >= 3, area, 0.0)


def _point_in_quad(pts: jnp.ndarray, quad: jnp.ndarray, eps: float = 1e-6
                   ) -> jnp.ndarray:
    """pts (P, 2) inside convex quad (4, 2) (CCW or CW, handled by sign)."""
    a = quad
    b = jnp.roll(quad, -1, axis=0)
    edge = b - a                                     # (4, 2)
    rel = pts[:, None, :] - a[None, :, :]            # (P, 4, 2)
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    all_pos = jnp.all(cross >= -eps, axis=1)
    all_neg = jnp.all(cross <= eps, axis=1)
    return all_pos | all_neg


def _edge_intersections(qa: jnp.ndarray, qb: jnp.ndarray):
    """All 16 segment-segment intersection points between quad edges.

    Returns pts (16, 2) and validity mask (16,).
    """
    a0 = jnp.repeat(qa, 4, axis=0)                   # (16, 2)
    a1 = jnp.repeat(jnp.roll(qa, -1, axis=0), 4, axis=0)
    b0 = jnp.tile(qb, (4, 1))
    b1 = jnp.tile(jnp.roll(qb, -1, axis=0), (4, 1))
    da = a1 - a0
    db = b1 - b0
    denom = da[:, 0] * db[:, 1] - da[:, 1] * db[:, 0]
    diff = b0 - a0
    t = (diff[:, 0] * db[:, 1] - diff[:, 1] * db[:, 0])
    u = (diff[:, 0] * da[:, 1] - diff[:, 1] * da[:, 0])
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    t = t / safe
    u = u / safe
    valid = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & \
        (u >= 0) & (u <= 1)
    pts = a0 + t[:, None] * da
    return pts, valid


def _rect_intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray
                            ) -> jnp.ndarray:
    """Intersection area of two rotated rects [x, z, l, w, ry] (scalars)."""
    qa = _rect_corners_xz(box_a)
    qb = _rect_corners_xz(box_b)
    in_b = _point_in_quad(qa, qb)
    in_a = _point_in_quad(qb, qa)
    inter_pts, inter_valid = _edge_intersections(qa, qb)
    pts = jnp.concatenate([qa, qb, inter_pts], axis=0)      # (24, 2)
    mask = jnp.concatenate([in_b, in_a, inter_valid], axis=0)
    return _polygon_area(pts, mask)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray
                       ) -> jnp.ndarray:
    """Pairwise rotated-rect IoU in the BEV (xz) plane.

    Args:
      boxes_a: (N, 5) [x, z, l, w, ry]; boxes_b: (M, 5).
    Returns:
      (N, M) IoU matrix.
    """
    inter = jax.vmap(lambda a: jax.vmap(
        lambda b: _rect_intersection_area(a, b))(boxes_b))(boxes_a)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


# ---------------------------------------------------------------------------
# 3D IoU (gravity-aligned rotated boxes)
# ---------------------------------------------------------------------------

def iou_3d_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of box_3d (N, 7) x (M, 7).

    Height overlap of the y intervals x rotated-rect footprint overlap
    (reference three_d_iou, evaluation.py:44).  In the camera frame the
    box spans y in [y - h, y] (y is the bottom face, y axis points down).
    """
    bev_a = boxes_a[:, [0, 2, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 2, 3, 4, 6]]
    inter_2d = jax.vmap(lambda a: jax.vmap(
        lambda b: _rect_intersection_area(a, b))(bev_b))(bev_a)

    top_a = (boxes_a[:, 1] - boxes_a[:, 5])[:, None]
    bot_a = boxes_a[:, 1][:, None]
    top_b = (boxes_b[:, 1] - boxes_b[:, 5])[None, :]
    bot_b = boxes_b[:, 1][None, :]
    h_overlap = jnp.maximum(
        0.0, jnp.minimum(bot_a, bot_b) - jnp.maximum(top_a, top_b))

    inter_vol = inter_2d * h_overlap
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    union = vol_a + vol_b - inter_vol
    return jnp.where(union > 0, inter_vol / union, 0.0)
