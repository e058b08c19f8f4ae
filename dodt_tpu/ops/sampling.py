"""On-device mini-batch target assignment and balanced sampling.

TPU-native replacement for BOTH the reference's offline mini-batch
preprocessing (mini_batch_preprocessor.py:49, cached .npy per sample)
and its in-graph balanced sampler
(balanced_positive_negative_sampler.py:51). Batched aligned IoU over
all ~90k anchors x G ground-truth boxes is microseconds on the MXU/VPU,
so targets are computed online per step; sampling becomes a rank-mask
(no dynamic gather).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dodt_tpu.ops.iou import aligned_iou_matrix


class AnchorTargets(NamedTuple):
    max_iou: jnp.ndarray      # (N,) best IoU with any valid GT
    offsets: jnp.ndarray      # (N, 6) offsets to the best GT (anchor codec)
    class_idx: jnp.ndarray    # (N,) int32, 0 = background
    gt_index: jnp.ndarray     # (N,) int32 best GT row (valid when iou > 0)


def assign_targets(anchors_bev: jnp.ndarray,
                   anchors: jnp.ndarray,
                   gt_bev: jnp.ndarray,
                   gt_anchors: jnp.ndarray,
                   gt_classes: jnp.ndarray,
                   gt_valid: jnp.ndarray) -> AnchorTargets:
    """Best-GT assignment per anchor (reference
    mini_tracking_batch_preprocessor._calculate_anchors_info:46).

    Args:
      anchors_bev: (N, 4) BEV-projected aligned boxes of the anchors.
      anchors: (N, 6) anchors in anchor format (for offset encoding).
      gt_bev: (G, 4) BEV-projected aligned boxes of (ortho-rotated) GT.
      gt_anchors: (G, 6) GT in (ortho-rotated) anchor format.
      gt_classes: (G,) int32 class indices (>= 1).
      gt_valid: (G,) bool mask of real GT rows.

    Returns:
      AnchorTargets with static shapes. Offsets are encoded against the
      best-IoU GT (gathered first — no G x N x 6 intermediate).
    """
    from dodt_tpu.ops.boxes import anchor_to_offset

    iou = aligned_iou_matrix(anchors_bev, gt_bev)        # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    gt_index = jnp.argmax(iou, axis=1).astype(jnp.int32)  # (N,)
    max_iou = jnp.maximum(jnp.max(iou, axis=1), 0.0)

    best_gt = gt_anchors[gt_index]                        # (N, 6)
    # guard against log(0) on padded GT rows
    safe_gt = jnp.where(best_gt[:, 3:6].min(-1, keepdims=True) > 0,
                        best_gt,
                        jnp.concatenate(
                            [best_gt[:, 0:3], jnp.ones_like(best_gt[:, 3:6])],
                            axis=-1))
    offsets = anchor_to_offset(anchors, safe_gt)
    matched = max_iou > 0.0
    class_idx = jnp.where(matched, gt_classes[gt_index], 0).astype(jnp.int32)
    offsets = jnp.where(matched[:, None], offsets, 0.0)
    return AnchorTargets(max_iou=max_iou, offsets=offsets,
                         class_idx=class_idx, gt_index=gt_index)


def _rank_mask(key, mask: jnp.ndarray, count) -> jnp.ndarray:
    """Select `count` True entries of `mask` uniformly at random, as a
    boolean mask (static shapes; count may be traced)."""
    n = mask.shape[0]
    priority = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    order = jnp.argsort(-priority)            # descending
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mask & (rank < count)


def balanced_sample(key, pos_mask: jnp.ndarray, eligible_mask: jnp.ndarray,
                    size: int, positive_fraction: float = 0.5):
    """Balanced positive/negative mini-batch (reference
    balanced_positive_negative_sampler.subsample:51).

    Keeps at most `size * positive_fraction` positives (randomly) and
    fills the remainder with random negatives from `eligible & ~pos`.

    Returns:
      (sampled_mask, pos_sampled_mask) boolean (N,) masks.
    """
    kp, kn = jax.random.split(key)
    neg_mask = eligible_mask & ~pos_mask
    max_pos = int(size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(pos_mask), max_pos)
    pos_sel = _rank_mask(kp, pos_mask, num_pos)
    num_neg = size - num_pos
    neg_sel = _rank_mask(kn, neg_mask, num_neg)
    return pos_sel | neg_sel, pos_sel


def sample_mini_batch(key, max_ious: jnp.ndarray, size: int,
                      neg_range, pos_range):
    """Reference mini_batch_utils.sample_mini_batch:232 semantics.

    neg_range/pos_range: (lo, hi) IoU ranges. Anchors in the dead zone
    [neg_hi, pos_lo] are excluded. If neg_lo > 0 and nothing is
    eligible, falls back to all background anchors.
    """
    neg_lo, neg_hi = neg_range
    pos_lo, _ = pos_range
    bkg_and_neg = max_ious < neg_hi
    pos = max_ious > pos_lo
    indicator = pos | bkg_and_neg
    if neg_lo > 0.0:
        neg = bkg_and_neg & (max_ious >= neg_lo)
        new_indicator = pos | neg
        num_valid = jnp.sum(indicator)
        indicator = jnp.where(num_valid > 0, new_indicator, bkg_and_neg)
    return balanced_sample(key, pos, indicator, size)
