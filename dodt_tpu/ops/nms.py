"""Fixed-capacity greedy NMS (exact tf.image.non_max_suppression
semantics, TPU-shaped).

The reference relies on dynamic-size NMS outputs; here the output is a
static (max_out,) index vector plus a validity mask. Greedy selection
runs as a fori_loop of max_out argmax+suppress steps over a (possibly
pre-top-k'd) candidate set, which is exact greedy NMS — not the
"fast NMS" approximation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dodt_tpu.ops.iou import aligned_iou_matrix

NEG_INF = -1e9


def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
            max_out: int, iou_thresh: float):
    """Greedy NMS over axis-aligned boxes.

    Args:
      boxes: (N, 4) [x1, y1, x2, y2].
      scores: (N,).
      valid: (N,) bool — invalid entries are never selected.
      max_out: static output capacity.
      iou_thresh: suppression threshold.

    Returns:
      (indices, out_valid): (max_out,) int32 indices into boxes and a
      bool mask of which slots hold real selections.
    """
    n = boxes.shape[0]
    iou = aligned_iou_matrix(boxes, boxes)  # (N, N)
    live_scores = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        live, out_idx, out_ok = state
        best = jnp.argmax(live)
        ok = live[best] > NEG_INF / 2
        out_idx = out_idx.at[i].set(best.astype(jnp.int32))
        out_ok = out_ok.at[i].set(ok)
        suppress = iou[best] > iou_thresh
        suppress = suppress.at[best].set(True)
        live = jnp.where(ok & suppress, NEG_INF, live)
        return live, out_idx, out_ok

    out_idx = jnp.zeros(max_out, jnp.int32)
    out_ok = jnp.zeros(max_out, bool)
    _, out_idx, out_ok = jax.lax.fori_loop(
        0, max_out, body, (live_scores, out_idx, out_ok))
    return out_idx, out_ok


def top_k_prefilter(scores: jnp.ndarray, valid: jnp.ndarray, k: int):
    """Select top-k valid candidates to bound the NMS IoU matrix."""
    masked = jnp.where(valid, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return top_idx, top_scores > NEG_INF / 2
