"""ROI feature extraction: bilinear crop-and-resize (pure JAX).

TPU replacement for tf.image.crop_and_resize as used by the reference's
RPN/AVOD ROI pooling (rpn_model.py:320-350, dt_avod_model.py:235-273):
a batched bilinear gather with static (num_rois, size, size, C) output.
Matches TF semantics: sample grid spans the box corners inclusively,
coordinates are normalized by (dim - 1).
"""
from __future__ import annotations

import jax.numpy as jnp


def crop_and_resize(image: jnp.ndarray, boxes_norm: jnp.ndarray,
                    crop_size: int) -> jnp.ndarray:
    """Bilinear crop-and-resize.

    Args:
      image: (H, W, C) feature map.
      boxes_norm: (N, 4) normalized [y1, x1, y2, x2] in [0, 1].
      crop_size: static output side S.

    Returns:
      (N, S, S, C) crops. Out-of-range samples are clamped to the edge
      (TF uses extrapolation_value=0; the reference always passes boxes
      already clipped to [0, 1], where clamp == TF behavior).
    """
    h, w, _ = image.shape
    s = crop_size
    y1, x1 = boxes_norm[:, 0], boxes_norm[:, 1]
    y2, x2 = boxes_norm[:, 2], boxes_norm[:, 3]

    if s > 1:
        grid = jnp.arange(s, dtype=jnp.float32) / (s - 1)  # (S,)
        ys = (y1[:, None] + (y2 - y1)[:, None] * grid) * (h - 1)  # (N, S)
        xs = (x1[:, None] + (x2 - x1)[:, None] * grid) * (w - 1)
    else:
        ys = ((y1 + y2) / 2.0 * (h - 1))[:, None]
        xs = ((x1 + x2) / 2.0 * (w - 1))[:, None]

    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y_frac = (ys - y0)[:, :, None, None]          # (N, S, 1, 1)
    x_frac = (xs - x0)[:, None, :, None]          # (N, 1, S, 1)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)

    def gather(yi, xi):
        # direct 2D gather -> (N, S, S, C); no (N, S, W, C) intermediate
        return image[yi[:, :, None], xi[:, None, :]]

    tl = gather(y0, x0)
    tr = gather(y0, x1i)
    bl = gather(y1i, x0)
    br = gather(y1i, x1i)

    top_i = tl + (tr - tl) * x_frac
    bot_i = bl + (br - bl) * x_frac
    return top_i + (bot_i - top_i) * y_frac
