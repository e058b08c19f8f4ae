"""Windowed Pallas ROI-align for metric-bounded feature maps.

The second-stage BEV crops (reference avod_model.py ROI pooling of the
proposal boxes, 300 proposals x 7x7 from the shared tower output) are
the last gather-bound stage of the forward pass: TPU gathers are
per-ACCESS bound, and the 4-tap path costs N*S*S*4 accesses
(results_r03/roi_crop_ab.json).  BEV proposals are *metric* boxes —
cars + the fixed expand margin never exceed a few meters — so every
crop reads from a statically-bounded pixel window of the map.  That
turns the crop into a gather-free Pallas kernel:

  * the map is pre-flattened to 2D (H, W*C) in XLA so the whole thing
    is VMEM-resident without lane padding (a few MB in bf16),
  * the grid runs one step per ROI; each step dynamic-slices a
    (WIN, WIN*C) window at a scalar-prefetched, alignment-proven
    per-ROI origin — a VMEM load, not an HBM gather — and contracts
    the window's y dim against a bilinear hat matrix in ONE 2D MXU
    matmul (Mosaic supports no >2D reshapes, so the kernel never
    builds a 3D window),
  * the x contraction is a tiny batched einsum done by XLA on the
    (N, S, WIN, C) row-reduced output.

Alignment: Mosaic requires dynamic-slice starts be provably 8-aligned
on sublanes (window rows) and 128-aligned on lanes (window cols *C),
so origins floor to 8 px in y and 128/gcd(C,128) px in x; the proofs
are in-kernel multiplications.  The window-relative sample coords use
the ACTUAL floored origins, so samples stay exact — alignment only
consumes window slack.

Semantics: EXACT (same sample lattice + clamping as the gather path)
for every ROI whose sample span plus alignment slack fits the window —
guaranteed when the box's pixel extent is <= WIN - 10.  Larger ROIs
clamp their outermost samples to the window edge; callers dispatch
this form only for maps with a metric size bound (BEV), never for
image-space crops where a near object can span the full map
(ops/roi.crop_and_resize stays the general path, and the training
path keeps the differentiable gather form).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dodt_tpu.ops.roi import sample_grid


def _hat(coords: jnp.ndarray, win: int) -> jnp.ndarray:
    """(S,) window-relative coords -> (S, win) bilinear hat weights."""
    # Mosaic's tpu.iota is integer-only; build int32 and cast
    pos = jax.lax.broadcasted_iota(
        jnp.int32, coords.shape + (win,), coords.ndim).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - pos))


def _roi_window_kernel(ystart8_ref, xstarta_ref, ys_ref, img_ref,
                       out_ref, *, win: int, xmul: int):
    i = pl.program_id(0)
    # in-kernel multiplications are Mosaic's alignment proofs:
    # rows (sublanes) 8-aligned, cols (lanes) 128-aligned
    y0 = ystart8_ref[i] * 8
    x0c = xstarta_ref[i] * xmul
    window = img_ref[pl.ds(y0, win), pl.ds(x0c, out_ref.shape[-1])]
    ry = _hat(ys_ref[i, :], win).astype(window.dtype)     # (S, win)
    out_ref[0] = jnp.dot(ry, window,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)          # (S, win*C)


@functools.partial(jax.jit, static_argnames=("crop_size", "window",
                                             "interpret"))
def crop_and_resize_window(image: jnp.ndarray, boxes_norm: jnp.ndarray,
                           crop_size: int, window: int = 64,
                           interpret: bool = False) -> jnp.ndarray:
    """Windowed Pallas crop-and-resize.

    Args:
      image: (H, W, C) feature map, H and W >= ``window``.  f32 maps
        are cast to bf16 for VMEM residency (the consumers — the bf16
        second-stage FC trunks — quantize to bf16 anyway).
      boxes_norm: (N, 4) normalized [y1, x1, y2, x2].
      crop_size: static output side S.
      window: static window side; exact for ROIs spanning <=
        window - 10 pixels, edge-clamped beyond.
      interpret: run in Pallas interpret mode (CPU tests).

    Returns:
      (N, S, S, C) crops in the (possibly bf16-cast) image dtype.
    """
    h, w, c = image.shape
    n = boxes_norm.shape[0]
    s = crop_size
    if h < window or w < window:
        raise ValueError(f"map {(h, w)} smaller than window {window}")
    # x-origin alignment: x0 * C must be a lane multiple (128)
    ax = 128 // math.gcd(c, 128)
    if ax >= window - s:
        raise ValueError(f"C={c} needs {ax}-px x alignment; window "
                         f"{window} has no slack for it")
    if image.dtype == jnp.float32:
        image = image.astype(jnp.bfloat16)

    ys = sample_grid(boxes_norm, h, boxes_norm[:, 0], boxes_norm[:, 2], s)
    xs = sample_grid(boxes_norm, w, boxes_norm[:, 1], boxes_norm[:, 3], s)
    ystart = (jnp.clip(jnp.floor(ys.min(axis=1)).astype(jnp.int32),
                       0, h - window) >> 3) << 3          # (N,) 8-aligned
    xstart = jnp.clip(jnp.floor(xs.min(axis=1)).astype(jnp.int32),
                      0, w - window)
    xstart = (xstart // ax) * ax                          # lane-aligned
    # window-relative sample coords; the clip encodes the edge-clamp
    # semantic for oversized ROIs (no-op when the span fits)
    ys_rel = jnp.clip(ys - ystart[:, None].astype(ys.dtype),
                      0.0, window - 1.0)
    xs_rel = jnp.clip(xs - xstart[:, None].astype(xs.dtype),
                      0.0, window - 1.0)

    img2d = image.reshape(h, w * c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            # full-array blocks: TPU block tiling requires the last two
            # dims be (8,128)-divisible or span the whole array, so the
            # (N, S) coordinate array stays VMEM-resident and the
            # kernel indexes row i itself
            pl.BlockSpec((n, s), lambda i, *_: (0, 0)),
            pl.BlockSpec((h, w * c), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, window * c),
                               lambda i, *_: (i, 0, 0)),
    )
    kernel = functools.partial(_roi_window_kernel, win=window,
                               xmul=ax * c)
    rowred = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, s, window * c), image.dtype),
        interpret=interpret,
    )(ystart >> 3, xstart // ax, ys_rel, img2d)           # (N, S, win*C)

    # x contraction in XLA: tiny batched matmul over the window cols
    rowred = rowred.reshape(n, s, window, c)
    cx = _hat(xs_rel, window).astype(image.dtype)         # (N, S, win)
    return jnp.einsum("nyxc,nsx->nysc", rowred, cx,
                      preferred_element_type=jnp.float32
                      ).astype(image.dtype)
