"""ROI feature extraction: bilinear crop-and-resize (pure JAX).

TPU replacement for tf.image.crop_and_resize as used by the reference's
RPN/AVOD ROI pooling (rpn_model.py:320-350, dt_avod_model.py:235-273):
a batched bilinear gather with static (num_rois, size, size, C) output.

Two deliberate departures from TF semantics, both TPU-motivated:

* **Half-pixel convention**: sample coordinate = norm * dim - 0.5
  (instead of TF's norm * (dim - 1)). Under this convention the sample
  lattice of the regular anchor grid is exactly periodic in the BEV
  feature map (anchor stride / voxel size pixels), which is what lets
  the RPN stage run as dense phase slicing (ops/dense_rpn.py) instead
  of 90k gathers.
* **Single packed gather**: the four bilinear taps are packed into the
  channel axis (tl|tr|bl|br) by two edge-replicating shifts, so each
  sample point costs ONE gather instead of four. TPU gathers are
  per-access bound, not per-byte, so this is ~4x on gather-dominated
  shapes.

Out-of-range samples clamp to the edge (equivalent to TF's behavior on
pre-clipped boxes, which is the only way the reference uses it).

* **Matmul form** (``method="matmul"``): bilinear sampling is separable,
  so the whole crop is two matmuls against hat-function interpolation
  matrices: ``crops = Ry @ F @ Cx^T`` with
  ``Ry[n*sy, y] = max(0, 1 - |y_sample - y|)`` (exactly the two bilinear
  taps + weights per row). TPU gathers are per-access bound and run far
  below HBM streaming rate; the MXU does not care that Ry/Cx are 2-sparse.
  At the RPN pass-2 shape (8192 ROIs x 3x3 from a 180x600x1 bottleneck)
  this replaces ~74k gather accesses with ~5 GFLOP of bf16 matmul — tens
  of microseconds instead of milliseconds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pack_bilinear_taps(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C) with channels [tl, tr, bl, br] where
    tr = image[y, min(x+1, W-1)] etc. (edge-replicated shifts)."""
    right = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    pair = jnp.concatenate([image, right], axis=-1)          # (H, W, 2C)
    down = jnp.concatenate([pair[1:], pair[-1:]], axis=0)
    return jnp.concatenate([pair, down], axis=-1)            # (H, W, 4C)


def sample_grid(boxes_norm: jnp.ndarray, dim_px: int, lo: jnp.ndarray,
                hi: jnp.ndarray, crop_size: int) -> jnp.ndarray:
    """Pixel sample coordinates along one axis, (N, S), clamped."""
    s = crop_size
    if s > 1:
        grid = jnp.arange(s, dtype=jnp.float32) / (s - 1)    # (S,)
        t = lo[:, None] + (hi - lo)[:, None] * grid          # (N, S)
    else:
        t = ((lo + hi) / 2.0)[:, None]
    return jnp.clip(t * dim_px - 0.5, 0.0, dim_px - 1)


def interp_matrix(coords: jnp.ndarray, dim_px: int) -> jnp.ndarray:
    """Hat-function bilinear interpolation matrix.

    coords: (N, S) pixel sample positions already clamped to
    [0, dim_px - 1]. Returns (N, S, dim_px) with exactly the two
    bilinear taps per row: weight (1 - frac) at floor(coord) and frac at
    floor(coord) + 1 (a single weight 1 on integer coords). Rows sum
    to 1.
    """
    r = jnp.arange(dim_px, dtype=coords.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - r))


def crop_and_resize_matmul(image: jnp.ndarray, boxes_norm: jnp.ndarray,
                           crop_size: int) -> jnp.ndarray:
    """Crop-and-resize as two interpolation matmuls (MXU, gather-free).

    Numerically equivalent to the gather path (same sample lattice, same
    clamping); preferred on TPU whenever N*S is large enough that the
    per-access gather cost dominates the dense-contraction FLOPs.
    """
    h, w, c = image.shape
    n = boxes_norm.shape[0]
    s = crop_size
    ys = sample_grid(boxes_norm, h, boxes_norm[:, 0], boxes_norm[:, 2], s)
    xs = sample_grid(boxes_norm, w, boxes_norm[:, 1], boxes_norm[:, 3], s)
    ry = interp_matrix(ys, h).astype(image.dtype)        # (N, S, H)
    cx = interp_matrix(xs, w).astype(image.dtype)        # (N, S, W)
    # contract H once for all ROIs: (N*S, H) @ (H, W*C)
    rowred = (ry.reshape(n * s, h) @ image.reshape(h, w * c)
              ).reshape(n, s, w, c)
    # per-ROI contraction over W (batched GEMM)
    return jnp.einsum("nywc,nxw->nyxc", rowred, cx)


def auto_method(num_boxes: int, crop_size: int, image_shape,
                itemsize: int) -> str:
    """Static dispatch between the gather and matmul crop forms.

    The matmul form materializes rowred (N, S, W, C); its cost scales
    with C while the packed-gather path's per-access cost does not (C
    rides along in the gathered vector). Measured on the v5e:
    thin-channel pass-2 crops (8192x3x3 from the 1-channel ranking
    bottleneck) run 1.7 -> 0.87 ms as matmuls, but the 32-channel
    second-stage feature crops run 2.2 -> 8.0 ms, and at train shapes
    (1024 proposals, batch 8) the rowred intermediate alone is
    17.6 GB -> compile-time OOM. So: matmul only for thin maps, with a
    rowred byte cap as the backstop (per vmap slice; batching
    multiplies it). The ns lower bound keeps small crop batches on the
    gather path (dispatch + matrix-build overhead); the ns upper bound
    avoids (N*S, H)+(N*S, W) interpolation matrices on the 90k-anchor
    fallback path (the dense lattice covers that shape).
    """
    h_, w_, c_ = image_shape
    ns = num_boxes * crop_size
    rowred_bytes = ns * w_ * c_ * itemsize
    return ("matmul" if 256 <= ns <= 65536 and c_ <= 2
            and rowred_bytes <= 128 * 1024 * 1024 else "gather")


# rowred-byte threshold above which the matmul-form VJP scans proposal
# chunks instead of materializing (N, S, W, C) at once (tests shrink it
# to force the chunked path at small shapes), and the proposals-per-
# chunk granularity (module globals so the profilers can sweep them).
# 512 is the measured optimum at train shapes: 484.9 ms/step vs 515.3
# at 128+remat and 491.2 unchunked, B=4 (results_r05/second_stage_bwd
# .json) — big enough to amortize the scan, small enough to keep
# rowred in the ~34 MB range per chunk.
_BWD_CHUNK_BYTES = 64 * 1024 * 1024
_BWD_CHUNK = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _crop_gather_mmbwd(image, boxes_norm, crop_size):
    """Gather-form forward with the matmul form's VJP.

    The two forms are the same function (same sample lattice, same
    clamping — pinned by tests/test_ops.py), so the matmul form's VJP
    is a valid VJP for the gather forward.  The point: the gather's own
    transpose is a scatter-add of (N, S, S, C) cotangents into the
    feature map, and TPU scatters serialize — backward time per couple
    GROWS with batch (64.6 -> 123.6 ms from B=1 to B=4,
    results_r03/train_fwd_bwd.json) while every dense stage scales.
    The matmul transpose is dF = sum_n Ry_n^T g_n Cx_n — MXU work —
    and box gradients fall out of autodiff through the hat matrices
    (the reference's tf.image.crop_and_resize also carries box
    gradients, so they are kept, not stopped).
    """
    return _crop_gather(image, boxes_norm, crop_size)


def _crop_gather_mmbwd_fwd(image, boxes_norm, crop_size):
    return _crop_gather(image, boxes_norm, crop_size), (image, boxes_norm)


def _crop_gather_mmbwd_bwd(crop_size, res, g):
    image, boxes_norm = res
    g = g.astype(image.dtype)
    n = boxes_norm.shape[0]
    h, w, c = image.shape
    # The matmul-form VJP replays the forward, materializing rowred
    # (N, S, W, C). Under vmap over (batch, frame) that single
    # intermediate is what killed B=8 training (bf16[8,2,1024,7,600,32]
    # = 17.6 GB compile-time OOM, results_r04/train_batched.json). When
    # the un-chunked rowred would be large, scan proposal chunks
    # instead: dImage accumulates across chunks (f32), box grads
    # concatenate; FLOPs unchanged, live memory drops N/chunk-fold.
    chunk = _BWD_CHUNK
    rowred_bytes = (n * crop_size * w * c
                    * jnp.dtype(image.dtype).itemsize)
    if n <= chunk or n % chunk or rowred_bytes <= _BWD_CHUNK_BYTES:
        _, vjp = jax.vjp(
            lambda im, bx: crop_and_resize_matmul(im, bx, crop_size),
            image, boxes_norm)
        return vjp(g)

    def body(dimg, args):
        bx, gc = args
        _, vjp = jax.vjp(
            lambda im, b: crop_and_resize_matmul(im, b, crop_size),
            image, bx)
        dim, dbx = vjp(gc)
        return dimg + dim.astype(jnp.float32), dbx

    dimg, dbox = jax.lax.scan(
        body, jnp.zeros((h, w, c), jnp.float32),
        (boxes_norm.reshape(n // chunk, chunk, -1),
         g.reshape((n // chunk, chunk) + g.shape[1:])))
    return dimg.astype(image.dtype), dbox.reshape(n, -1)


_crop_gather_mmbwd.defvjp(_crop_gather_mmbwd_fwd, _crop_gather_mmbwd_bwd)


def crop_and_resize(image: jnp.ndarray, boxes_norm: jnp.ndarray,
                    crop_size: int, method: str = "auto") -> jnp.ndarray:
    """Bilinear crop-and-resize.

    Args:
      image: (H, W, C) feature map.
      boxes_norm: (N, 4) normalized [y1, x1, y2, x2] in [0, 1].
      crop_size: static output side S.
      method: "auto" | "gather" | "matmul" | "gather_mmbwd". "auto"
        picks the matmul form when the crop batch is gather-dominated
        AND the row-reduced intermediate stays small (thin-channel
        maps: the RPN pass-2 1-channel bottleneck), the packed-gather
        form otherwise. "gather_mmbwd" is the gather forward with the
        matmul form's scatter-free VJP — the training path's choice
        for wide-channel maps.

    Returns:
      (N, S, S, C) crops.
    """
    if method in ("auto", "auto_train"):
        picked = auto_method(boxes_norm.shape[0], crop_size,
                             image.shape,
                             jnp.dtype(image.dtype).itemsize)
        # training path: gather forwards take the scatter-free VJP
        # (the matmul form's backward is already matmuls)
        method = ("gather_mmbwd" if method == "auto_train"
                  and picked == "gather" else picked)
    if method == "matmul":
        return crop_and_resize_matmul(image, boxes_norm, crop_size)
    if method == "gather_mmbwd":
        return _crop_gather_mmbwd(image, boxes_norm, crop_size)
    return _crop_gather(image, boxes_norm, crop_size)


def _crop_gather(image: jnp.ndarray, boxes_norm: jnp.ndarray,
                 crop_size: int) -> jnp.ndarray:
    h, w, c = image.shape
    ys = sample_grid(boxes_norm, h, boxes_norm[:, 0], boxes_norm[:, 2],
                     crop_size)
    xs = sample_grid(boxes_norm, w, boxes_norm[:, 1], boxes_norm[:, 3],
                     crop_size)

    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    y_frac = (ys - y0f)[:, :, None, None]         # (N, S, 1, 1)
    x_frac = (xs - x0f)[:, None, :, None]         # (N, 1, S, 1)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    if c <= 8:
        # Gather-count bound: pack the 4 taps into channels, one gather.
        packed = pack_bilinear_taps(image)
        taps = packed[y0[:, :, None], x0[:, None, :]]  # (N, S, S, 4C)
        tl = taps[..., 0 * c:1 * c]
        tr = taps[..., 1 * c:2 * c]
        bl = taps[..., 2 * c:3 * c]
        br = taps[..., 3 * c:4 * c]
    else:
        # Wide maps: 4 gathers beat materializing a 4x copy of the map.
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)

        def gather(yi, xi):
            return image[yi[:, :, None], xi[:, None, :]]

        tl = gather(y0, x0)
        tr = gather(y0, x1i)
        bl = gather(y1i, x0)
        br = gather(y1i, x1i)

    top_i = tl + (tr - tl) * x_frac
    bot_i = bl + (br - bl) * x_frac
    return top_i + (bot_i - top_i) * y_frac
