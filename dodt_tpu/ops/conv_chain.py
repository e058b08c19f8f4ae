"""Fused 3x3-conv chains as VMEM-resident shifted matmuls (Pallas).

The VGG tower interior (conv3/conv4 blocks, pyramid fusion convs —
reference bev_vgg_pyramid.py:29-178) runs its 3x3 convs through XLA's
conv emitter at ~18-35% MFU at production shapes (results_r03/
tower_bisect.json). This kernel re-expresses a CHAIN of 3x3 SAME convs
(+bias+relu) as pure MXU matmuls on spatial row-strips that stay
resident in VMEM across the whole chain:

  * the (H, W, C) map is stored flattened as (H * W_pad, C) with one
    zero column on each side of W. A (dy, dx) conv tap is then a ROW
    OFFSET dy * W_pad + dx - 1 of the flattened matrix, so
      y = relu(bias + sum_d X[off_d : off_d + M] @ K[d])
    is nine big (M, Ci) x (Ci, Co) matmuls per conv — M = rows * W_pad
    in the thousands, K/N the channel counts: exactly MXU shape.
    Row-wrap contamination from the off-by-(W_pad±1) taps lands only
    in the zero-padding columns, which are re-zeroed (one masked
    multiply) before the next conv — the real columns see exactly the
    zeros a SAME conv pads with.
  * each grid step DMAs one haloed row-strip from HBM (N halo rows per
    side for an N-conv chain), runs the full chain in VMEM ping-pong
    scratch, and writes only the final conv's strip — the
    inter-conv activations never touch HBM.

Exactness: same f32 accumulation as XLA's bf16 conv, but a different
accumulation ORDER (9 partial matmuls vs one fused contraction), so
outputs can differ in the last bf16 bit; pinned by tolerance tests +
same-checkpoint AP equality (the windowed-ROI-align precedent).
Gradient: custom_vjp through the mathematically-identical XLA chain
(kernel stays forward-only), same pattern as ops/correlation.py.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv_chain_xla(x: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                   biases: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Reference chain: [3x3 SAME conv -> +bias -> relu] per stage.

    x: (H, W, Ci); kernels[l]: (3, 3, Ci_l, Co_l); biases[l]: (Co_l,).
    """
    h = x
    for k, b in zip(kernels, biases):
        h = jax.lax.conv_general_dilated(
            h[None], k.astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        h = jax.nn.relu(h + b.astype(h.dtype))
    return h


def _chain_kernel(x_hbm, *refs, n_convs: int, th: int, w_pad: int,
                  h_real: int, w_real: int, chans: Tuple[int, ...],
                  out_dtype):
    """One row-strip through the whole chain.

    refs layout: [w_0, b_0, ..., w_{n-1}, b_{n-1}, out_ref,
                  scratch_a, scratch_b, sem].
    scratch_[ab]: ((2 + th + 2*n_convs) * w_pad, Cmax) — one leading
    zero ROW (w_pad flattened rows) so the off=-1 tap never reads
    before the buffer, one trailing row for the off=+w_pad+1 tap;
    ping-pong between convs. Stale trailing/neighbor values reached
    through the ±1-column row-wrap only ever land in the zero-padding
    output columns, which the jnp.where mask re-zeroes (where, not
    multiply, so stale NaN/Inf cannot propagate).
    """
    w_refs = refs[0:2 * n_convs:2]
    b_refs = refs[1:2 * n_convs:2]
    out_ref = refs[2 * n_convs]
    scr_in = refs[2 * n_convs + 1]   # exact input lane width (DMA dst)
    scr = [refs[2 * n_convs + 2], refs[2 * n_convs + 3]]
    sem = refs[2 * n_convs + 4]

    # batch is a native grid dim (vmap does not slice manual-DMA ANY
    # refs), rows the second
    bi = pl.program_id(0)
    i = pl.program_id(1)
    rows = th + 2 * n_convs
    # leading zero guard row (scratch persists across grid steps)
    scr_in[0:w_pad, :] = jnp.zeros((w_pad, scr_in.shape[1]),
                                   scr_in.dtype)
    scr[0][0:w_pad, :] = jnp.zeros((w_pad, scr[0].shape[1]),
                                   scr[0].dtype)
    scr[1][0:w_pad, :] = jnp.zeros((w_pad, scr[1].shape[1]),
                                   scr[1].dtype)
    # full-lane destination; w_pad is 8-aligned so the sublane offset
    # and size meet Mosaic's DMA tiling constraint
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th * w_pad, rows * w_pad), :],
        scr_in.at[pl.ds(w_pad, rows * w_pad), :],
        sem)
    dma.start()
    dma.wait()

    for l in range(n_convs):
        ci, co = chans[l], chans[l + 1]
        rows_out = rows - 2
        m = rows_out * w_pad
        src = scr_in if l == 0 else scr[(l - 1) % 2]
        w_l = w_refs[l][...]                     # (9, Ci, Co)
        acc = jnp.zeros((m, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off = dy * w_pad + dx - 1
                xs = src[w_pad + off:w_pad + off + m, 0:ci]
                acc = acc + jnp.dot(
                    xs, w_l[dy * 3 + dx],
                    preferred_element_type=jnp.float32)
        y = jax.nn.relu(acc + b_refs[l][...].astype(jnp.float32))
        # Re-zero the padding positions. Columns: cols 0 and > w_real
        # hold row-wrap garbage / edge leakage. Rows: a SAME conv pads
        # each conv's INPUT with zeros, but the halo computes
        # conv-of-zeros at rows outside the image — relu(bias) != 0 —
        # so halo rows beyond the image top/bottom must be forced back
        # to the exact zeros the next conv's padding provides.
        flat = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col = flat % w_pad
        # spatial row of output row r: strip start (i*th - n_convs in
        # original coords) advances by one per conv in the chain
        row_sp = i * th - n_convs + (l + 1) + flat // w_pad
        ok = ((col >= 1) & (col <= w_real) &
              (row_sp >= 0) & (row_sp < h_real))
        y = jnp.where(ok, y, 0.0)
        y = y.astype(out_dtype)
        if l == n_convs - 1:
            out_ref[0] = y
        else:
            scr[l % 2][w_pad:w_pad + m, 0:co] = y
        rows = rows_out


def conv_chain_pallas(x: jnp.ndarray, kernels: Sequence[jnp.ndarray],
                      biases: Sequence[jnp.ndarray],
                      tile_rows: int = 32) -> jnp.ndarray:
    """Fused chain of 3x3 SAME conv+bias+relu stages on row-strips.

    x: (H, W, Ci) or (B, H, W, Ci) bf16/f32; returns same leading
    shape with Co_last channels, in x.dtype. The batch is a native
    grid dimension (one dispatch for the whole batch).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    bsz, h, w, ci0 = x.shape
    n = len(kernels)
    # Mosaic's lane tiling is 128: a DMA may not slice the channel
    # (lane) dim at sub-128 granularity, so pad the INPUT channels up
    # to a 128 multiple (the padded weight rows are zero — exact
    # no-op) and DMA full lanes.
    ci_pad = -(-ci0 // 128) * 128
    chans = (ci_pad,) + tuple(k.shape[3] for k in kernels)
    cmax = max(chans[1:])
    # Mosaic DMAs need 8-aligned sublane offsets/sizes: round the
    # padded width up to a multiple of 8 so every strip's flattened
    # row count is 8-aligned; the extra columns are masked zeros
    w_pad = -(-(w + 2) // 8) * 8
    th = tile_rows
    gh = -(-h // th)
    hp = gh * th

    # flattened (rows, C) layout with zero W-pad columns and n halo
    # rows top/bottom (+ bottom fill to the strip grid)
    xp = jnp.pad(x, ((0, 0), (n, n + (hp - h)),
                     (1, w_pad - w - 1), (0, ci_pad - ci0)))
    x2 = xp.reshape(bsz, (hp + 2 * n) * w_pad, ci_pad)

    args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for l, (k, b) in enumerate(zip(kernels, biases)):
        k9 = k.astype(x.dtype).reshape(9, k.shape[2], k.shape[3])
        if l == 0 and ci_pad != ci0:
            k9 = jnp.pad(k9, ((0, 0), (0, ci_pad - ci0), (0, 0)))
        args.append(k9)
        args.append(b.astype(jnp.float32).reshape(1, -1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_chain_kernel, n_convs=n, th=th, w_pad=w_pad,
                          h_real=h, w_real=w, chans=chans,
                          out_dtype=x.dtype),
        grid=(bsz, gh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th * w_pad, chans[-1]),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp * w_pad, chans[-1]),
                                       x.dtype),
        # the unrolled tap slices + f32 accumulators overflow the
        # default 16M scoped-vmem budget; v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            # 1 leading zero guard row + 1 trailing row: the
            # (dy=2, dx=2) tap reads one element past the data.
            # scr_in carries the exact input lane width so the DMA
            # writes full lanes; the ping-pong pair carries the conv
            # widths
            pltpu.VMEM(((2 + th + 2 * n) * w_pad, ci_pad), x.dtype),
            pltpu.VMEM(((2 + th + 2 * n) * w_pad, cmax), x.dtype),
            pltpu.VMEM(((2 + th + 2 * n) * w_pad, cmax), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x2, *args)
    out = out.reshape(bsz, hp, w_pad, chans[-1])[:, :h, 1:1 + w]
    return out[0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_chain_tpu(x, kernels, biases, tile_rows):
    return conv_chain_pallas(x, kernels, biases, tile_rows)


def _conv_chain_tpu_fwd(x, kernels, biases, tile_rows):
    out = conv_chain_pallas(x, kernels, biases, tile_rows)
    return out, (x, kernels, biases)


def _xla_nd(x, kernels, biases):
    if x.ndim > 3:
        return jax.vmap(lambda xx: conv_chain_xla(xx, kernels, biases))(x)
    return conv_chain_xla(x, kernels, biases)


def _conv_chain_tpu_bwd(tile_rows, res, g):
    x, kernels, biases = res
    _, vjp = jax.vjp(_xla_nd, x, kernels, biases)
    return tuple(vjp(g))


_conv_chain_tpu.defvjp(_conv_chain_tpu_fwd, _conv_chain_tpu_bwd)


def conv_chain(x: jnp.ndarray, kernels: Sequence[jnp.ndarray],
               biases: Sequence[jnp.ndarray], tile_rows: int = 32,
               use_pallas: bool | None = None) -> jnp.ndarray:
    """Chain of [3x3 SAME conv + bias + relu] over (..., H, W, Ci).

    Pallas fused kernel on TPU (batch folded into the kernel grid),
    XLA conv chain elsewhere.
    """
    lead = x.shape[:-3]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _xla_nd(x, tuple(kernels), tuple(biases))
    xb = x.reshape((-1,) + x.shape[-3:]) if lead else x
    out = _conv_chain_tpu(xb, tuple(kernels), tuple(biases), tile_rows)
    return out.reshape(lead + out.shape[1:]) if lead else out
