"""VGG-pyramid feature towers (Flax), bfloat16 compute.

Parity target: reference bev_vgg_pyramid.py:29-178 / img_vgg_pyramid.py
— encoder conv1-4 with 2x2 max-pools, decoder of stride-2 transposed
convs with skip concat + 3x3 fusion convs, returning a full-resolution
feature map with conv1's channel count.

TPU deviations (documented):
  * normalization is configurable: "none" (default) matches the
    reference's plain conv+relu VGG and avoids GroupNorm's ~3x
    fwd / ~2x bwd overhead at these spatial sizes; "gn" adds
    stateless GroupNorm after every conv.
  * compute dtype is bfloat16 by default (MXU native), params float32.
  * decode_stride=2 stops the decoder one level up (see config).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dodt_tpu.config import FeatureExtractorConfig
from dodt_tpu.ops.conv_chain import conv_chain

KITTI_IMAGE_MEANS = (92.8403, 97.7996, 93.5843)  # img_feature_extractor.py:8


def _norm(ch: int, dtype, kind: str = "none"):
    if kind == "gn":
        return nn.GroupNorm(num_groups=min(8, ch), dtype=dtype)
    return lambda x: x


# ---------------------------------------------------------------------------
# Space-to-depth stem: full-resolution 3x3 convs with few channels are
# layout-bound on TPU (e.g. 6->32 at 704x800 runs at <1 TFLOP/s). The
# same function expressed on the (H/2, W/2, 4C) space-to-depth layout
# is a 2x2 conv with 4x the channels — MXU-friendly. The kernel is the
# standard (3,3,Ci,Co) parameter scattered into a (2,2,4Ci,4Co) layout,
# so parameters, receptive field and outputs are EXACTLY those of the
# standard conv (incl. SAME zero-padding, enforced by phase masks).
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel layout (ay, ax, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c)


def s2d_kernel_3x3(k: jnp.ndarray) -> jnp.ndarray:
    """Scatter a (3, 3, Ci, Co) kernel into the equivalent
    (2, 2, 4Ci, 4Co) space-to-depth kernel for offset-0 indexing
    (y[p] = sum_d k[d] x[p + d] on a pre-padded input)."""
    ci, co = k.shape[2], k.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, ci, 2, 2, co), k.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(3):
                for dx in range(3):
                    ey, ay = divmod(a + dy, 2)
                    ex, ax = divmod(b + dx, 2)
                    k2 = k2.at[ey, ex, ay, ax, :, a, b, :].set(
                        k[dy, dx])
    return k2.reshape(2, 2, 4 * ci, 4 * co)


def packed_entry_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """Scatter a (3, 3, Ci, Co) kernel into the (4, 4, Ci, 4Co) kernel
    of the fused [3x3 conv -> space-to-depth] op: one stride-2 VALID
    conv on the SPATIAL input produces the s2d-layout output directly
    (phase-major (ay, ax, c) channels), so the input never goes through
    the s2d relayout — a pure data movement XLA lowers poorly for
    thin-channel full-resolution maps."""
    ci, co = k3.shape[2], k3.shape[3]
    k4 = jnp.zeros((4, 4, ci, 4 * co), k3.dtype)
    for ay in range(2):
        for ax in range(2):
            ph = ay * 2 + ax
            k4 = k4.at[ay:ay + 3, ax:ax + 3, :,
                       ph * co:(ph + 1) * co].set(k3)
    return k4


def s2d_concat_kernel_3x3(k3: jnp.ndarray, splits) -> jnp.ndarray:
    """s2d_kernel_3x3 for an input that is a CHANNEL CONCAT of s2d
    tensors: [(ay,ax,c1)..(ay,ax,cK)] instead of (ay,ax,[c1..cK]).
    `splits` are the per-part channel counts summing to Ci. The
    scattered kernel's input axis is permuted to match."""
    k = s2d_kernel_3x3(k3)               # (2, 2, 4*Ci, 4*Co)
    ci = k3.shape[2]
    # position of logical (ay, ax, part, c) in the concat layout
    perm = np.zeros(4 * ci, dtype=np.int32)
    base_logical = 0
    base_concat = 0
    for part in np.asarray(splits):
        for ph in range(4):
            for c in range(part):
                logical = ph * ci + base_logical + c
                concat = base_concat + ph * part + c
                perm[concat] = logical
        base_logical += part
        base_concat += 4 * part
    return k[:, :, perm, :]


def s2d_pad1_top_left(y: jnp.ndarray, ch: int) -> jnp.ndarray:
    """1-row/1-col spatial zero-pad (top/left) of an s2d-layout tensor,
    as a phase shuffle + block shift (plus a zero block bottom/right to
    keep the spatial size even): output block j covers spatial rows
    2j-1, 2j of the input. Lets a 3x3 SAME conv run in s2d layout with
    the standard shift-by-one scattered kernel and land back at block
    origin 0 — no full-grid relayout."""
    g = [y[..., i * ch:(i + 1) * ch] for i in range(4)]  # 00 01 10 11

    def down(t):
        return jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)))

    def keep_h(t):
        return jnp.pad(t, ((0, 0), (0, 1), (0, 0), (0, 0)))

    def right(t):
        return jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)))

    def keep_w(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))

    # pad top on ay: new (0,ax) <- old (1,ax) one block down;
    #                new (1,ax) <- old (0,ax)
    g = [down(g[2]), down(g[3]), keep_h(g[0]), keep_h(g[1])]
    # pad left on ax: new (ay,0) <- old (ay,1) one block right;
    #                 new (ay,1) <- old (ay,0)
    g = [right(g[1]), keep_w(g[0]), right(g[3]), keep_w(g[2])]
    return jnp.concatenate(g, axis=-1)


def _s2d_range_mask(n_blocks: int, lo: int, hi: int) -> np.ndarray:
    """(n_blocks, 2) 0/1 mask of original positions in [lo, hi)."""
    pos = np.arange(n_blocks * 2).reshape(n_blocks, 2)
    return ((pos >= lo) & (pos < hi)).astype(np.float32)


def _zero_outside(y: jnp.ndarray, h0: int, h1: int, w0: int, w1: int,
                  orig_h0: int, orig_w0: int) -> jnp.ndarray:
    """Zero original positions outside [h0, h1) x [w0, w1) where the
    s2d array's block origin corresponds to original position
    (orig_h0, orig_w0).

    One multiply with a precomputed (hb, wb, 4C) constant, channel
    layout phase-major (ay, ax, c): the earlier 6D-reshape form forced
    a sublane/lane relayout around the multiply — the 3D constant form
    is bit-exact and ~0.5 ms faster through the stem at production BEV
    shapes (results_r03/stem_bisect.json, mask3d/exact_glue arms)."""
    b, hb, wb, c4 = y.shape
    rm = _s2d_range_mask(hb, h0 - orig_h0, h1 - orig_h0)  # (hb, 2)
    cm = _s2d_range_mask(wb, w0 - orig_w0, w1 - orig_w0)  # (wb, 2)
    m = rm[:, None, :, None, None] * cm[None, :, None, :, None]
    m = np.broadcast_to(m, (hb, wb, 2, 2, c4 // 4)).reshape(hb, wb, c4)
    return y * jnp.asarray(m, y.dtype)


def depth_to_space(y: jnp.ndarray, co: int) -> jnp.ndarray:
    """(B, h, w, 4co) phase-major (ay, ax, c) -> (B, 2h, 2w, co)."""
    b, hb, wb, _ = y.shape
    y = y.reshape(b, hb, wb, 2, 2, co)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, 2 * hb, 2 * wb, co)


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's names/shapes/initializers, for
    convs whose math runs through a scattered-kernel form — the param
    tree (and therefore every checkpoint) is identical to nn.Conv."""
    features: int

    @nn.compact
    def __call__(self, ci: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, ci, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class SubpixelConvTranspose(nn.Module):
    """Exact TPU-native replacement for nn.ConvTranspose(3x3, stride 2,
    SAME): the sub-pixel decomposition.

    XLA lowers a stride-2 transposed conv to a conv over the
    zero-dilated input — 9 taps per output pixel of which ~3/4 multiply
    structural zeros. The same function is one dense 2x2 conv producing
    the 4 output phases as channels, interleaved by depth-to-space:
      y[2i+py, 2j+px] uses kernel taps k[py::?]:
        phase (0,0): k[::2, ::2] on x[i-1..i, j-1..j]
        phase (0,1): k[::2, 1]   on x[i-1..i, j]
        phase (1,0): k[1, ::2]   on x[i,      j-1..j]
        phase (1,1): k[1, 1]     on x[i, j]
    (derived from lax.conv_transpose SAME alignment; pinned exactly by
    tests/test_backbone.py against nn.ConvTranspose). Parameter names
    and shapes match nn.ConvTranspose — checkpoints are interchangeable.
    """
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    # packed=True returns the phase-major (py, px, c) output WITHOUT the
    # depth-to-space interleave — i.e. the s2d layout of the upsampled
    # map at block origin 0, for consumers that stay in s2d layout
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1]
        co = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, ci, co), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (co,),
                          jnp.float32)
        k = k.astype(self.dtype)
        # pack the 4 phases into a (2, 2, Ci, 4Co) kernel: phase order
        # (py, px) row-major in the channel axis
        k2 = jnp.zeros((2, 2, ci, 4 * co), self.dtype)
        k2 = k2.at[:, :, :, 0 * co:1 * co].set(k[::2, ::2])
        k2 = k2.at[:, 1, :, 1 * co:2 * co].set(k[::2, 1])
        k2 = k2.at[1, :, :, 2 * co:3 * co].set(k[1, ::2])
        k2 = k2.at[1, 1, :, 3 * co:4 * co].set(k[1, 1])
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (1, 0), (1, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.packed:
            return y + jnp.tile(bias, 4).astype(self.dtype)
        return depth_to_space(y, co) + bias.astype(self.dtype)


class VggPyramid(nn.Module):
    """Encoder-decoder pyramid tower; returns (B, H, W, conv1_ch).

    Inputs of any (H, W) are zero-padded (top/left) up to a multiple of
    the total pool stride 8 and sliced back after the decoder — the
    reference's 700 -> 704 BEV padding (bev_vgg_pyramid.py:59),
    generalized to both dims.
    """
    cfg: FeatureExtractorConfig
    dtype: jnp.dtype = jnp.bfloat16
    pad_rows: int = 0   # unused, kept for config compatibility

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 fused: Tuple[str, ...] | None = None) -> jnp.ndarray:
        """fused=None defers to cfg.fused_interior; a tuple of block
        names is a call-time override (the model passes () on train
        paths so the fused kernel stays an eval-only dispatch,
        mirroring the windowed-ROI precedent). Must be static under
        nn.remat (static_argnums=(2,))."""
        cfg = self.cfg
        x = x.astype(self.dtype)
        use_s2d = (cfg.s2d_stem and cfg.decode_stride == 2
                   and cfg.pyramid and cfg.norm == "none")
        use_s2d_int = use_s2d and cfg.s2d_interior
        ph = (-x.shape[1]) % 8
        pw = (-x.shape[2]) % 8
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, 0), (pw, 0), (0, 0)))

        fused_set = cfg.fused_interior if fused is None else fused
        if cfg.norm != "none":
            fused_set = ()

        def block(h, num, ch, name):
            if name in fused_set:
                # whole block as one VMEM-resident Pallas conv chain
                # (shifted matmuls, ops/conv_chain.py); _ConvParams
                # keeps the param tree identical to nn.Conv
                ks, bs = [], []
                cin = h.shape[-1]
                for i in range(num):
                    k, b2 = _ConvParams(ch, name=f"{name}_{i}")(cin)
                    ks.append(k)
                    bs.append(b2)
                    cin = ch
                return conv_chain(h, ks, bs,
                                  tile_rows=cfg.fused_tile_rows)
            for i in range(num):
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"{name}_{i}")(h)
                h = _norm(ch, self.dtype, cfg.norm)(h)
                h = nn.relu(h)
            return h

        def pool(h):
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        def s2d_block(h, num, ch, name, flat_params):
            """Conv block + 2x2 max-pool, evaluated in space-to-depth
            layout with ZERO relayouts: the entry conv fuses
            [3x3 conv -> s2d] as one stride-2 phase-packed conv
            (packed_entry_kernel) on the SPATIAL input; inner convs run
            on the s2d layout (s2d_kernel_3x3); the pool is elementwise
            maxima of the 4 phase channel groups. Exact same function
            as block()+pool() incl. SAME zero-padding (pad + phase
            masks); pinned by tests/test_backbone.py.

            Returns (pre-pool s2d activations at block origin 0 — the
            skip connection, in s2d layout — and the pooled SPATIAL
            map at the next scale)."""
            h_in, w_in = h.shape[1], h.shape[2]
            hp = jnp.pad(h, ((0, 0), (num, num), (num, num), (0, 0)))
            hs = None
            origin = 0
            for i in range(num):
                cin = hp.shape[-1] if i == 0 else ch
                if flat_params:
                    kern = self.param(f"{name}_{i}_kernel",
                                      nn.initializers.lecun_normal(),
                                      (3, 3, cin, ch), jnp.float32)
                    bias = self.param(f"{name}_{i}_bias",
                                      nn.initializers.zeros, (ch,),
                                      jnp.float32)
                else:
                    kern, bias = _ConvParams(
                        ch, name=f"{name}_{i}")(cin)
                if i == 0:
                    hs = jax.lax.conv_general_dilated(
                        hp, packed_entry_kernel(kern.astype(self.dtype)),
                        (2, 2), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    origin = -(num - 1)
                else:
                    hs = jax.lax.conv_general_dilated(
                        hs, s2d_kernel_3x3(kern.astype(self.dtype)),
                        (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    origin += 1
                hs = nn.relu(hs + jnp.tile(bias, 4).astype(self.dtype))
                if i < num - 1:
                    hs = _zero_outside(hs, 0, h_in, 0, w_in,
                                       origin, origin)
            pooled = jnp.maximum(
                jnp.maximum(hs[..., 0 * ch:1 * ch],
                            hs[..., 1 * ch:2 * ch]),
                jnp.maximum(hs[..., 2 * ch:3 * ch],
                            hs[..., 3 * ch:4 * ch]))
            return hs, pooled

        c1 = c2 = None
        c2_s2d = None
        if use_s2d:
            # full-res c1 is never materialized (unused at
            # decode_stride 2)
            _, c1p = s2d_block(x, *cfg.conv1, name="conv1",
                               flat_params=True)
        else:
            c1 = block(x, *cfg.conv1, name="conv1")
            c1p = pool(c1)
        if use_s2d_int:
            c2_s2d, c2p = s2d_block(c1p, *cfg.conv2, name="conv2",
                                    flat_params=False)
        else:
            c2 = block(c1p, *cfg.conv2, name="conv2")
            c2p = pool(c2)
        # conv3/conv4 stay standard: at 128/256 channels the 3x3 convs
        # already fill the MXU, so the s2d form's 1.78x FLOP overhead
        # dominates (measured: conv3-s2d regressed the keyframe
        # 13.33 -> 13.78 ms and raised pair GFLOPs 588 -> 663)
        # stage taps for the bisect profiler (no-ops unless apply() is
        # called with mutable=["intermediates"]): the s2d/fused paths
        # hold parameters in _ConvParams modules, whose captured
        # "intermediate" is the parameter tuple — these sows are the
        # real activations
        self.sow("intermediates", "stage_c2p", c2p)
        c3 = block(c2p, *cfg.conv3, name="conv3")
        self.sow("intermediates", "stage_c3", c3)
        c4 = block(pool(c3), *cfg.conv4, name="conv4")
        self.sow("intermediates", "stage_c4", c4)

        if not cfg.pyramid:
            # plain VGG (reference bev_vgg.py / img_vgg.py): bilinear
            # upsample of conv4 back to the output stride, no skips
            out_h = (x.shape[1]) // cfg.decode_stride
            out_w = (x.shape[2]) // cfg.decode_stride
            f = jax.image.resize(
                c4, (c4.shape[0], out_h, out_w, c4.shape[-1]),
                method="bilinear")
            sh = ph // cfg.decode_stride
            sw = pw // cfg.decode_stride
            if sh or sw:
                f = f[:, sh:, sw:]
            return f

        def up(h, ch, name):
            h = SubpixelConvTranspose(ch, dtype=self.dtype,
                                      name=name)(h)
            h = _norm(ch, self.dtype, cfg.norm)(h)
            return nn.relu(h)

        u3 = up(c4, cfg.conv3[1], "upconv3")
        f3 = block(jnp.concatenate([c3, u3], axis=-1), 1, cfg.conv2[1],
                   name="pyramid_fusion3")
        self.sow("intermediates", "stage_f3", f3)
        if use_s2d_int:
            # packed decoder: the subpixel transpose conv's phase-major
            # output IS the s2d layout of the upsampled map — no
            # depth-to-space; the skip (c2_s2d) is already in s2d
            # layout; the fusion conv runs as one 2x2 s2d conv (kernel
            # permuted for the channel-concat layout). The shift-by-one
            # kernel convention needs the input at spatial origin -1:
            # the phase-shuffle pad provides it without a relayout.
            ch = cfg.conv1[1]
            cu = cfg.conv2[1]
            u2 = SubpixelConvTranspose(cu, dtype=self.dtype,
                                       packed=True, name="upconv2")(f3)
            u2 = nn.relu(u2)
            xcat = jnp.concatenate([s2d_pad1_top_left(c2_s2d, cu),
                                    s2d_pad1_top_left(u2, cu)], axis=-1)
            kern, bias = _ConvParams(
                ch, name="pyramid_fusion2_0")(2 * cu)
            ks = s2d_concat_kernel_3x3(kern.astype(self.dtype),
                                       (cu, cu))
            y = jax.lax.conv_general_dilated(
                xcat, ks, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            f2s = nn.relu(y + jnp.tile(bias, 4).astype(self.dtype))
            f2 = depth_to_space(f2s, ch)
            if ph or pw:
                f2 = f2[:, ph // 2:, pw // 2:]
            return f2
        u2 = up(f3, cfg.conv2[1], "upconv2")
        f2 = block(jnp.concatenate([c2, u2], axis=-1), 1, cfg.conv1[1],
                   name="pyramid_fusion2")
        if cfg.decode_stride == 2:
            # stride-2 output: full-res conv layers are layout-bound on
            # TPU; downstream ROI ops take normalized coords, and the
            # 1-ch RPN bottleneck is upsampled back to full res
            if ph or pw:
                f2 = f2[:, ph // 2:, pw // 2:]
            return f2
        u1 = up(f2, cfg.conv1[1], "upconv1")
        f1 = block(jnp.concatenate([c1, u1], axis=-1), 1, cfg.conv1[1],
                   name="pyramid_fusion1")

        if ph or pw:
            f1 = f1[:, ph:, pw:]
        return f1


def preprocess_image(image: jnp.ndarray) -> jnp.ndarray:
    """Subtract KITTI channel means (reference
    img_feature_extractor._mean_image_subtraction).

    Always computes in float32: batches ship images as uint8 (4x
    smaller host->device copy) and uint8 subtraction would wrap
    modulo 256 for every pixel darker than the channel mean."""
    img = image.astype(jnp.float32)
    return img - jnp.asarray(KITTI_IMAGE_MEANS, jnp.float32)


def pad_rows_for_stride(height: int, stride: int = 8) -> int:
    """Rows to prepend so height divides the total pool stride
    (reference pads BEV 700 -> 704, bev_vgg_pyramid.py:59)."""
    rem = height % stride
    return 0 if rem == 0 else stride - rem
