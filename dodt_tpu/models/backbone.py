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

from dodt_tpu.config import FeatureExtractorConfig

KITTI_IMAGE_MEANS = (92.8403, 97.7996, 93.5843)  # img_feature_extractor.py:8


def _norm(ch: int, dtype, kind: str = "none"):
    if kind == "gn":
        return nn.GroupNorm(num_groups=min(8, ch), dtype=dtype)
    return lambda x: x


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
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = x.astype(self.dtype)
        ph = (-x.shape[1]) % 8
        pw = (-x.shape[2]) % 8
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, 0), (pw, 0), (0, 0)))

        def block(h, num, ch, name):
            for i in range(num):
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"{name}_{i}")(h)
                h = _norm(ch, self.dtype, cfg.norm)(h)
                h = nn.relu(h)
            return h

        def pool(h):
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        c1 = block(x, *cfg.conv1, name="conv1")
        c2 = block(pool(c1), *cfg.conv2, name="conv2")
        c3 = block(pool(c2), *cfg.conv3, name="conv3")
        c4 = block(pool(c3), *cfg.conv4, name="conv4")

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
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name=name)(h)
            h = _norm(ch, self.dtype, cfg.norm)(h)
            return nn.relu(h)

        u3 = up(c4, cfg.conv3[1], "upconv3")
        f3 = block(jnp.concatenate([c3, u3], axis=-1), 1, cfg.conv2[1],
                   name="pyramid_fusion3")
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
    img_feature_extractor._mean_image_subtraction)."""
    means = jnp.asarray(KITTI_IMAGE_MEANS, image.dtype)
    return image - means


def pad_rows_for_stride(height: int, stride: int = 8) -> int:
    """Rows to prepend so height divides the total pool stride
    (reference pads BEV 700 -> 704, bev_vgg_pyramid.py:59)."""
    rem = height % stride
    return 0 if rem == 0 else stride - rem
