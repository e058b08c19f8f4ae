"""Ego-motion BEV feature warping for streaming inference.

The reference aligns frame B into frame A by transforming the raw
point cloud and re-running the towers (kitti_tracking_dataset.py
point_cloud_transform:324-335 + full-pair recompute per step in
run_inference_by_one.py). For streaming reuse of cached features the
TPU-native equivalent is an affine warp of the BEV feature map itself
(the BEV is a metric x/z grid, so ego motion is a 2D rigid transform
of the map) — the standard trick of modern temporal BEV stacks
(e.g. BEVDet4D-style feature alignment). Cost: one bilinear resample
of a (H/2, W/2, C) map instead of a full tower re-encode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bev_pixel_from_xz(x, z, bev_extents, h: int, w: int):
    """Metric (x, z) -> (row, col) pixel coords (half-pixel
    convention, z flipped — matches ops/projection.project_to_bev +
    ops/roi sampling)."""
    x0, x1 = bev_extents[0][0], bev_extents[0][1]
    z0, z1 = bev_extents[1][0], bev_extents[1][1]
    col = (x - x0) / (x1 - x0) * w - 0.5
    row = (z1 - z) / (z1 - z0) * h - 0.5
    return row, col


def _src_grid(h: int, w: int, a2, b2, ae):
    """Source-frame (row, col) sample coordinates of every destination
    pixel under the affine metric map, plus the in-range mask."""
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    # destination pixel centers in metric coords
    x_dst = (cols + 0.5) / w * (ae[0][1] - ae[0][0]) + ae[0][0]
    z_dst = ae[1][1] - (rows + 0.5) / h * (ae[1][1] - ae[1][0])
    xg, zg = jnp.meshgrid(x_dst, z_dst, indexing="xy")   # (H, W)
    x_src = a2[0, 0] * xg + a2[0, 1] * zg + b2[0]
    z_src = a2[1, 0] * xg + a2[1, 1] * zg + b2[1]
    r_src, c_src = bev_pixel_from_xz(x_src, z_src, ae, h, w)
    inside = ((r_src >= 0) & (r_src <= h - 1) &
              (c_src >= 0) & (c_src <= w - 1))
    return r_src, c_src, inside


def warp_bev_features(feats: jnp.ndarray, a2, b2, bev_extents,
                      method: str = "auto") -> jnp.ndarray:
    """Resample a BEV feature map under a 2D affine coordinate map.

    Args:
      feats: (H, W, C) feature map of the SOURCE frame.
      a2, b2: (2, 2) and (2,) such that the source-frame metric
        coordinates of an output location are
        [x_src, z_src] = a2 @ [x_dst, z_dst] + b2.
      bev_extents: [[x_min, x_max], [z_min, z_max]].
      method: "gather4" — four f32 corner gathers (the reference
        formulation); "packed" — ONE gather of a 4C neighbor-packed
        map in bf16 (TPU gathers are descriptor-bound: one gather row
        per output element beats four at 2.1x, and the payload dtype
        matches the towers' bf16 compute — measured
        results_r04/warp_forms.json, 4.86 -> 2.29 ms at 352x400x64);
        "auto" — packed on TPU, gather4 elsewhere. packed==gather4
        exactly at f32; the shipped bf16 payload differs at bf16
        resolution (AP/MOTA equality pinned by benchmarks/ab_warp.py).

    Returns:
      (H, W, C) map in the destination frame; out-of-range samples are
      zero (no data there).
    """
    if method == "auto":
        method = ("packed" if jax.default_backend() == "tpu"
                  else "gather4")
    h, w, c = feats.shape
    ae = np.asarray(bev_extents, np.float32)
    a2 = jnp.asarray(a2, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    r_src, c_src, inside = _src_grid(h, w, a2, b2, ae)
    r = jnp.clip(r_src, 0.0, h - 1)
    cc = jnp.clip(c_src, 0.0, w - 1)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(cc).astype(jnp.int32)

    if method == "packed":
        dt = jnp.bfloat16
        f = feats.astype(dt)
        # neighbor-packed map: nb[r, c] = (f[r,c], f[r,c+1],
        # f[r+1,c], f[r+1,c+1]) — built with two shifted zero-pads
        # (fused elementwise copies), so the bilinear needs exactly
        # one gather row per output element
        fr_ = jnp.concatenate([f[:, 1:], jnp.zeros_like(f[:, :1])], 1)
        top = jnp.concatenate([f, fr_], -1)                 # (H, W, 2C)
        bot = jnp.concatenate([top[1:], jnp.zeros_like(top[:1])], 0)
        nb = jnp.concatenate([top, bot], -1)                # (H, W, 4C)
        fr = (r - r0)[..., None].astype(dt)
        fc = (cc - c0)[..., None].astype(dt)
        g = nb[r0, c0]
        tl, tr = g[..., 0:c], g[..., c:2 * c]
        bl, br = g[..., 2 * c:3 * c], g[..., 3 * c:4 * c]
        # clamp-correct: at the last row/col the packed neighbor is
        # the zero pad, but bilinear with index min(i0+1, n-1) wants
        # the clamped sample (fr/fc are 0 there, but keep it exact)
        edge_c = (c0 == w - 1)[..., None]
        tr = jnp.where(edge_c, tl, tr)
        br = jnp.where(edge_c, bl, br)
        edge_r = (r0 == h - 1)[..., None]
        bl = jnp.where(edge_r, tl, bl)
        br = jnp.where(edge_r, tr, br)
        topv = tl + (tr - tl) * fc
        botv = bl + (br - bl) * fc
        out = topv + (botv - topv) * fr
        return (out * inside[..., None]).astype(feats.dtype)

    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    fr = (r - r0)[..., None]
    fc = (cc - c0)[..., None]
    tl = feats[r0, c0]
    tr = feats[r0, c1]
    bl = feats[r1, c0]
    br = feats[r1, c1]
    top = tl + (tr - tl) * fc
    bot = bl + (br - bl) * fc
    out = top + (bot - top) * fr
    return out * inside[..., None]


def transform_anchors_xz(anchors: jnp.ndarray, a2, b2) -> jnp.ndarray:
    """Move (…, 6) anchors [x, y, z, dx, dy, dz] between frames:
    centers via the affine, footprint dims via the ortho projection of
    the rotated extents (exact under translation, the axis-aligned
    approximation under rotation — same convention as
    box_3d_to_anchor)."""
    a2 = jnp.asarray(a2, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    x = anchors[..., 0]
    z = anchors[..., 2]
    nx = a2[0, 0] * x + a2[0, 1] * z + b2[0]
    nz = a2[1, 0] * x + a2[1, 1] * z + b2[1]
    cos_t = jnp.abs(a2[0, 0])
    sin_t = jnp.abs(a2[0, 1])
    dx = anchors[..., 3]
    dz = anchors[..., 5]
    ndx = dx * cos_t + dz * sin_t
    ndz = dx * sin_t + dz * cos_t
    return jnp.stack([nx, anchors[..., 1], nz, ndx, anchors[..., 4],
                      ndz], axis=-1)
