"""Dense (gather-free) RPN feature extraction over the regular anchor
grid.

The reference scores ~90k anchors by per-anchor crop_and_resize of the
BEV bottleneck (rpn_model.py:320-350). On TPU the per-element gather
rate makes that the single most expensive op in the whole network
(~40 ms per frame per modality at production shapes). But the anchor
grid is REGULAR: centers sit at stride/voxel-pixel intervals and every
anchor of a given (size, rotation) config projects to a BEV box of the
same pixel dimensions. Under the half-pixel crop convention
(ops/roi.py) each of the S x S sample points of each config therefore
lives on an exact `p`-pixel lattice: sample(iz, ix) = (p*iz + cy,
p*ix + cx) with STATIC fractional offsets (cy, cx).

So the whole all-anchor ROI extraction becomes, per config and sample
point, four static phase slices of a phase-transposed feature map and
a static-weight bilinear combine — zero gathers, pure contiguous
vector work. The anchor occupancy filter (anchor_filter.py:65 +
integral_images_3d.cpp) is densified the same way over the integral
image.

Edge behavior: out-of-range samples clamp to the map edge, reproduced
exactly by edge-replicated padding (bilinear over replicated edge
values == clamp).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BevLattice:
    """Static sampling geometry of the regular anchor grid.

    nz, nx: anchor grid cells (rows = z, cols = x).
    period: lattice period in feature-map pixels (= stride / voxel).
    row_off/col_off: (n_cfg, S) int floor offsets of each sample point
      relative to the p*i lattice origin (may be negative).
    row_frac/col_frac: (n_cfg, S) static bilinear fractions.
    mask_x_off/mask_z_off: (n_cfg, 2) int corner-cell offsets of each
      config's footprint in the (unflipped) occupancy grid, for the
      dense integral-image query.
    """
    nz: int
    nx: int
    period: int
    row_off: np.ndarray
    row_frac: np.ndarray
    col_off: np.ndarray
    col_frac: np.ndarray
    mask_x_off: np.ndarray
    mask_z_off: np.ndarray
    n_cfg: int
    crop_size: int


def _config_dims(anchor_sizes) -> np.ndarray:
    """Per-config BEV half-dims (halfx, halfz), configs ordered
    (size, rotation) to match tile_anchors_3d. Uses the same float32
    cos/sin arithmetic as box_3d_to_anchor so offsets agree bitwise."""
    sizes = np.asarray(anchor_sizes, np.float32).reshape(-1, 3)
    out = []
    for l, w, _h in sizes:
        for ry in (np.float32(0.0), np.float32(np.pi / 2.0)):
            cos_ry = np.abs(np.cos(ry, dtype=np.float32))
            sin_ry = np.abs(np.sin(ry, dtype=np.float32))
            dim_x = l * cos_ry + w * sin_ry
            dim_z = w * cos_ry + l * sin_ry
            out.append((dim_x / 2.0, dim_z / 2.0))
    return np.asarray(out, np.float32)          # (n_cfg, 2)


def build_bev_lattice(area_extents, anchor_stride, anchor_sizes,
                      bev_shape: Tuple[int, int], voxel_size: float,
                      crop_size: int) -> Optional[BevLattice]:
    """Build the static lattice, or None if the geometry is not an
    exact pixel lattice (caller falls back to the gather path)."""
    area = np.asarray(area_extents, np.float64)
    sx, sz = float(anchor_stride[0]), float(anchor_stride[1])
    h, w = bev_shape                       # rows = z (flipped), cols = x
    x_extent = area[0][1] - area[0][0]
    z_extent = area[2][1] - area[2][0]

    # pixel periods must be exact integers and the map must cover the
    # extents exactly at voxel resolution
    px = sx / voxel_size
    pz = sz / voxel_size
    if abs(px - round(px)) > 1e-9 or abs(pz - round(pz)) > 1e-9:
        return None
    if round(px) != round(pz):
        return None
    if abs(w * voxel_size - x_extent) > 1e-9:
        return None
    if abs(h * voxel_size - z_extent) > 1e-9:
        return None
    p = int(round(px))

    nx = int(np.ceil((x_extent - sx / 2.0) / sx))
    nz = int(np.ceil((z_extent - sz / 2.0) / sz))

    dims = _config_dims(anchor_sizes)             # (n_cfg, 2) halves
    n_cfg = dims.shape[0]
    s = crop_size
    grid = (np.arange(s, dtype=np.float32) / (s - 1) if s > 1
            else np.asarray([0.5], np.float32))

    # Column (x) sample positions: anchor center x_c = x_min + sx/2 +
    # sx*ix; box [x_c - halfx, x_c + halfx] normalized by x_extent,
    # pixel = norm * W - 0.5  ->  p*ix + cx(cfg, j).
    # Row (z): center z_c = z_max - sz/2 - sz*iz; flipped-z box row1 =
    # (z_max - z_c - halfz) -> pixel = p*iz + cy(cfg, i).
    row_off = np.zeros((n_cfg, s), np.int64)
    row_frac = np.zeros((n_cfg, s), np.float32)
    col_off = np.zeros((n_cfg, s), np.int64)
    col_frac = np.zeros((n_cfg, s), np.float32)
    for c in range(n_cfg):
        halfx, halfz = float(dims[c, 0]), float(dims[c, 1])
        for k in range(s):
            g = float(grid[k]) if s > 1 else 0.5
            # column: (sx/2 - halfx + 2*halfx*g) meters from lattice pt
            cx = (sx / 2.0 - halfx + 2.0 * halfx * g) / voxel_size - 0.5
            # row: (sz/2 - halfz + 2*halfz*g) meters
            cy = (sz / 2.0 - halfz + 2.0 * halfz * g) / voxel_size - 0.5
            col_off[c, k] = int(np.floor(cx))
            col_frac[c, k] = np.float32(cx - np.floor(cx))
            row_off[c, k] = int(np.floor(cy))
            row_frac[c, k] = np.float32(cy - np.floor(cy))

    # occupancy-filter corner cells (bev_occupancy_counts semantics,
    # floor): x corner cells = p*ix + a, z corner cells = p*jz + b with
    # jz = nz-1-iz (the z grid descends from z_max).
    #   x1_cell = floor((sx/2 - halfx)/voxel) + p*ix
    #   z1_cell = floor((z_extent - sz/2 - halfz)/voxel - p*(nz-1))
    #             + p*jz
    mask_x_off = np.zeros((n_cfg, 2), np.int64)
    mask_z_off = np.zeros((n_cfg, 2), np.int64)
    for c in range(n_cfg):
        halfx, halfz = float(dims[c, 0]), float(dims[c, 1])
        mask_x_off[c, 0] = int(np.floor((sx / 2.0 - halfx) / voxel_size))
        mask_x_off[c, 1] = int(np.floor((sx / 2.0 + halfx) / voxel_size))
        zbase = (z_extent - sz / 2.0) / voxel_size - p * (nz - 1)
        mask_z_off[c, 0] = int(np.floor(zbase - halfz / voxel_size))
        mask_z_off[c, 1] = int(np.floor(zbase + halfz / voxel_size))

    return BevLattice(nz=nz, nx=nx, period=p, row_off=row_off,
                      row_frac=row_frac, col_off=col_off,
                      col_frac=col_frac, mask_x_off=mask_x_off,
                      mask_z_off=mask_z_off, n_cfg=n_cfg, crop_size=s)


def dense_bev_rois(fm: jnp.ndarray, lat: BevLattice) -> jnp.ndarray:
    """All-anchor BEV ROI crops without gathers.

    Separable formulation: bilinear sampling factors into a row pass
    (sublane-strided slices + lerp, one per (config, i)) followed by a
    column pass on the swapaxed intermediates — n_cfg*S strided slices
    per axis instead of an (expensive on TPU) 5x5 phase-transpose
    relayout of the whole map.

    Args:
      fm: (H, W, C) BEV bottleneck feature map.
    Returns:
      (nz * nx * n_cfg, S, S, C) crops, flat index ordered
      (iz, ix, cfg) to match tile_anchors_3d anchor ordering.
    """
    p = lat.period
    s = lat.crop_size
    nz, nx, n_cfg = lat.nz, lat.nx, lat.n_cfg
    c_ch = fm.shape[-1]
    max_off = max(int(np.max(np.abs(lat.row_off))) + 1,
                  int(np.max(np.abs(lat.col_off))) + 1)
    pad = (-(-max_off // p)) * p
    fmp = jnp.pad(fm, ((pad, pad + p), (pad, pad + p), (0, 0)),
                  mode="edge")

    # row pass: (n_cfg*s) x (nz, Wp, C)
    rows = []
    for c in range(n_cfg):
        for i in range(s):
            oy = int(lat.row_off[c, i]) + pad
            fy = float(lat.row_frac[c, i])
            r0 = fmp[oy:oy + p * nz:p]
            r1 = fmp[oy + 1:oy + 1 + p * nz:p]
            rows.append(r0 + (r1 - r0) * fy)
    rt = jnp.swapaxes(jnp.stack(rows), 1, 2)    # (n_cfg*s, Wp, nz, C)

    # column pass: (n_cfg, s, s) x (nx, nz, C)
    outs = []
    for c in range(n_cfg):
        for i in range(s):
            ri = rt[c * s + i]
            for j in range(s):
                ox = int(lat.col_off[c, j]) + pad
                fx = float(lat.col_frac[c, j])
                c0 = ri[ox:ox + p * nx:p]
                c1 = ri[ox + 1:ox + 1 + p * nx:p]
                outs.append(c0 + (c1 - c0) * fx)
    out = jnp.stack(outs)                       # (n_cfg*s*s, nx, nz, C)
    out = out.reshape(n_cfg, s, s, nx, nz, c_ch)
    out = jnp.transpose(out, (4, 3, 0, 1, 2, 5))  # (nz,nx,cfg,s,s,C)
    return out.reshape((nz * nx * n_cfg, s, s, c_ch))


def dense_occupancy_counts(integral_2d: jnp.ndarray, lat: BevLattice
                           ) -> jnp.ndarray:
    """Dense twin of anchors.bev_occupancy_counts over the lattice.

    Corner-cell indices are clipped to [0, ncells-1] (hi corners +1
    after the clip); clipping on the monotone integral image is
    reproduced by edge-replicated padding of the phase view.

    TPU formulation: the four-corner tap pattern
      s22 - s12 - s21 + s11, with s_ij = integral[p*ix + x_i, p*jz+z_j]
    factors into two one-hot DIFFERENCE matmuls per config,
      counts = (Rx2 - Rx1) @ v @ (Sz2 - Sz1),
    putting the whole filter on the MXU. The previous lane-strided
    slice taps cost ~3 ms per frame at production shapes (stride-5 lane
    access is a relayout on TPU); the matmul form is tens of µs.
    Precision HIGHEST keeps the up-to-560k integer counts exact in the
    f32 contraction (< 2^24).

    Args:
      integral_2d: (X+1, Z+1) zero-padded prefix sum indexed
        [x_cell, z_cell] (unflipped).
    Returns:
      (nz * nx * n_cfg,) counts in anchor order (iz, ix, cfg).
    """
    p = lat.period

    max_off = int(max(np.max(np.abs(lat.mask_x_off)),
                      np.max(np.abs(lat.mask_z_off)))) + p + 1
    pad = (-(-max_off // p)) * p

    # Edge-replicated padding == index clipping on the monotone
    # integral image.
    v = jnp.pad(integral_2d, ((pad, pad + p), (pad, pad + p)),
                mode="edge")
    xp, zp = int(v.shape[0]), int(v.shape[1])

    ix = np.arange(lat.nx) * p
    jz = np.arange(lat.nz) * p
    outs = []
    for c in range(lat.n_cfg):
        x1 = int(lat.mask_x_off[c, 0]) + pad
        x2 = int(lat.mask_x_off[c, 1]) + 1 + pad
        z1 = int(lat.mask_z_off[c, 0]) + pad
        z2 = int(lat.mask_z_off[c, 1]) + 1 + pad
        dr = np.zeros((lat.nx, xp), np.float32)          # (ix, X)
        dr[np.arange(lat.nx), ix + x2] += 1.0
        dr[np.arange(lat.nx), ix + x1] -= 1.0
        # columns emitted directly in flipped (iz) order: iz = nz-1-jz
        dc = np.zeros((zp, lat.nz), np.float32)          # (Z, iz)
        dc[jz + z2, lat.nz - 1 - np.arange(lat.nz)] += 1.0
        dc[jz + z1, lat.nz - 1 - np.arange(lat.nz)] -= 1.0
        m = jnp.dot(jnp.dot(jnp.asarray(dr), v,
                            precision=jax.lax.Precision.HIGHEST),
                    jnp.asarray(dc),
                    precision=jax.lax.Precision.HIGHEST)  # (ix, iz)
        outs.append(jnp.transpose(m))                     # (iz, ix)
    counts = jnp.stack(outs, axis=-1)            # (nz, nx, n_cfg)
    return counts.reshape(-1)


def dense_empty_anchor_mask(integral_2d: jnp.ndarray, lat: BevLattice,
                            density_threshold: int = 1) -> jnp.ndarray:
    return dense_occupancy_counts(integral_2d, lat) >= density_threshold
