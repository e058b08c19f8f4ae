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


def _phase_view(fm: jnp.ndarray, p: int, pad_lo: int, pad_hi: int
                ) -> jnp.ndarray:
    """Edge-pad (H, W, C) by whole periods and transpose to phase-major
    (p, p, H'/p, W'/p, C) so any static (phase, block-shift) tap is a
    contiguous slice."""
    h, w, c = fm.shape
    fmp = jnp.pad(fm, ((pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)),
                  mode="edge")
    hp, wp = h + pad_lo + pad_hi, w + pad_lo + pad_hi
    v = fmp.reshape(hp // p, p, wp // p, p, c)
    return jnp.transpose(v, (1, 3, 0, 2, 4))


def _tap(view: jnp.ndarray, p: int, pad_blocks: int, off_y: int,
         off_x: int, nz: int, nx: int) -> jnp.ndarray:
    """Value at lattice positions (p*iz + off_y, p*ix + off_x) for all
    (iz, ix): one static slice of the phase view."""
    ay, by = divmod(off_y + pad_blocks * p, p)
    ax, bx = divmod(off_x + pad_blocks * p, p)
    return view[by, bx, ay:ay + nz, ax:ax + nx]


def dense_bev_rois(fm: jnp.ndarray, lat: BevLattice) -> jnp.ndarray:
    """All-anchor BEV ROI crops without gathers.

    Args:
      fm: (H, W, C) BEV bottleneck feature map.
    Returns:
      (nz * nx * n_cfg, S, S, C) crops, flat index ordered
      (iz, ix, cfg) to match tile_anchors_3d anchor ordering.
    """
    p = lat.period
    s = lat.crop_size
    max_off = max(int(np.max(np.abs(lat.row_off))) + 1,
                  int(np.max(np.abs(lat.col_off))) + 1)
    pad_blocks = -(-max_off // p)
    pad = pad_blocks * p
    view = _phase_view(fm, p, pad, pad + p)   # extra block for +1 taps

    cfg_maps = []
    for c in range(lat.n_cfg):
        rows = []
        for i in range(s):
            oy = int(lat.row_off[c, i])
            fy = float(lat.row_frac[c, i])
            cols = []
            for j in range(s):
                ox = int(lat.col_off[c, j])
                fx = float(lat.col_frac[c, j])
                tl = _tap(view, p, pad_blocks, oy, ox, lat.nz, lat.nx)
                tr = _tap(view, p, pad_blocks, oy, ox + 1, lat.nz,
                          lat.nx)
                bl = _tap(view, p, pad_blocks, oy + 1, ox, lat.nz,
                          lat.nx)
                br = _tap(view, p, pad_blocks, oy + 1, ox + 1, lat.nz,
                          lat.nx)
                top = tl + (tr - tl) * fx
                bot = bl + (br - bl) * fx
                cols.append(top + (bot - top) * fy)   # (nz, nx, C)
            rows.append(jnp.stack(cols, axis=2))      # (nz, nx, S, C)
        cfg_maps.append(jnp.stack(rows, axis=2))      # (nz, nx, S, S, C)
    out = jnp.stack(cfg_maps, axis=2)         # (nz, nx, n_cfg, S, S, C)
    return out.reshape((lat.nz * lat.nx * lat.n_cfg, s, s,
                        fm.shape[-1]))


def dense_occupancy_counts(integral_2d: jnp.ndarray, lat: BevLattice
                           ) -> jnp.ndarray:
    """Dense twin of anchors.bev_occupancy_counts over the lattice.

    Corner-cell indices are clipped to [0, ncells-1] (hi corners +1
    after the clip); clipping on the monotone integral image is
    reproduced by edge-replicated padding of the phase view.

    Args:
      integral_2d: (X+1, Z+1) zero-padded prefix sum indexed
        [x_cell, z_cell] (unflipped).
    Returns:
      (nz * nx * n_cfg,) counts in anchor order (iz, ix, cfg).
    """
    p = lat.period
    nxc = integral_2d.shape[0] - 1
    nzc = integral_2d.shape[1] - 1

    max_off = int(max(np.max(np.abs(lat.mask_x_off)),
                      np.max(np.abs(lat.mask_z_off)))) + p + 1
    pad_blocks = -(-max_off // p)
    pad = pad_blocks * p

    # Pad the (nxc+1, nzc+1) integral so that dims are multiples of p
    # and any tap offset lands inside; edge mode == index clipping.
    hx = nxc + 1 + 2 * pad
    hz = nzc + 1 + 2 * pad
    ex = (-hx) % p
    ez = (-hz) % p
    v = jnp.pad(integral_2d, ((pad, pad + ex), (pad, pad + ez)),
                mode="edge")
    view = jnp.transpose(
        v.reshape(v.shape[0] // p, p, v.shape[1] // p, p), (1, 3, 0, 2))

    def tap(off_x: int, off_z: int) -> jnp.ndarray:
        """integral[clip(p*ix + off_x), clip(p*jz + off_z)] for all
        (ix, jz); result returned in (iz, ix) order (jz flipped)."""
        ax, bx = divmod(int(off_x) + pad, p)
        az, bz = divmod(int(off_z) + pad, p)
        assert 0 <= ax and ax + lat.nx <= view.shape[2], (ax, off_x)
        assert 0 <= az and az + lat.nz <= view.shape[3], (az, off_z)
        sl = view[bx, bz, ax:ax + lat.nx, az:az + lat.nz]  # (ix, jz)
        return jnp.transpose(sl[:, ::-1])                  # (iz, ix)

    outs = []
    for c in range(lat.n_cfg):
        x1 = lat.mask_x_off[c, 0]
        x2 = lat.mask_x_off[c, 1] + 1
        z1 = lat.mask_z_off[c, 0]
        z2 = lat.mask_z_off[c, 1] + 1
        s22 = tap(x2, z2)
        s12 = tap(x1, z2)
        s21 = tap(x2, z1)
        s11 = tap(x1, z1)
        outs.append(s22 - s12 - s21 + s11)       # (iz, ix)
    counts = jnp.stack(outs, axis=-1)            # (nz, nx, n_cfg)
    return counts.reshape(-1)


def dense_empty_anchor_mask(integral_2d: jnp.ndarray, lat: BevLattice,
                            density_threshold: int = 1) -> jnp.ndarray:
    return dense_occupancy_counts(integral_2d, lat) >= density_threshold
