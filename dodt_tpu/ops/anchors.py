"""Grid anchor generation and occupancy-based filtering (pure JAX).

Parity targets: reference grid_anchor_3d_generator.tile_anchors_3d
(anchor_generators/grid_anchor_3d_generator.py:39) and
anchor_filter.get_empty_anchor_filter_2d (anchor_filter.py:65).

TPU design: the anchor grid is STATIC for a given config (the reference
regenerates it per sample only because the ground plane shifts anchor
y values — here the grid xz layout is precomputed once and y is applied
on-device from the per-sample ground plane). Empty-anchor filtering
returns a boolean mask (fixed shape) instead of a gathered subset.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def grid_anchor_xz(area_extents: np.ndarray, anchor_stride) -> np.ndarray:
    """Static xz anchor center grid.

    Matches reference tile_anchors_3d meshgrid ordering: x centers start
    at x_min + stride/2 ascending; z centers start at z_max - stride/2
    descending; meshgrid(x, z) ordering means z varies slowest... The
    reference stacks np.meshgrid(x_centers, z_centers, sizes, rots) and
    reshapes, producing iteration order (z, x, size, rot).

    Returns:
      (N, 2) array of [x, z] centers replicated per (size, rotation) in
      the order (z, x, size, rot) -- caller tiles sizes/rotations.
    """
    sx, sz = float(anchor_stride[0]), float(anchor_stride[1])
    x_centers = np.arange(area_extents[0][0] + sx / 2.0,
                          area_extents[0][1], sx, dtype=np.float32)
    z_centers = np.arange(area_extents[2][1] - sz / 2.0,
                          area_extents[2][0], -sz, dtype=np.float32)
    zz, xx = np.meshgrid(z_centers, x_centers, indexing='ij')
    return np.stack([xx.ravel(), zz.ravel()], axis=1)


def tile_anchors_3d(area_extents, anchor_sizes, anchor_stride,
                    ground_plane) -> jnp.ndarray:
    """Generate the full anchor set in box_3d form (N, 7).

    Iteration order matches the reference: for each (z, x) cell, for each
    size, for each rotation in (0, pi/2). y is snapped to the ground
    plane at (x, z).

    Args:
      area_extents: (3, 2) [[x_min, x_max], [y...], [z_min, z_max]].
      anchor_sizes: (S, 3) [l, w, h] cluster sizes.
      anchor_stride: (2,) [x_stride, z_stride].
      ground_plane: (4,) plane coefficients (may be traced).
    """
    xz = jnp.asarray(grid_anchor_xz(np.asarray(area_extents), anchor_stride))
    sizes = jnp.asarray(anchor_sizes, jnp.float32).reshape(-1, 3)
    n_cells = xz.shape[0]
    n_sizes = sizes.shape[0]
    rotations = jnp.asarray([0.0, np.pi / 2.0], jnp.float32)

    # (cells, sizes, rots, ...)
    x = jnp.broadcast_to(xz[:, 0, None, None], (n_cells, n_sizes, 2))
    z = jnp.broadcast_to(xz[:, 1, None, None], (n_cells, n_sizes, 2))
    lwh = jnp.broadcast_to(sizes[None, :, None, :], (n_cells, n_sizes, 2, 3))
    ry = jnp.broadcast_to(rotations[None, None, :], (n_cells, n_sizes, 2))

    gp = jnp.asarray(ground_plane, jnp.float32)
    y = -(gp[0] * x + gp[2] * z + gp[3]) / gp[1]

    boxes = jnp.concatenate([
        x[..., None], y[..., None], z[..., None],
        lwh, ry[..., None]], axis=-1)
    return boxes.reshape(-1, 7)


def bev_occupancy_counts(integral_2d: jnp.ndarray,
                         anchors: jnp.ndarray,
                         bev_extents,
                         voxel_size: float) -> jnp.ndarray:
    """Occupied-cell counts inside each anchor footprint via a 2D
    integral image over the native (x, z) occupancy grid.

    Args:
      integral_2d: (X+1, Z+1) zero-padded prefix-sum of the 0/1 BEV
        occupancy grid indexed [x_cell, z_cell] (unflipped layout).
      anchors: (N, 6) anchor format.
      bev_extents: [[x_min, x_max], [z_min, z_max]].
      voxel_size: grid resolution in meters.

    Returns:
      (N,) float counts of occupied cells under the footprint
      (reference anchor_filter.get_empty_anchor_filter_2d:65 counts
      occupied cells of the sliced voxel grid, not raw points).
    """
    nx = integral_2d.shape[0] - 1
    nz = integral_2d.shape[1] - 1
    bev_extents = jnp.asarray(bev_extents, jnp.float32)
    x = anchors[:, 0]
    z = anchors[:, 2]
    half_x = anchors[:, 3] / 2.0
    half_z = anchors[:, 5] / 2.0
    # Cell index of each corner (floor; the reference map_to_index
    # int-casts, identical on the in-range positive values and cleaner
    # on out-of-range negatives, which both paths then clip anyway).
    x1 = jnp.floor((x - half_x - bev_extents[0, 0]) / voxel_size
                   ).astype(jnp.int32)
    x2 = jnp.floor((x + half_x - bev_extents[0, 0]) / voxel_size
                   ).astype(jnp.int32)
    z1 = jnp.floor((z - half_z - bev_extents[1, 0]) / voxel_size
                   ).astype(jnp.int32)
    z2 = jnp.floor((z + half_z - bev_extents[1, 0]) / voxel_size
                   ).astype(jnp.int32)
    x1 = jnp.clip(x1, 0, nx - 1)
    z1 = jnp.clip(z1, 0, nz - 1)
    x2 = jnp.clip(x2, 0, nx - 1) + 1  # inclusive upper cell
    z2 = jnp.clip(z2, 0, nz - 1) + 1
    return (integral_2d[x2, z2] - integral_2d[x1, z2]
            - integral_2d[x2, z1] + integral_2d[x1, z1])


def empty_anchor_mask(integral_2d: jnp.ndarray, anchors: jnp.ndarray,
                      bev_extents, voxel_size: float,
                      density_threshold: int = 1) -> jnp.ndarray:
    """Boolean mask of anchors covering >= density_threshold occupied
    cells.

    TPU-native replacement for the reference C++ integral-image filter
    (anchor_filter.py:65 + libintegral_images_3d): a mask, not a gather,
    so downstream shapes stay static.
    """
    counts = bev_occupancy_counts(integral_2d, anchors, bev_extents,
                                  voxel_size)
    return counts >= density_threshold


def integral_image_2d(grid: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H+1, W+1) zero-padded 2D prefix sum.

    Computed as L @ grid @ U with triangular ones matrices: on TPU the
    lane-axis cumsum lowers to a slow serial/reduce-window form
    (~1.8 ms on a 704x800 grid), while the matmul form runs on the MXU
    in tens of microseconds. Precision HIGHEST keeps f32 accumulation
    exact for integer occupancy counts (< 2^24), which matters because
    integral queries difference large corner values.
    """
    h, w = grid.shape
    lo = jnp.tril(jnp.ones((h, h), grid.dtype))
    up = jnp.triu(jnp.ones((w, w), grid.dtype))
    c = jnp.dot(jnp.dot(lo, grid, precision=jax.lax.Precision.HIGHEST),
                up, precision=jax.lax.Precision.HIGHEST)
    return jnp.pad(c, ((1, 0), (1, 0)))


def integral_image_3d(grid: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z) -> (X+1, Y+1, Z+1) prefix sum (replaces the reference
    C++ integral_images_3d.cpp:22-66; query by 8-corner gather)."""
    c = jnp.cumsum(jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1), axis=2)
    return jnp.pad(c, ((1, 0), (1, 0), (1, 0)))


def query_integral_3d(integral: jnp.ndarray, lo: jnp.ndarray,
                      hi: jnp.ndarray) -> jnp.ndarray:
    """Box sums over [lo, hi) for N boxes; lo/hi (N, 3) int indices."""
    x1, y1, z1 = lo[:, 0], lo[:, 1], lo[:, 2]
    x2, y2, z2 = hi[:, 0], hi[:, 1], hi[:, 2]
    s = integral
    return (s[x2, y2, z2] - s[x1, y2, z2] - s[x2, y1, z2] - s[x2, y2, z1]
            + s[x1, y1, z2] + s[x1, y2, z1] + s[x2, y1, z1]
            - s[x1, y1, z1])
