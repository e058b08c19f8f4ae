"""On-device BEV rasterization (scatter-max/add), jit-able.

TPU-native replacement for the reference's host-side numpy voxelization
(wavedata voxel_grid_2d.py:43, bev_slices.py:33, bev_generator.py:23):
one fused scatter pass over a fixed-capacity padded point cloud builds
all height slices + the density map + the occupancy grid used for
anchor filtering. No lexsort/unique, no per-slice Python loop, no host
round trip; vmap over a batch of frames.

Semantics parity notes:
  * slice membership uses the UNNORMALIZED plane offset a*x+b*y+c*z+d
    (reference get_point_filter:453 builds filters from the raw dot
    product), while the stored height uses the normalized point-to-
    plane distance (voxel_grid_2d.py:104 uses dist_to_plane);
  * per-cell height is the max plane distance over points in the cell
    (the reference takes the first point after a (x, z, y) lexsort =
    min y, which equals max height for any ground plane whose normal is
    y-dominant — true for every KITTI plane);
  * density = min(1, log(N+1)/log(16)) (bev_generator.py:23);
  * map layout: row = flipped z (row 0 = far), col = x (bev_slices
    113-116 transpose + flip).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BevMaps(NamedTuple):
    """Statically shaped BEV outputs."""
    features: jnp.ndarray      # (H, W, num_slices + 1) height slices+density
    occupancy: jnp.ndarray     # (X, Z) 0/1 cell occupancy (native layout)


def bev_maps_from_points(points: jnp.ndarray,
                         valid: jnp.ndarray,
                         ground_plane: jnp.ndarray,
                         area_extents: jnp.ndarray,
                         voxel_size: float,
                         height_lo: float,
                         height_hi: float,
                         num_slices: int) -> BevMaps:
    """Rasterize a padded point cloud into BEV feature maps.

    Args:
      points: (P, 3) camera-frame xyz, padded.
      valid: (P,) bool mask for real points.
      ground_plane: (4,) plane coefficients.
      area_extents: (3, 2) [[x_min, x_max], [y_min, y_max], [z_min, z_max]].
      voxel_size: cell size in meters.
      height_lo/height_hi: slice band above ground plane.
      num_slices: number of height slices.

    Returns:
      BevMaps with features (H, W, num_slices + 1) and occupancy (X, Z),
      where H = round(z_range/vs), W = X = round(x_range/vs),
      Z = H (unflipped z).
    """
    ae = jnp.asarray(area_extents, jnp.float32)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    gp = jnp.asarray(ground_plane, jnp.float32)

    nx = int(round(float(area_extents[0][1] - area_extents[0][0])
                   / voxel_size))
    nz = int(round(float(area_extents[2][1] - area_extents[2][0])
                   / voxel_size))
    div = (height_hi - height_lo) / num_slices

    # Extent filter (strict inequalities, reference get_point_filter:453).
    in_area = ((x > ae[0, 0]) & (x < ae[0, 1]) &
               (y > ae[1, 0]) & (y < ae[1, 1]) &
               (z > ae[2, 0]) & (z < ae[2, 1]) & valid)

    # Raw plane offset for membership; normalized distance for values.
    plane_dot = gp[0] * x + gp[1] * y + gp[2] * z + gp[3]
    dist = plane_dot / jnp.linalg.norm(gp[0:3])

    in_band = in_area & (plane_dot >= height_lo) & (plane_dot < height_hi)

    # Cell coordinates (native layout: x cell, z cell).
    xi = jnp.floor((x - ae[0, 0]) / voxel_size).astype(jnp.int32)
    zi = jnp.floor((z - ae[2, 0]) / voxel_size).astype(jnp.int32)
    xi = jnp.clip(xi, 0, nx - 1)
    zi = jnp.clip(zi, 0, nz - 1)

    # Flipped-row image coordinates.
    row = nz - 1 - zi
    col = xi

    # Slice id from the raw plane offset.
    slice_id = jnp.floor((plane_dot - height_lo) / div).astype(jnp.int32)
    slice_id = jnp.clip(slice_id, 0, num_slices - 1)

    # ---- height slices: one scatter-max over (S, H, W) -----------------
    flat_idx = (slice_id * nz + row) * nx + col
    flat_idx = jnp.where(in_band, flat_idx, num_slices * nz * nx)  # drop
    slice_lo = height_lo + slice_id.astype(jnp.float32) * div
    norm_height = (dist - slice_lo) / div
    heights = jnp.zeros(num_slices * nz * nx, jnp.float32)
    heights = heights.at[flat_idx].max(
        jnp.where(in_band, norm_height, 0.0), mode='drop')
    height_maps = heights.reshape(num_slices, nz, nx)

    # ---- density map over the full band --------------------------------
    cell_idx = row * nx + col
    cell_idx = jnp.where(in_band, cell_idx, nz * nx)
    counts = jnp.zeros(nz * nx, jnp.float32)
    counts = counts.at[cell_idx].add(
        jnp.where(in_band, 1.0, 0.0), mode='drop')
    density = jnp.minimum(1.0, jnp.log(counts + 1.0) / jnp.log(16.0))
    density = jnp.where(counts > 0, density, 0.0).reshape(nz, nx)

    features = jnp.concatenate(
        [jnp.moveaxis(height_maps, 0, -1), density[..., None]], axis=-1)

    # ---- occupancy in native (x, z) layout for anchor filtering --------
    occ_idx = xi * nz + zi
    occ_idx = jnp.where(in_band, occ_idx, nx * nz)
    occ = jnp.zeros(nx * nz, jnp.float32)
    occ = occ.at[occ_idx].max(jnp.where(in_band, 1.0, 0.0), mode='drop')
    occupancy = occ.reshape(nx, nz)

    return BevMaps(features=features, occupancy=occupancy)


def points_in_area_mask(points: jnp.ndarray, valid: jnp.ndarray,
                        ground_plane: jnp.ndarray, area_extents,
                        offset_dist: float = 2.0) -> jnp.ndarray:
    """Reference get_point_filter: inside extents and below the plane
    shifted up by offset_dist (plane_dot < offset_dist)."""
    ae = jnp.asarray(area_extents, jnp.float32)
    gp = jnp.asarray(ground_plane, jnp.float32)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    in_area = ((x > ae[0, 0]) & (x < ae[0, 1]) &
               (y > ae[1, 0]) & (y < ae[1, 1]) &
               (z > ae[2, 0]) & (z < ae[2, 1]))
    plane_dot = gp[0] * x + gp[1] * y + gp[2] * z + gp[3]
    return in_area & (plane_dot < offset_dist) & valid
