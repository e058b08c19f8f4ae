"""Projection of anchors/boxes into BEV and image space (pure JAX).

Parity targets: reference avod/core/anchor_projector.py (project_to_bev:13,
project_to_image_space:72, tf_project_to_image_space:159,
reorder_projected_boxes:254).
"""
from __future__ import annotations

import jax.numpy as jnp

from dodt_tpu.ops import boxes as box_ops


def project_to_bev(anchors: jnp.ndarray, bev_extents: jnp.ndarray):
    """Project anchors (..., 6) into BEV pixel-normalized boxes.

    Args:
      anchors: (..., 6) [x, y, z, dim_x, dim_y, dim_z].
      bev_extents: (2, 2) [[x_min, x_max], [z_min, z_max]].

    Returns:
      (bev_box_corners, bev_box_corners_norm): (..., 4) [x1, z1, x2, z2]
      with origin at the top-left (z flipped), norm in [0, 1].
    """
    bev_extents = jnp.asarray(bev_extents, jnp.float32)
    x = anchors[..., 0]
    z = anchors[..., 2]
    half_x = anchors[..., 3] / 2.0
    half_z = anchors[..., 5] / 2.0

    x_min, x_max = bev_extents[0, 0], bev_extents[0, 1]
    z_min, z_max = bev_extents[1, 0], bev_extents[1, 1]

    x1 = x - half_x - x_min
    x2 = x + half_x - x_min
    # Flip z: origin moves from bottom-left to top-left of the BEV image.
    z1 = z_max - (z + half_z) - z_min
    z2 = z_max - (z - half_z) - z_min
    corners = jnp.stack([x1, z1, x2, z2], axis=-1)
    ranges = jnp.stack([x_max - x_min, z_max - z_min,
                        x_max - x_min, z_max - z_min])
    return corners, corners / ranges


def project_to_image_space(anchors: jnp.ndarray, p2: jnp.ndarray,
                           image_shape) -> tuple:
    """Project anchor cuboids into image space axis-aligned boxes.

    Args:
      anchors: (..., 6) [x, y, z, dim_x, dim_y, dim_z] (camera frame,
        y = bottom face).
      p2: (3, 4) camera projection matrix.
      image_shape: (h, w) static ints or array.

    Returns:
      (box_corners, box_corners_norm): (..., 4) [x1, y1, x2, y2].
    """
    x, y, z = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    hx = anchors[..., 3] / 2.0
    dy = anchors[..., 4]
    hz = anchors[..., 5] / 2.0

    # 8 corners (..., 8)
    xc = jnp.stack([x + hx, x + hx, x - hx, x - hx,
                    x + hx, x + hx, x - hx, x - hx], axis=-1)
    yc = jnp.stack([y, y, y, y, y - dy, y - dy, y - dy, y - dy], axis=-1)
    zc = jnp.stack([z + hz, z - hz, z - hz, z + hz,
                    z + hz, z - hz, z - hz, z + hz], axis=-1)

    pts = jnp.stack([xc, yc, zc, jnp.ones_like(xc)], axis=-2)  # (..., 4, 8)
    proj = jnp.einsum('ij,...jk->...ik', jnp.asarray(p2, jnp.float32), pts)
    u = proj[..., 0, :] / proj[..., 2, :]
    v = proj[..., 1, :] / proj[..., 2, :]

    x1 = jnp.min(u, axis=-1)
    x2 = jnp.max(u, axis=-1)
    y1 = jnp.min(v, axis=-1)
    y2 = jnp.max(v, axis=-1)

    h = jnp.float32(image_shape[0])
    w = jnp.float32(image_shape[1])
    # Clip to image bounds (reference tf_project_to_image_space clips for
    # ROI pooling stability).
    x1 = jnp.clip(x1, 0.0, w)
    x2 = jnp.clip(x2, 0.0, w)
    y1 = jnp.clip(y1, 0.0, h)
    y2 = jnp.clip(y2, 0.0, h)
    corners = jnp.stack([x1, y1, x2, y2], axis=-1)
    norm = corners / jnp.stack([w, h, w, h])
    return corners, norm


def reorder_boxes_yx(boxes_xy: jnp.ndarray) -> jnp.ndarray:
    """[x1, y1, x2, y2] -> [y1, x1, y2, x2] (crop-and-resize convention,
    reference anchor_projector.py:254)."""
    return boxes_xy[..., jnp.array([1, 0, 3, 2])]


def project_points_to_image(points: jnp.ndarray, p2: jnp.ndarray
                            ) -> jnp.ndarray:
    """Project 3D camera-frame points (..., 3) to image pixels (..., 2)."""
    ones = jnp.ones_like(points[..., :1])
    pts_h = jnp.concatenate([points, ones], axis=-1)
    proj = jnp.einsum('ij,...j->...i', jnp.asarray(p2, jnp.float32), pts_h)
    return proj[..., 0:2] / proj[..., 2:3]
