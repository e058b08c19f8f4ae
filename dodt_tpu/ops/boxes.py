"""Box representations and codecs (pure JAX, batched).

Representations (all float32, batched leading axes allowed everywhere):

  box_3d : [x, y, z, l, w, h, ry]       camera-frame; y is the BOTTOM face
           (KITTI convention), ry is rotation around the camera y axis.
  anchor : [x, y, z, dim_x, dim_y, dim_z]  axis-aligned cuboid.
  box_4c : [x1..x4, z1..z4, h1, h2]     4 ground-plane corners + 2 heights
           relative to the ground plane (10 values).
  box_8c : (3, 8) corner matrix.

Parity targets (semantics, not code) in the reference:
  avod/core/box_3d_encoder.py, anchor_encoder.py, box_4c_encoder.py,
  box_8c_encoder.py, orientation_encoder.py.
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# box_3d <-> anchor
# ---------------------------------------------------------------------------

def box_3d_to_anchor(boxes_3d: jnp.ndarray, ortho_rotate: bool = False
                     ) -> jnp.ndarray:
    """Convert box_3d (..., 7) to axis-aligned anchor (..., 6).

    The rotated footprint is either projected onto the x/z axes
    (default) or first snapped to the nearest multiple of 90 deg
    (`ortho_rotate=True`).  Matches reference box_3d_encoder.py:85-131.
    """
    x, y, z = boxes_3d[..., 0], boxes_3d[..., 1], boxes_3d[..., 2]
    l, w, h = boxes_3d[..., 3], boxes_3d[..., 4], boxes_3d[..., 5]
    ry = boxes_3d[..., 6]
    if ortho_rotate:
        half_pi = jnp.pi / 2.0
        ry = jnp.round(ry / half_pi) * half_pi
    cos_ry = jnp.abs(jnp.cos(ry))
    sin_ry = jnp.abs(jnp.sin(ry))
    dim_x = l * cos_ry + w * sin_ry
    dim_z = w * cos_ry + l * sin_ry
    return jnp.stack([x, y, z, dim_x, h, dim_z], axis=-1)


def anchors_to_box_3d(anchors: jnp.ndarray, fix_lw: bool = False
                      ) -> jnp.ndarray:
    """Convert anchors (..., 6) back to box_3d (..., 7) with ry=0.

    With `fix_lw`, boxes whose dim_z (width) exceeds dim_x (length) get
    their dims swapped and ry set to -pi/2, so that length >= width.
    Matches reference box_3d_encoder.py:230-320.
    """
    x, y, z = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    dim_x, dim_y, dim_z = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    l, w = dim_x, dim_z
    ry = jnp.zeros_like(x)
    if fix_lw:
        swap = w > l
        l, w = jnp.where(swap, w, l), jnp.where(swap, l, w)
        ry = jnp.where(swap, -jnp.pi / 2.0, ry)
    return jnp.stack([x, y, z, l, w, dim_y, ry], axis=-1)


# ---------------------------------------------------------------------------
# anchor offset codec
# ---------------------------------------------------------------------------

def anchor_to_offset(anchors: jnp.ndarray, gt_anchors: jnp.ndarray
                     ) -> jnp.ndarray:
    """Encode matched GT anchors (..., 6) as normalized offsets (..., 6).

    [dx/dimx, dy/dimy, dz/dimz, log(dimx_gt/dimx), ...]; reference
    anchor_encoder.py:7-98.
    """
    t_xyz = (gt_anchors[..., 0:3] - anchors[..., 0:3]) / anchors[..., 3:6]
    t_dim = jnp.log(gt_anchors[..., 3:6] / anchors[..., 3:6])
    return jnp.concatenate([t_xyz, t_dim], axis=-1)


def offset_to_anchor(anchors: jnp.ndarray, offsets: jnp.ndarray
                     ) -> jnp.ndarray:
    """Decode predicted offsets back into anchors; reference
    anchor_encoder.py:101-150."""
    xyz = offsets[..., 0:3] * anchors[..., 3:6] + anchors[..., 0:3]
    dim = jnp.exp(jnp.log(anchors[..., 3:6]) + offsets[..., 3:6])
    return jnp.concatenate([xyz, dim], axis=-1)


# ---------------------------------------------------------------------------
# orientation codec
# ---------------------------------------------------------------------------

def orientation_to_angle_vector(ry: jnp.ndarray) -> jnp.ndarray:
    """ry (...,) -> unit vector (..., 2); reference orientation_encoder.py:4."""
    return jnp.stack([jnp.cos(ry), jnp.sin(ry)], axis=-1)


def angle_vector_to_orientation(vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) -> ry (...,); reference orientation_encoder.py:20."""
    return jnp.arctan2(vec[..., 1], vec[..., 0])


# ---------------------------------------------------------------------------
# 3D corners
# ---------------------------------------------------------------------------

def box_3d_to_corners(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """box_3d (..., 7) -> corners (..., 3, 8).

    Corner order matches reference obj_utils.compute_box_corners_3d:315:
    bottom face first (x: +,+,-,-; z: +,-,-,+ before rotation), then the
    top face in the same x/z order.
    """
    x, y, z = boxes_3d[..., 0], boxes_3d[..., 1], boxes_3d[..., 2]
    l, w, h = boxes_3d[..., 3], boxes_3d[..., 4], boxes_3d[..., 5]
    ry = boxes_3d[..., 6]

    l2, w2 = l / 2.0, w / 2.0
    # (..., 8)
    x_c = jnp.stack([l2, l2, -l2, -l2, l2, l2, -l2, -l2], axis=-1)
    z_c = jnp.stack([w2, -w2, -w2, w2, w2, -w2, -w2, w2], axis=-1)
    zeros = jnp.zeros_like(l2)
    y_c = jnp.stack([zeros] * 4 + [-h] * 4, axis=-1)

    cos_ry, sin_ry = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    # Rotation around camera y axis: [x'; z'] = [[c, s], [-s, c]] [x; z]
    x_r = cos_ry * x_c + sin_ry * z_c
    z_r = -sin_ry * x_c + cos_ry * z_c
    corners = jnp.stack([x_r + x[..., None],
                         y_c + y[..., None],
                         z_r + z[..., None]], axis=-2)
    return corners


# ---------------------------------------------------------------------------
# box_4c codec (4 ground corners + 2 heights)
# ---------------------------------------------------------------------------

def box_3d_to_box_4c(boxes_3d: jnp.ndarray, ground_plane: jnp.ndarray
                     ) -> jnp.ndarray:
    """box_3d (..., 7) -> box_4c (..., 10) on the given ground plane.

    Corners are ordered starting from the +x/+z corner of the midpoint-
    aligned rotated rect, following the reference's convention that the
    footprint is rotated to the nearest 90-degree multiple first
    (box_4c_encoder.py:18-160). h1/h2 are the bottom/top face distances
    above the ground plane along its normal.
    """
    x, y, z = boxes_3d[..., 0], boxes_3d[..., 1], boxes_3d[..., 2]
    l, w, h = boxes_3d[..., 3], boxes_3d[..., 4], boxes_3d[..., 5]
    ry = boxes_3d[..., 6]

    # Snap to the nearest 90-degree multiple, swapping l/w when the box
    # is closer to a vertical orientation.
    half_pi = jnp.pi / 2.0
    ortho_ry = jnp.round(ry / half_pi) * half_pi
    rot_delta = ry - ortho_ry
    is_vert = (jnp.round(ortho_ry / half_pi).astype(jnp.int32) % 2) != 0
    eff_l = jnp.where(is_vert, w, l)
    eff_w = jnp.where(is_vert, l, w)

    l2, w2 = eff_l / 2.0, eff_w / 2.0
    # corners before residual rotation, order: (+x,+z), (+x,-z), (-x,-z), (-x,+z)
    x_c = jnp.stack([l2, l2, -l2, -l2], axis=-1)
    z_c = jnp.stack([w2, -w2, -w2, w2], axis=-1)
    cos_d, sin_d = jnp.cos(rot_delta)[..., None], jnp.sin(rot_delta)[..., None]
    x_r = cos_d * x_c + sin_d * z_c
    z_r = -sin_d * x_c + cos_d * z_c
    x_corners = x_r + x[..., None]
    z_corners = z_r + z[..., None]

    # Heights above the ground plane (camera y points down, so height
    # above ground = ground_y - y).
    abc = ground_plane[..., 0:3]
    d = ground_plane[..., 3]
    ground_y = -(abc[..., 0] * x + abc[..., 2] * z + d) / abc[..., 1]
    h1 = ground_y - y
    h2 = h1 + h
    return jnp.concatenate(
        [x_corners, z_corners, h1[..., None], h2[..., None]], axis=-1)


def box_4c_to_box_3d(boxes_4c: jnp.ndarray, ground_plane: jnp.ndarray
                     ) -> jnp.ndarray:
    """box_4c (..., 10) -> box_3d (..., 7) (reference
    box_4c_encoder.py:168-369 midpoint-alignment semantics).

    The possibly non-rectangular quad is turned into a rectangle through
    the midpoints of its sides; length is the longer midpoint span, and
    ry comes from the longer-side direction.
    """
    xs = boxes_4c[..., 0:4]
    zs = boxes_4c[..., 4:8]
    h1 = boxes_4c[..., 8]
    h2 = boxes_4c[..., 9]

    # Midpoints of the 4 sides: (c1+c2)/2, (c2+c3)/2, (c3+c4)/2, (c4+c1)/2
    xs_roll = jnp.roll(xs, -1, axis=-1)
    zs_roll = jnp.roll(zs, -1, axis=-1)
    mid_x = (xs + xs_roll) / 2.0
    mid_z = (zs + zs_roll) / 2.0

    # Center = mean of corners
    cx = jnp.mean(xs, axis=-1)
    cz = jnp.mean(zs, axis=-1)

    # Side vectors through opposite midpoints: (m0 - m2) and (m1 - m3)
    v1x = mid_x[..., 0] - mid_x[..., 2]
    v1z = mid_z[..., 0] - mid_z[..., 2]
    v2x = mid_x[..., 1] - mid_x[..., 3]
    v2z = mid_z[..., 1] - mid_z[..., 3]
    len1 = jnp.hypot(v1x, v1z)
    len2 = jnp.hypot(v2x, v2z)

    longer_is_1 = len1 >= len2
    l = jnp.where(longer_is_1, len1, len2)
    w = jnp.where(longer_is_1, len2, len1)
    dir_x = jnp.where(longer_is_1, v1x, v2x)
    dir_z = jnp.where(longer_is_1, v1z, v2z)
    # camera-frame yaw: ry = atan2(-z, x) for a heading in the xz plane
    ry = jnp.arctan2(-dir_z, dir_x)

    # y of the bottom face: ground y at (cx, cz) minus h1 (camera y down)
    abc = ground_plane[..., 0:3]
    d = ground_plane[..., 3]
    ground_y = -(abc[..., 0] * cx + abc[..., 2] * cz + d) / abc[..., 1]
    y = ground_y - h1
    h = h2 - h1
    return jnp.stack([cx, y, cz, l, w, h, ry], axis=-1)


def box_4c_to_offsets(boxes_4c: jnp.ndarray, gt_boxes_4c: jnp.ndarray
                      ) -> jnp.ndarray:
    """Plain difference codec (reference box_4c_encoder.py:461-472)."""
    return gt_boxes_4c - boxes_4c


def offsets_to_box_4c(boxes_4c: jnp.ndarray, offsets: jnp.ndarray
                      ) -> jnp.ndarray:
    return boxes_4c + offsets


# ---------------------------------------------------------------------------
# box_8c codec
# ---------------------------------------------------------------------------

def box_3d_to_box_8c(boxes_3d: jnp.ndarray) -> jnp.ndarray:
    """box_3d (..., 7) -> (..., 3, 8) corners (ortho-rotated first, as in
    reference box_8c_encoder.np_box_3d_to_box_8co semantics)."""
    return box_3d_to_corners(boxes_3d)


def box_8c_to_box_3d(boxes_8c: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 8) corners -> box_3d via least-squares-style recovery:
    centroid from corner mean, dims from averaged edge lengths, ry from
    averaged bottom-face edge directions (reference box_8c_encoder.py:383)."""
    x_c = boxes_8c[..., 0, :]
    y_c = boxes_8c[..., 1, :]
    z_c = boxes_8c[..., 2, :]

    cx = jnp.mean(x_c, axis=-1)
    cz = jnp.mean(z_c, axis=-1)
    y_bottom = jnp.mean(y_c[..., 0:4], axis=-1)
    y_top = jnp.mean(y_c[..., 4:8], axis=-1)
    h = y_bottom - y_top

    # bottom-face edges 0-1 / 3-2 are width edges; 1-2 / 0-3 are length edges
    # (corner order from box_3d_to_corners)
    lx1 = x_c[..., 0] - x_c[..., 3]
    lz1 = z_c[..., 0] - z_c[..., 3]
    lx2 = x_c[..., 1] - x_c[..., 2]
    lz2 = z_c[..., 1] - z_c[..., 2]
    wx1 = x_c[..., 0] - x_c[..., 1]
    wz1 = z_c[..., 0] - z_c[..., 1]
    wx2 = x_c[..., 3] - x_c[..., 2]
    wz2 = z_c[..., 3] - z_c[..., 2]

    l = (jnp.hypot(lx1, lz1) + jnp.hypot(lx2, lz2)) / 2.0
    w = (jnp.hypot(wx1, wz1) + jnp.hypot(wx2, wz2)) / 2.0
    dir_x = (lx1 + lx2) / 2.0
    dir_z = (lz1 + lz2) / 2.0
    ry = jnp.arctan2(-dir_z, dir_x)
    return jnp.stack([cx, y_bottom, cz, l, w, h, ry], axis=-1)
