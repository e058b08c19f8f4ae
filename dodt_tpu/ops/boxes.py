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


def _box_4c_axis_info(vec_x, vec_z, px, pz, mid_x, mid_z):
    """Project the 4 corners onto a direction vector and its normal;
    recover extent-based length/width/centroid/ry (reference
    box_4c_encoder.calculate_box_3d_info:305-366 semantics)."""
    mag = jnp.maximum(jnp.hypot(vec_x, vec_z), 1e-10)
    nx, nz = vec_x / mag, vec_z / mag
    # corner vectors relative to the starting midpoint, (..., 4)
    rel_x = px - mid_x[..., None]
    rel_z = pz - mid_z[..., None]
    ls = rel_x * nx[..., None] + rel_z * nz[..., None]
    min_l = jnp.min(ls, axis=-1)
    max_l = jnp.max(ls, axis=-1)
    length = max_l - min_l
    # normal = (-nz, nx) in the (x, z) plane
    ws = rel_x * (-nz[..., None]) + rel_z * nx[..., None]
    min_w = jnp.min(ws, axis=-1)
    max_w = jnp.max(ws, axis=-1)
    width = max_w - min_w
    # NOTE: the reference offsets the centroid along the normal by
    # (max_w + min_w), NOT (max_w + min_w)/2 (np_box_4c_to_box_3d:240
    # and tf calculate_box_3d_info:362-364 both do this); reproduced
    # for bit parity.
    w_diff = max_w + min_w
    half_span = (min_l + max_l) / 2.0
    cx = mid_x + nx * half_span + (-nz) * w_diff
    cz = mid_z + nz * half_span + nx * w_diff
    ry = -jnp.arctan2(vec_z, vec_x)
    return cx, cz, length, width, ry


def box_4c_to_box_3d(boxes_4c: jnp.ndarray, ground_plane: jnp.ndarray
                     ) -> jnp.ndarray:
    """box_4c (..., 10) -> box_3d (..., 7), exact reference semantics
    (box_4c_encoder.np_box_4c_to_box_3d:168-302 / tf twin :369-458).

    The longest midpoint-to-midpoint vector of the (possibly
    non-rectangular) quad gives the orientation; all four corners are
    projected onto that direction and its normal, and length/width are
    the projected extents. The centroid starts at the chosen midpoint
    and moves half the projected length along the direction plus the
    width imbalance along the normal.
    """
    xs = boxes_4c[..., 0:4]
    zs = boxes_4c[..., 4:8]
    h1 = boxes_4c[..., 8]
    h2 = boxes_4c[..., 9]

    # side midpoints: 12, 23, 34, 14  (corner i = (xs[i], zs[i]))
    m12x, m12z = (xs[..., 0] + xs[..., 1]) / 2, (zs[..., 0] + zs[..., 1]) / 2
    m23x, m23z = (xs[..., 1] + xs[..., 2]) / 2, (zs[..., 1] + zs[..., 2]) / 2
    m34x, m34z = (xs[..., 2] + xs[..., 3]) / 2, (zs[..., 2] + zs[..., 3]) / 2
    m14x, m14z = (xs[..., 0] + xs[..., 3]) / 2, (zs[..., 0] + zs[..., 3]) / 2

    va_x, va_z = m12x - m34x, m12z - m34z      # vec_34_12
    vb_x, vb_z = m14x - m23x, m14z - m23z      # vec_23_14
    use_a = jnp.hypot(va_x, va_z) > jnp.hypot(vb_x, vb_z)

    a = _box_4c_axis_info(va_x, va_z, xs, zs, m34x, m34z)
    b = _box_4c_axis_info(vb_x, vb_z, xs, zs, m23x, m23z)
    cx, cz, l, w, ry = (jnp.where(use_a, ai, bi) for ai, bi in zip(a, b))

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
