import numpy as np
import jax.numpy as jnp

from dodt_tpu.ops import boxes


def random_boxes_3d(n, rng):
    x = rng.uniform(-30, 30, n)
    y = rng.uniform(-1, 3, n)
    z = rng.uniform(5, 60, n)
    l = rng.uniform(2.5, 5.0, n)
    w = rng.uniform(1.2, 2.2, n)
    h = rng.uniform(1.2, 2.0, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    return np.stack([x, y, z, l, w, h, ry], axis=1).astype(np.float32)


def test_box_3d_to_anchor_axis_aligned():
    box = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.5, 0.0]])
    anc = boxes.box_3d_to_anchor(box)
    np.testing.assert_allclose(
        np.array(anc[0]), [1, 2, 3, 4.0, 1.5, 2.0], atol=1e-6)
    # 90 degrees: l and w swap between x and z
    box90 = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.5, np.pi / 2]])
    anc90 = boxes.box_3d_to_anchor(box90)
    np.testing.assert_allclose(
        np.array(anc90[0]), [1, 2, 3, 2.0, 1.5, 4.0], atol=1e-5)


def test_box_3d_to_anchor_projection():
    # 45 degrees: dim_x = dim_z = (l + w) * cos(45)
    box = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 4]])
    anc = boxes.box_3d_to_anchor(box)
    expect = (4 + 2) * np.cos(np.pi / 4)
    np.testing.assert_allclose(np.array(anc[0, 3]), expect, rtol=1e-5)
    np.testing.assert_allclose(np.array(anc[0, 5]), expect, rtol=1e-5)
    # ortho_rotate snaps 40 degrees to 90
    box2 = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.deg2rad(80)]])
    anc2 = boxes.box_3d_to_anchor(box2, ortho_rotate=True)
    np.testing.assert_allclose(np.array(anc2[0, 3]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.array(anc2[0, 5]), 4.0, atol=1e-5)


def test_anchors_to_box_3d_fix_lw():
    anc = jnp.array([[0, 0, 0, 2.0, 1.5, 4.0]])  # dim_z > dim_x
    box = boxes.anchors_to_box_3d(anc, fix_lw=True)
    np.testing.assert_allclose(np.array(box[0, 3]), 4.0)  # l = longer
    np.testing.assert_allclose(np.array(box[0, 4]), 2.0)
    np.testing.assert_allclose(np.array(box[0, 6]), -np.pi / 2)


def test_offset_codec_roundtrip():
    rng = np.random.RandomState(0)
    anchors = boxes.box_3d_to_anchor(jnp.asarray(random_boxes_3d(32, rng)))
    gt = boxes.box_3d_to_anchor(jnp.asarray(random_boxes_3d(32, rng)))
    off = boxes.anchor_to_offset(anchors, gt)
    rec = boxes.offset_to_anchor(anchors, off)
    np.testing.assert_allclose(np.array(rec), np.array(gt),
                               rtol=1e-3, atol=1e-3)


def test_offset_codec_values():
    anc = jnp.array([[0.0, 0.0, 0.0, 2.0, 1.0, 4.0]])
    gt = jnp.array([[1.0, 0.5, -2.0, 4.0, 2.0, 2.0]])
    off = np.array(boxes.anchor_to_offset(anc, gt))[0]
    np.testing.assert_allclose(
        off, [0.5, 0.5, -0.5, np.log(2), np.log(2), np.log(0.5)],
        atol=1e-6)


def test_orientation_codec():
    ry = jnp.array([0.0, np.pi / 2, -np.pi / 4, 3.0])
    vec = boxes.orientation_to_angle_vector(ry)
    rec = boxes.angle_vector_to_orientation(vec)
    np.testing.assert_allclose(np.array(rec), np.array(ry), atol=1e-6)


def test_corners_axis_aligned():
    box = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.5, 0.0]])
    c = np.array(boxes.box_3d_to_corners(box))[0]  # (3, 8)
    assert c.shape == (3, 8)
    np.testing.assert_allclose(sorted(set(np.round(c[0], 5))), [-1.0, 3.0])
    np.testing.assert_allclose(sorted(set(np.round(c[1], 5))), [0.5, 2.0])
    np.testing.assert_allclose(sorted(set(np.round(c[2], 5))), [2.0, 4.0])
    # bottom face first (y = 2.0), top face second
    np.testing.assert_allclose(c[1, :4], 2.0)
    np.testing.assert_allclose(c[1, 4:], 0.5)


def test_box_8c_roundtrip():
    rng = np.random.RandomState(1)
    b = random_boxes_3d(16, rng)
    # restrict ry to (-pi/2, pi/2] so the recovered heading is unique
    b[:, 6] = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2, 16)
    corners = boxes.box_3d_to_box_8c(jnp.asarray(b))
    rec = np.array(boxes.box_8c_to_box_3d(corners))
    np.testing.assert_allclose(rec[:, :6], b[:, :6], atol=1e-3)
    np.testing.assert_allclose(rec[:, 6], b[:, 6], atol=1e-3)


def test_box_4c_roundtrip_flat_plane():
    gp = jnp.array([0.0, -1.0, 0.0, 1.65])  # y = 1.65 ground
    rng = np.random.RandomState(2)
    b = random_boxes_3d(16, rng)
    b[:, 1] = 1.65  # sit boxes on the ground
    b[:, 6] = rng.uniform(-np.pi / 4 + 0.01, np.pi / 4, 16)  # near-horiz
    b4c = boxes.box_3d_to_box_4c(jnp.asarray(b), gp)
    rec = np.array(boxes.box_4c_to_box_3d(b4c, gp))
    np.testing.assert_allclose(rec[:, 0], b[:, 0], atol=1e-3)  # x
    np.testing.assert_allclose(rec[:, 1], b[:, 1], atol=1e-3)  # y
    np.testing.assert_allclose(rec[:, 2], b[:, 2], atol=1e-3)  # z
    np.testing.assert_allclose(rec[:, 3], b[:, 3], atol=1e-3)  # l
    np.testing.assert_allclose(rec[:, 4], b[:, 4], atol=1e-3)  # w
    np.testing.assert_allclose(rec[:, 5], b[:, 5], atol=1e-3)  # h
    # heading recovered up to pi (box symmetry)
    dry = (rec[:, 6] - b[:, 6] + np.pi / 2) % np.pi - np.pi / 2
    np.testing.assert_allclose(dry, 0, atol=1e-3)


def test_box_4c_heights():
    gp = jnp.array([0.0, -1.0, 0.0, 2.0])  # ground at y=2
    box = jnp.array([[0.0, 1.0, 10.0, 4.0, 2.0, 1.5, 0.0]])
    b4c = np.array(boxes.box_3d_to_box_4c(box, gp))[0]
    # bottom face 1m above ground, top 2.5m
    np.testing.assert_allclose(b4c[8], 1.0, atol=1e-6)
    np.testing.assert_allclose(b4c[9], 2.5, atol=1e-6)


def _oracle_box_4c_to_box_3d(box_4c, ground_plane):
    """Numpy oracle for a single box: reference
    box_4c_encoder.np_box_4c_to_box_3d:168-302 semantics (projected
    extents on the longest midpoint-midpoint direction; centroid offset
    by the un-halved width imbalance, reproducing the reference)."""
    pts = box_4c[0:8].reshape(2, 4)  # rows: x, z
    p = [pts[:, i] for i in range(4)]
    m12 = (p[0] + p[1]) / 2.0
    m23 = (p[1] + p[2]) / 2.0
    m34 = (p[2] + p[3]) / 2.0
    m14 = (p[0] + p[3]) / 2.0
    va = m12 - m34
    vb = m14 - m23
    if np.linalg.norm(va) > np.linalg.norm(vb):
        vec, mid = va, m34
    else:
        vec, mid = vb, m23
    n = vec / np.linalg.norm(vec)
    ortho = np.array([-n[1], n[0]])
    ls = [np.dot(pi - mid, n) for pi in p]
    ws = [np.dot(pi - mid, ortho) for pi in p]
    length = max(ls) - min(ls)
    width = max(ws) - min(ws)
    centroid = mid + n * (min(ls) + max(ls)) / 2.0 + \
        ortho * (max(ws) + min(ws))
    ry = -np.arctan2(vec[1], vec[0])
    a, b, c, d = ground_plane
    gy = -(a * centroid[0] + c * centroid[1] + d) / b
    h1, h2 = box_4c[8], box_4c[9]
    return np.array([centroid[0], gy - h1, centroid[1],
                     length, width, h2 - h1, ry])


def test_box_4c_to_box_3d_golden_nonrect():
    """10k random NON-rectangular quads vs the numpy oracle (the exact
    decode sits in the flagship box_4ca path)."""
    rng = np.random.RandomState(7)
    n = 10000
    base = random_boxes_3d(n, rng)
    base[:, 6] = rng.uniform(-np.pi, np.pi, n)
    gp = jnp.array([0.02, -1.0, 0.01, 1.65])
    b4c = np.array(boxes.box_3d_to_box_4c(jnp.asarray(base), gp))
    # perturb corners and heights so the quads are not rectangles
    b4c[:, 0:8] += rng.uniform(-0.3, 0.3, (n, 8))
    b4c[:, 8] += rng.uniform(-0.1, 0.1, n)
    b4c[:, 9] += rng.uniform(-0.1, 0.1, n)
    got = np.array(boxes.box_4c_to_box_3d(jnp.asarray(b4c), gp))
    want = np.stack([_oracle_box_4c_to_box_3d(b, np.array(gp))
                     for b in b4c])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_box_4c_vertical_box_swaps_lw():
    gp = jnp.array([0.0, -1.0, 0.0, 0.0])
    box = jnp.array([[0.0, 0.0, 10.0, 4.0, 2.0, 1.5, np.pi / 2]])
    b4c = np.array(boxes.box_3d_to_box_4c(box, gp))[0]
    xs, zs = b4c[0:4], b4c[4:8]
    # footprint should be 2 wide in x, 4 long in z
    np.testing.assert_allclose(np.ptp(xs), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.ptp(zs), 4.0, atol=1e-5)
