import numpy as np
import jax.numpy as jnp

from dodt_tpu.ops import iou


def test_aligned_iou_basic():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0],
                   [5.0, 5.0, 6.0, 6.0]])
    m = np.array(iou.aligned_iou_matrix(a, b))
    np.testing.assert_allclose(m[0], [1.0 / 7.0, 1.0, 0.0], atol=1e-6)


def _np_raster_iou(box_a, box_b, res=0.02):
    """Rasterized rotated-rect IoU oracle (same idea as the reference's
    PIL-based get_rectangular_metrics, evaluation.py:182)."""
    def corners(b):
        x, z, l, w, ry = b
        c, s = np.cos(ry), np.sin(ry)
        xc = np.array([l, l, -l, -l]) / 2.0
        zc = np.array([w, -w, -w, w]) / 2.0
        return np.stack([c * xc + s * zc + x, -s * xc + c * zc + z], axis=1)

    ca, cb = corners(box_a), corners(box_b)
    lo = np.minimum(ca.min(0), cb.min(0)) - res
    hi = np.maximum(ca.max(0), cb.max(0)) + res
    xs = np.arange(lo[0], hi[0], res) + res / 2
    zs = np.arange(lo[1], hi[1], res) + res / 2
    xx, zz = np.meshgrid(xs, zs)
    pts = np.stack([xx.ravel(), zz.ravel()], axis=1)

    def inside(c, p):
        m = np.ones(len(p), bool)
        for i in range(4):
            a0, a1 = c[i], c[(i + 1) % 4]
            e = a1 - a0
            cr = e[0] * (p[:, 1] - a0[1]) - e[1] * (p[:, 0] - a0[0])
            m &= cr <= 1e-9
        return m

    ia = inside(ca, pts)
    ib = inside(cb, pts)
    inter = np.sum(ia & ib) * res * res
    union = box_a[2] * box_a[3] + box_b[2] * box_b[3] - inter
    return inter / union if union > 0 else 0.0


def test_rotated_iou_identical():
    b = jnp.array([[1.0, 2.0, 4.0, 2.0, 0.7]])
    m = np.array(iou.rotated_iou_matrix(b, b))
    np.testing.assert_allclose(m, [[1.0]], atol=1e-5)


def test_rotated_iou_disjoint():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0, 1.0]])
    m = np.array(iou.rotated_iou_matrix(a, b))
    np.testing.assert_allclose(m, [[0.0]], atol=1e-7)


def test_rotated_iou_axis_aligned_matches_aligned():
    a5 = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b5 = jnp.array([[1.0, 0.5, 4.0, 2.0, 0.0]])
    m = np.array(iou.rotated_iou_matrix(a5, b5))
    # [x, z, l, w] -> aligned corners x1=x-l/2 etc.
    a4 = jnp.array([[-2.0, -1.0, 2.0, 1.0]])
    b4 = jnp.array([[-1.0, -0.5, 3.0, 1.5]])
    expect = np.array(iou.aligned_iou_matrix(a4, b4))
    np.testing.assert_allclose(m, expect, atol=1e-5)


def test_rotated_iou_cross_45():
    # two identical squares, one rotated 45 deg: known analytic IoU
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    m = np.array(iou.rotated_iou_matrix(a, b))[0, 0]
    # intersection is a regular octagon: area = 8*(sqrt(2)-1)
    inter = 8 * (np.sqrt(2) - 1)
    expect = inter / (8 - inter)
    np.testing.assert_allclose(m, expect, rtol=1e-4)


def test_rotated_iou_vs_raster_random():
    rng = np.random.RandomState(3)
    n = 12
    a = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(1, 5, n), rng.uniform(1, 3, n),
                  rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    b = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(1, 5, n), rng.uniform(1, 3, n),
                  rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
    ours = np.array(iou.rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(n):
        for j in range(0, n, 3):
            oracle = _np_raster_iou(a[i], b[j])
            assert abs(ours[i, j] - oracle) < 0.02, (i, j, ours[i, j], oracle)


def test_iou_3d_stacked_boxes():
    # identical footprint, half height overlap
    a = jnp.array([[0.0, 1.0, 10.0, 4.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[0.0, 0.0, 10.0, 4.0, 2.0, 2.0, 0.3]])
    m = np.array(iou.iou_3d_matrix(a, b))[0, 0]
    # overlap vol = 8*1; union = 16+16-8
    np.testing.assert_allclose(m, 8.0 / 24.0, rtol=1e-4)


def test_iou_3d_identical():
    a = jnp.array([[1.0, 1.5, 20.0, 3.9, 1.6, 1.5, -0.4]])
    np.testing.assert_allclose(
        np.array(iou.iou_3d_matrix(a, a))[0, 0], 1.0, atol=1e-5)


def test_np_iou_batched_matches_scalar_fuzz():
    """The vectorized host clip (np_iou.rect_intersection_areas) is the
    scalar Sutherland-Hodgman per pair; fuzz pins exact agreement,
    including touching/contained/disjoint and degenerate-angle pairs."""
    from dodt_tpu.utils import np_iou
    rng = np.random.RandomState(7)
    a5 = np.stack([rng.uniform(-10, 10, 64), rng.uniform(-10, 10, 64),
                   rng.uniform(0.5, 6, 64), rng.uniform(0.5, 4, 64),
                   rng.uniform(-np.pi, np.pi, 64)], axis=1)
    b5 = a5[rng.permutation(64)] + rng.normal(0, 2.0, (64, 5))
    b5[:8] = a5[:8]                       # identical pairs
    b5[8:12, :2] = a5[8:12, :2] + 100.0   # far-disjoint pairs
    b5[12:16, 4] = 0.0                    # axis-aligned
    for i in range(64):
        batched = np_iou.rect_intersection_areas(a5[i], b5)
        for j in range(0, 64, 7):
            scalar = np_iou.rect_intersection_area(a5[i], b5[j])
            np.testing.assert_allclose(batched[j], scalar, atol=1e-9,
                                       err_msg=f"pair {i},{j}")


def test_np_three_d_iou_values():
    from dodt_tpu.utils import np_iou
    a = np.array([0.0, 1.0, 10.0, 4.0, 2.0, 2.0, 0.3])
    b = np.array([[0.0, 0.0, 10.0, 4.0, 2.0, 2.0, 0.3],   # half-h overlap
                  [0.0, 1.0, 10.0, 4.0, 2.0, 2.0, 0.3],   # identical
                  [50.0, 1.0, 10.0, 4.0, 2.0, 2.0, 0.3]])  # disjoint
    out = np_iou.three_d_iou(a, b)
    np.testing.assert_allclose(out, [8.0 / 24.0, 1.0, 0.0], atol=1e-9)
