import numpy as np
import jax.numpy as jnp

from dodt_tpu.ops import anchors, projection


AREA = [[-40.0, 40.0], [-5.0, 3.0], [0.0, 70.0]]
STRIDE = [0.5, 0.5]
SIZES = [[3.9, 1.6, 1.56], [4.5, 1.7, 1.65]]
GP = [0.0, -1.0, 0.0, 1.72]


def np_tile_anchors_reference():
    """Numpy oracle mirroring reference tile_anchors_3d semantics
    (grid_anchor_3d_generator.py:39): meshgrid(x, z, size, rot) stacked
    on axis 4 and reshaped -> iteration order (z, x, size, rot)."""
    x_centers = np.arange(AREA[0][0] + STRIDE[0] / 2, AREA[0][1],
                          STRIDE[0], dtype=np.float32)
    z_centers = np.arange(AREA[2][1] - STRIDE[1] / 2, AREA[2][0],
                          -STRIDE[1], dtype=np.float32)
    sizes = np.asarray(SIZES)
    rots = np.array([0, np.pi / 2])
    before = np.stack(np.meshgrid(x_centers, z_centers,
                                  np.arange(len(sizes)),
                                  np.arange(len(rots))),
                      axis=4).reshape(-1, 4)
    a, b, c, d = GP
    y = -(a * before[:, 0] + c * before[:, 1] + d) / b
    out = np.zeros((len(before), 7))
    out[:, 0] = before[:, 0]
    out[:, 1] = y
    out[:, 2] = before[:, 1]
    out[:, 3:6] = sizes[before[:, 2].astype(int)]
    out[:, 6] = rots[before[:, 3].astype(int)]
    return out


def test_tile_anchors_matches_reference_semantics():
    ours = np.array(anchors.tile_anchors_3d(AREA, SIZES, STRIDE, GP))
    ref = np_tile_anchors_reference()
    assert ours.shape == ref.shape == (160 * 140 * 2 * 2, 7)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_grid_is_static():
    xz1 = anchors.grid_anchor_xz(np.asarray(AREA), STRIDE)
    xz2 = anchors.grid_anchor_xz(np.asarray(AREA), STRIDE)
    np.testing.assert_array_equal(xz1, xz2)
    assert xz1.shape == (160 * 140, 2)


def test_project_to_bev():
    anc = jnp.array([[0.0, 0.0, 35.0, 4.0, 1.5, 2.0]])
    bev_extents = jnp.array([[-40.0, 40.0], [0.0, 70.0]])
    corners, norm = projection.project_to_bev(anc, bev_extents)
    c = np.array(corners)[0]
    # x: [-2, 2] shifted by +40 -> [38, 42]; z flip: 70-36=34, 70-33=37... wait
    np.testing.assert_allclose(c, [38.0, 34.0, 42.0, 36.0], atol=1e-5)
    n = np.array(norm)[0]
    np.testing.assert_allclose(n, [38 / 80, 34 / 70, 42 / 80, 36 / 70],
                               atol=1e-6)


def test_project_to_image():
    p2 = jnp.array([[700.0, 0.0, 600.0, 0.0],
                    [0.0, 700.0, 180.0, 0.0],
                    [0.0, 0.0, 1.0, 0.0]])
    anc = jnp.array([[0.0, 1.65, 20.0, 4.0, 1.5, 2.0]])
    corners, norm = projection.project_to_image_space(anc, p2, (360, 1200))
    c = np.array(corners)[0]
    assert (c[2] > c[0]) and (c[3] > c[1])
    assert 0 <= c[0] and c[2] <= 1200 and 0 <= c[1] and c[3] <= 360
    # center of box projects inside the box
    u = 700 * 0.0 / 20.0 + 600
    v = 700 * (1.65 - 1.0) / 20.0 + 180
    assert c[0] < u < c[2] and c[1] < v < c[3]
