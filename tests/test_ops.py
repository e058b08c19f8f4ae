import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dodt_tpu.ops import losses, nms, roi, correlation, sampling


# ---------------------------------------------------------------- losses

def test_smooth_l1():
    pred = jnp.array([[0.0, 2.0], [1.0, 1.0]])
    tgt = jnp.array([[0.5, 0.0], [1.0, 1.0]])
    w = jnp.array([2.0, 1.0])
    out = np.array(losses.weighted_smooth_l1(pred, tgt, w))
    # row0: 0.5*0.25 + (2-0.5) = 1.625; x2 = 3.25. row1: 0
    np.testing.assert_allclose(out, [3.25, 0.0], atol=1e-6)


def test_softmax_loss():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
    onehot = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = float(losses.weighted_softmax(logits, onehot, 1.0))
    assert out < 1e-3
    onehot_wrong = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    assert float(losses.weighted_softmax(logits, onehot_wrong, 1.0)) > 15


def test_label_smoothing():
    oh = np.array(losses.label_smoothing_onehot(jnp.array([1]), 2, 0.001))
    np.testing.assert_allclose(oh[0], [0.0005, 0.9995], atol=1e-6)


# ---------------------------------------------------------------- nms

def np_greedy_nms(boxes, scores, thresh, max_out):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) == max_out:
            break
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_numpy_greedy():
    rng = np.random.RandomState(4)
    n = 64
    xy = rng.uniform(0, 10, (n, 2))
    wh = rng.uniform(1, 3, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in (0.3, 0.5, 0.8):
        want = np_greedy_nms(boxes, scores, thresh, 16)
        idx, ok = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), 16, thresh)
        got = list(np.array(idx)[np.array(ok)])
        assert got == want, (thresh, got, want)


def test_exact_parallel_nms_matches_sequential_greedy():
    """The fixpoint-iterated parallel NMS must reproduce greedy exactly,
    including at the chain-heavy 0.01 threshold the final stage uses."""
    rng = np.random.RandomState(11)
    for seed in range(4):
        rng = np.random.RandomState(seed)
        n = 96
        xy = rng.uniform(0, 12, (n, 2))
        wh = rng.uniform(1, 4, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.rand(n) < 0.9
        for thresh in (0.01, 0.3, 0.8):
            gi, gok = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 24, thresh)
            ei, eok = nms.nms_bev_exact(jnp.asarray(boxes),
                                        jnp.asarray(scores),
                                        jnp.asarray(valid), 24, thresh)
            want = list(np.array(gi)[np.array(gok)])
            got = list(np.array(ei)[np.array(eok)])
            assert got == want, (seed, thresh, got, want)


def test_exact_nms_recovers_fast_nms_chain_loss():
    """Suppression chain A(.9) overlaps B(.8) overlaps C(.7), A does not
    overlap C: greedy keeps A and C; single-pass fast NMS loses C."""
    boxes = jnp.array([[0.0, 0, 2, 2],
                       [1.5, 0, 3.5, 2],
                       [3.0, 0, 5.0, 2]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    ei, eok = nms.nms_bev_exact(boxes, scores, valid, 3, 0.05)
    assert list(np.array(ei)[np.array(eok)]) == [0, 2]
    fi, fok = nms.nms_bev_fast(boxes, scores, valid, 3, 0.05)
    assert list(np.array(fi)[np.array(fok)]) == [0]


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 1, 1], [10, 10, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([False, True])
    idx, ok = nms.nms_bev(boxes, scores, valid, 2, 0.5)
    kept = np.array(idx)[np.array(ok)]
    assert list(kept) == [1]


# ---------------------------------------------------------------- roi

def np_crop_and_resize(image, box, s):
    """Oracle with the half-pixel convention (coord = norm*dim - 0.5)."""
    h, w, c = image.shape
    y1, x1, y2, x2 = box
    out = np.zeros((s, s, c))
    for i in range(s):
        for j in range(s):
            y = (y1 + (y2 - y1) * i / (s - 1)) * h - 0.5
            x = (x1 + (x2 - x1) * j / (s - 1)) * w - 0.5
            y = min(max(y, 0), h - 1)
            x = min(max(x, 0), w - 1)
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy, fx = y - y0, x - x0
            out[i, j] = (image[y0, x0] * (1 - fy) * (1 - fx) +
                         image[y0, x1i] * (1 - fy) * fx +
                         image[y1i, x0] * fy * (1 - fx) +
                         image[y1i, x1i] * fy * fx)
    return out


def test_crop_and_resize_constant():
    # constant image -> constant crops regardless of convention
    img = np.full((9, 9, 3), 2.5, np.float32)
    boxes = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.1, 0.3, 0.4, 0.8]])
    out = np.array(roi.crop_and_resize(jnp.asarray(img), boxes, 7))
    np.testing.assert_allclose(out, 2.5, atol=1e-6)


def test_crop_and_resize_vs_numpy():
    rng = np.random.RandomState(6)
    for c in (4, 32):   # exercise both the packed and 4-gather paths
        img = rng.rand(20, 30, c).astype(np.float32)
        boxes = np.array([[0.1, 0.2, 0.6, 0.9],
                          [0.0, 0.0, 0.3, 0.3],
                          [0.5, 0.5, 1.0, 1.0],
                          [-0.05, -0.05, 1.05, 1.08]], np.float32)
        out = np.array(roi.crop_and_resize(jnp.asarray(img),
                                           jnp.asarray(boxes), 5))
        for k in range(len(boxes)):
            want = np_crop_and_resize(img, boxes[k], 5)
            np.testing.assert_allclose(out[k], want, atol=1e-4)


def test_crop_and_resize_matmul_matches_gather():
    """The interpolation-matmul form is the same operator as the gather
    form (identical sample lattice, taps, and clamping)."""
    rng = np.random.RandomState(7)
    for c, s in ((1, 3), (4, 7), (32, 7)):
        img = rng.rand(20, 30, c).astype(np.float32)
        boxes = np.array([[0.1, 0.2, 0.6, 0.9],
                          [0.0, 0.0, 0.3, 0.3],
                          [0.5, 0.5, 1.0, 1.0],
                          [0.42, 0.13, 0.44, 0.17],
                          [-0.05, -0.05, 1.05, 1.08],
                          [0.3, 0.3, 0.3, 0.3]], np.float32)
        got = np.array(roi.crop_and_resize(
            jnp.asarray(img), jnp.asarray(boxes), s, method="matmul"))
        want = np.array(roi.crop_and_resize(
            jnp.asarray(img), jnp.asarray(boxes), s, method="gather"))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_crop_and_resize_matmul_crop_size_1():
    rng = np.random.RandomState(8)
    img = rng.rand(12, 16, 2).astype(np.float32)
    boxes = jnp.asarray(np.array([[0.2, 0.2, 0.7, 0.9]], np.float32))
    got = np.array(roi.crop_and_resize(img, boxes, 1, method="matmul"))
    want = np.array(roi.crop_and_resize(img, boxes, 1, method="gather"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_crop_and_resize_auto_threshold():
    """auto picks matmul at production batch sizes and stays numerically
    interchangeable with the gather path there."""
    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.rand(18, 24, 1).astype(np.float32))
    boxes = jnp.asarray(rng.rand(300, 4).astype(np.float32))
    boxes = jnp.sort(boxes.reshape(300, 2, 2), axis=1).reshape(300, 4)
    auto = np.array(roi.crop_and_resize(img, boxes, 3))
    gather = np.array(roi.crop_and_resize(img, boxes, 3, method="gather"))
    np.testing.assert_allclose(auto, gather, atol=2e-5)


def test_crop_auto_dispatch_production_shapes():
    """Pin the auto gather/matmul decision at the shapes the model
    actually runs (measured on the v5e — see roi.auto_method):

    * RPN pass-2, 1-ch ranking bottleneck: matmul wins (1.7 -> 0.87 ms)
    * second-stage 32-ch feature crops: matmul LOSES (2.2 -> 8.0 ms on
      the eval path; at train B=8 its rowred intermediate is 17.6 GB ->
      compile-time OOM), must stay on the gather path
    * 90k-anchor fallback: gather (no giant interpolation matrices)
    """
    f32 = 4
    # eval + train pass-2 (8192 candidates / +512 mini-batch), 180x600x1
    assert roi.auto_method(8192, 3, (180, 600, 1), f32) == "matmul"
    assert roi.auto_method(8704, 3, (180, 600, 1), f32) == "matmul"
    # second stage: 300 (eval) / 1024 (train) proposals x 7x7 crops
    # from the 32-ch image (180x600) and BEV (352x400) feature maps
    assert roi.auto_method(300, 7, (180, 600, 32), f32) == "gather"
    assert roi.auto_method(1024, 7, (180, 600, 32), f32) == "gather"
    assert roi.auto_method(1024, 7, (352, 400, 32), f32) == "gather"
    # 90k-anchor dense fallback
    assert roi.auto_method(89600, 3, (352, 400, 1), f32) == "gather"
    # tiny batches stay on gather (dispatch overhead)
    assert roi.auto_method(8, 3, (180, 600, 1), f32) == "gather"


def test_crop_gather_mmbwd_vjp_matches_autodiff():
    """The scatter-free custom VJP (matmul-form transpose) must agree
    with plain autodiff through the gather path — both image and box
    cotangents (the reference's tf.image.crop_and_resize carries box
    gradients, so the training path keeps them)."""
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(24, 32, 5).astype(np.float32))
    boxes = jnp.asarray(np.array([[0.1, 0.2, 0.5, 0.6],
                                  [0.0, 0.0, 1.0, 1.0],
                                  [0.33, 0.41, 0.35, 0.44]], np.float32))
    g = jnp.asarray(rng.rand(3, 7, 7, 5).astype(np.float32))

    def f_ref(im, bx):
        return roi.crop_and_resize(im, bx, 7, method="gather")

    def f_mm(im, bx):
        return roi.crop_and_resize(im, bx, 7, method="gather_mmbwd")

    out_ref, vjp_ref = jax.vjp(f_ref, img, boxes)
    out_mm, vjp_mm = jax.vjp(f_mm, img, boxes)
    np.testing.assert_allclose(np.array(out_mm), np.array(out_ref),
                               rtol=1e-6, atol=1e-6)
    di_ref, db_ref = vjp_ref(g)
    di_mm, db_mm = vjp_mm(g)
    np.testing.assert_allclose(np.array(di_mm), np.array(di_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(db_mm), np.array(db_ref),
                               rtol=1e-3, atol=1e-3)


def test_crop_gather_mmbwd_vjp_chunked_matches_unchunked(monkeypatch):
    """The proposal-chunked backward (the B=8 train fix: the unchunked
    matmul-form VJP materializes rowred (N, S, W, C), 17.6 GB under
    vmap at B=8) must produce the same cotangents as the unchunked
    path. Threshold shrunk to force chunking at test shapes; N=256 is
    a chunk multiple so the scan branch is taken."""
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(24, 32, 5).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(0.05, 0.45, (256, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].add(0.4)
    g = jnp.asarray(rng.rand(256, 7, 7, 5).astype(np.float32))

    def grads():
        _, vjp = jax.vjp(
            lambda im, bx: roi.crop_and_resize(
                im, bx, 7, method="gather_mmbwd"), img, boxes)
        return vjp(g)

    di_un, db_un = grads()
    monkeypatch.setattr(roi, "_BWD_CHUNK_BYTES", 0)
    monkeypatch.setattr(roi, "_BWD_CHUNK", 128)  # n=256 must chunk
    di_ch, db_ch = grads()
    np.testing.assert_allclose(np.array(di_ch), np.array(di_un),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(db_ch), np.array(db_un),
                               rtol=1e-4, atol=1e-4)


def test_crop_gather_mmbwd_vjp_under_vmap():
    """vmapped custom VJP (the model applies it under two vmaps)."""
    rng = np.random.RandomState(8)
    imgs = jnp.asarray(rng.rand(2, 24, 32, 3).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.1, 0.5, (2, 4, 4)).astype(
        np.float32))
    boxes = boxes.at[..., 2:].add(0.3)

    def loss(method):
        def f(im, bx):
            c = jax.vmap(lambda i, b: roi.crop_and_resize(
                i, b, 3, method=method))(im, bx)
            return (c ** 2).sum()
        return jax.grad(f, argnums=(0, 1))(imgs, boxes)

    di_ref, db_ref = loss("gather")
    di_mm, db_mm = loss("gather_mmbwd")
    np.testing.assert_allclose(np.array(di_mm), np.array(di_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(db_mm), np.array(db_ref),
                               rtol=1e-3, atol=1e-3)


def test_crop_and_resize_window_matches_gather():
    """The windowed Pallas form is the same operator as the gather form
    for every ROI whose sample span fits the window (the only shapes it
    is dispatched for: metric-bounded second-stage BEV crops)."""
    from dodt_tpu.ops import roi_pallas
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(96, 128, 32).astype(np.float32),
                      jnp.bfloat16)
    # spans <= 0.35 * dim < window - 2 pixels, incl. edge-touching and
    # degenerate boxes
    boxes = np.array([[0.1, 0.2, 0.4, 0.5],
                      [0.0, 0.0, 0.3, 0.3],
                      [0.7, 0.6, 1.0, 1.0],
                      [0.42, 0.13, 0.44, 0.17],
                      [0.3, 0.3, 0.3, 0.3],
                      [0.95, 0.95, 1.05, 1.05],
                      [-0.05, -0.05, 0.1, 0.1],
                      [0.5, 0.5, 0.85, 0.82]], np.float32)
    got = np.array(roi_pallas.crop_and_resize_window(
        img, jnp.asarray(boxes), 7, window=64, interpret=True),
        np.float32)
    want = np.array(roi.crop_and_resize(img, jnp.asarray(boxes), 7,
                                        method="gather"), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)


def test_crop_and_resize_window_oversized_roi_clamps():
    """ROIs wider than the window clamp their outermost samples to the
    window edge (documented semantic); the result stays finite and the
    in-window samples still agree with the gather path's lattice."""
    from dodt_tpu.ops import roi_pallas
    rng = np.random.RandomState(12)
    img = jnp.asarray(rng.rand(96, 128, 4).astype(np.float32),
                      jnp.bfloat16)
    boxes = jnp.asarray(np.array([[0.0, 0.0, 1.0, 1.0]], np.float32))
    got = np.array(roi_pallas.crop_and_resize_window(
        img, boxes, 7, window=64, interpret=True), np.float32)
    assert np.isfinite(got).all()
    want = np.array(roi.crop_and_resize(img, boxes, 7,
                                        method="gather"), np.float32)
    # the first sample rows/cols start at the window origin -> exact
    np.testing.assert_allclose(got[:, 0, 0], want[:, 0, 0], atol=1e-2)


def test_crop_and_resize_window_rejects_small_maps():
    from dodt_tpu.ops import roi_pallas
    img = jnp.zeros((32, 32, 4), jnp.bfloat16)
    boxes = jnp.zeros((2, 4), jnp.float32)
    with pytest.raises(ValueError):
        roi_pallas.crop_and_resize_window(img, boxes, 7, window=64,
                                          interpret=True)


# ---------------------------------------------------------------- correlation

def np_correlation(a, b, max_d, s2=1):
    h, w, c = a.shape
    r = max_d // s2
    d = 2 * r + 1
    pad = max_d
    bp = np.pad(b, ((pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((h, w, d * d), np.float32)
    for ky in range(d):
        for kx in range(d):
            dy = (ky - r) * s2
            dx = (kx - r) * s2
            shifted = bp[pad + dy: pad + dy + h, pad + dx: pad + dx + w]
            out[:, :, ky * d + kx] = (a * shifted).sum(-1) / c
    return out


def test_correlation_xla_matches_numpy():
    rng = np.random.RandomState(7)
    a = rng.randn(12, 16, 8).astype(np.float32)
    b = rng.randn(12, 16, 8).astype(np.float32)
    for max_d, s2 in ((2, 1), (4, 2)):
        want = np_correlation(a, b, max_d, s2)
        got = np.array(correlation.correlation_xla(
            jnp.asarray(a), jnp.asarray(b), max_d, s2))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_correlation_identical_maps_center_channel():
    rng = np.random.RandomState(8)
    a = rng.rand(10, 10, 4).astype(np.float32) + 0.5
    out = np.array(correlation.correlation_xla(
        jnp.asarray(a), jnp.asarray(a), 3, 1))
    d = 7
    center = d * d // 2
    # center displacement channel is exactly sum_c a^2 / C
    np.testing.assert_allclose(out[:, :, center], (a * a).sum(-1) / 4,
                               atol=1e-5)
    # and dominates all other channels on average
    assert out[:, :, center].mean() > out.mean(axis=(0, 1)).max() - 1e-6


def test_correlation_batched():
    rng = np.random.RandomState(9)
    a = rng.randn(2, 8, 8, 4).astype(np.float32)
    b = rng.randn(2, 8, 8, 4).astype(np.float32)
    out = np.array(correlation.correlation(
        jnp.asarray(a), jnp.asarray(b), 2, use_pallas=False))
    assert out.shape == (2, 8, 8, 25)
    np.testing.assert_allclose(out[0], np_correlation(a[0], b[0], 2),
                               atol=1e-5)


def test_corr_bottleneck_fused_xla():
    rng = np.random.RandomState(12)
    a = rng.randn(10, 12, 4).astype(np.float32)
    b = rng.randn(10, 12, 4).astype(np.float32)
    w = rng.randn(25, 2).astype(np.float32)
    out = np.array(correlation.corr_bottleneck_xla(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(w), 2))
    corr = np_correlation(a, b, 2)                   # (H, W, 25)
    want = np.einsum("hwk,kc->chw", corr, w)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_corr_bottleneck_blur_matches_xla():
    rng = np.random.RandomState(14)
    for (h, w, c, cb, md, s2) in [(10, 12, 4, 2, 2, 1),
                                  (12, 12, 4, 1, 4, 2)]:
        a = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
        b = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
        _, d = correlation._disp_grid(md, s2)
        wts = jnp.asarray(rng.randn(d * d, cb).astype(np.float32))
        want = np.array(correlation.corr_bottleneck_xla(a, b, wts, md,
                                                        s2))
        got = np.array(correlation.corr_bottleneck_blur(a, b, wts, md,
                                                        s2))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_corr_bottleneck_grads():
    rng = np.random.RandomState(13)
    a = jnp.asarray(rng.randn(6, 6, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(6, 6, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(25, 1).astype(np.float32))

    def f(w_):
        return jnp.sum(correlation.corr_bottleneck_xla(a, b, w_, 2) ** 2)

    g = jax.grad(f)(w)
    eps = 1e-3
    for idx in [(0, 0), (12, 0), (24, 0)]:
        fd = (f(w.at[idx].add(eps)) - f(w.at[idx].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


def test_correlation_grad():
    rng = np.random.RandomState(10)
    a = jnp.asarray(rng.randn(6, 6, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(6, 6, 3).astype(np.float32))

    def f(x, y):
        return jnp.sum(correlation.correlation_xla(x, y, 2) ** 2)

    ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
    # finite difference check on a few entries
    eps = 1e-3
    for idx in [(0, 0, 0), (3, 4, 1), (5, 5, 2)]:
        ap = a.at[idx].add(eps)
        am = a.at[idx].add(-eps)
        fd = (f(ap, b) - f(am, b)) / (2 * eps)
        np.testing.assert_allclose(ga[idx], fd, rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------- sampling

def test_balanced_sample_counts():
    key = jax.random.PRNGKey(0)
    n = 1000
    pos = jnp.zeros(n, bool).at[:30].set(True)
    eligible = jnp.ones(n, bool)
    sel, pos_sel = sampling.balanced_sample(key, pos, eligible, 256)
    assert int(jnp.sum(sel)) == 256
    assert int(jnp.sum(pos_sel)) == 30  # fewer than half the batch
    assert bool(jnp.all(pos_sel <= pos))


def test_balanced_sample_caps_positives():
    key = jax.random.PRNGKey(1)
    n = 1000
    pos = jnp.zeros(n, bool).at[:900].set(True)
    eligible = jnp.ones(n, bool)
    sel, pos_sel = sampling.balanced_sample(key, pos, eligible, 256)
    # positives capped at half the batch; only 100 negatives exist, so
    # the total is 128 + 100 (matches the reference sampler, which fills
    # with however many negatives are available).
    assert int(jnp.sum(pos_sel)) == 128
    assert int(jnp.sum(sel)) == 228


def test_assign_targets():
    from dodt_tpu.ops import boxes as box_ops
    anchors_bev = jnp.array([[0, 0, 2, 2], [10, 10, 12, 12], [0, 0, 1, 1]],
                            jnp.float32)
    anchors = jnp.array([[1.0, 0, 1, 2, 1.5, 2],
                         [11.0, 0, 11, 2, 1.5, 2],
                         [0.5, 0, 0.5, 1, 1.5, 1]], jnp.float32)
    gt_bev = jnp.array([[0, 0, 2, 2], [9, 9, 12, 12]], jnp.float32)
    gt_anchors = jnp.array([[1.0, 0.1, 1, 2, 1.5, 2],
                            [10.5, 0, 10.5, 3, 1.5, 3]], jnp.float32)
    gt_classes = jnp.array([1, 2], jnp.int32)
    gt_valid = jnp.array([True, True])
    t = sampling.assign_targets(anchors_bev, anchors, gt_bev, gt_anchors,
                                gt_classes, gt_valid)
    assert list(np.array(t.gt_index)) == [0, 1, 0]
    assert list(np.array(t.class_idx)) == [1, 2, 1]
    np.testing.assert_allclose(np.array(t.max_iou)[0], 1.0)
    # offsets encoded against the matched GT
    want = np.array(box_ops.anchor_to_offset(anchors[1:2], gt_anchors[1:2]))
    np.testing.assert_allclose(np.array(t.offsets)[1], want[0], atol=1e-5)


def test_assign_targets_invalid_gt_ignored():
    anchors_bev = jnp.array([[0, 0, 2, 2]], jnp.float32)
    anchors = jnp.array([[1.0, 0, 1, 2, 1.5, 2]], jnp.float32)
    gt_bev = jnp.array([[0, 0, 2, 2], [0, 0, 2, 2]], jnp.float32)
    gt_anchors = jnp.array([[1.0, 0, 1, 2, 1.5, 2],
                            [1.0, 0, 1, 2, 1.5, 2]], jnp.float32)
    t = sampling.assign_targets(
        anchors_bev, anchors, gt_bev, gt_anchors,
        jnp.array([1, 2], jnp.int32), jnp.array([False, True]))
    assert list(np.array(t.gt_index)) == [1]
    assert list(np.array(t.class_idx)) == [2]


def test_sample_mini_batch_dead_zone():
    key = jax.random.PRNGKey(2)
    ious = jnp.array([0.0, 0.2, 0.4, 0.6, 0.9])
    sel, pos = sampling.sample_mini_batch(
        key, ious, 4, (0.0, 0.3), (0.5, 1.0))
    sel = np.array(sel)
    # 0.4 is in the dead zone [0.3, 0.5] -> never sampled
    assert not sel[2]
    assert np.array(pos)[3] and np.array(pos)[4]


# ---------------------------------------------------------------- fast NMS

def np_fast_nms(boxes, scores, valid, max_out, thresh):
    n = len(scores)
    s = np.where(valid, scores, -1e9)
    keep = []
    for i in range(n):
        if not valid[i]:
            continue
        dominated = False
        for j in range(n):
            if j == i or not valid[j]:
                continue
            if (s[j] > s[i]) or (s[j] == s[i] and j < i):
                from dodt_tpu.utils.np_iou import aligned_iou_2d
                iou = aligned_iou_2d(boxes[i], boxes[j:j+1])[0]
                if iou > thresh:
                    dominated = True
                    break
        if not dominated:
            keep.append(i)
    keep.sort(key=lambda i: (-s[i], i))
    return keep[:max_out]


def test_fast_nms_vs_oracle():
    from dodt_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(7)
    n = 40
    xy = rng.rand(n, 2) * 8
    wh = rng.rand(n, 2) * 4 + 0.5
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.2
    idx, ok = nms_ops.nms_bev_fast(jnp.asarray(boxes),
                                   jnp.asarray(scores),
                                   jnp.asarray(valid), 10, 0.3)
    got = [int(i) for i, o in zip(np.array(idx), np.array(ok)) if o]
    want = np_fast_nms(boxes, scores, valid, 10, 0.3)
    assert got == want


def test_fast_nms_subset_of_greedy_picks_top():
    # with a high threshold nothing suppresses: both return top-k
    from dodt_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(8)
    boxes = jnp.asarray(rng.rand(20, 2).repeat(2, -1) +
                        np.array([0, 0, 0.1, 0.1]), jnp.float32)
    scores = jnp.asarray(rng.rand(20).astype(np.float32))
    valid = jnp.ones(20, bool)
    gi, gv = nms_ops.nms_bev(boxes, scores, valid, 5, 0.99)
    fi, fv = nms_ops.nms_bev_fast(boxes, scores, valid, 5, 0.99)
    np.testing.assert_array_equal(np.array(gi), np.array(fi))
