"""Backbone variants: space-to-depth stem exactness, decode strides,
plain VGG shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from dodt_tpu.config import FeatureExtractorConfig
from dodt_tpu.models.backbone import VggPyramid, s2d_kernel_3x3, \
    space_to_depth


def _cfg(**kw):
    base = dict(conv1=(2, 8), conv2=(1, 8), conv3=(1, 16),
                conv4=(1, 16), decode_stride=2, norm="none")
    base.update(kw)
    return FeatureExtractorConfig(**base)


def test_s2d_kernel_matches_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = space_to_depth(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
    got = jax.lax.conv_general_dilated(
        xs, s2d_kernel_3x3(k), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # depth-to-space the result: channels (a, b, co)
    b, hb, wb, c4 = got.shape
    got = got.reshape(b, hb, wb, 2, 2, 5)
    got = jnp.transpose(got, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * hb,
                                                         2 * wb, 5)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-4)


def test_subpixel_conv_transpose_exact():
    """SubpixelConvTranspose == nn.ConvTranspose(3x3, s2, SAME) with the
    same parameters (names and shapes interchangeable)."""
    import flax.linen as nn
    from dodt_tpu.models.backbone import SubpixelConvTranspose

    rng = np.random.RandomState(3)
    for h, w, ci, co in ((6, 5, 3, 4), (16, 24, 8, 16)):
        x = jnp.asarray(rng.rand(2, h, w, ci).astype(np.float32))
        ref = nn.ConvTranspose(co, (3, 3), strides=(2, 2),
                               padding="SAME")
        params = ref.init(jax.random.PRNGKey(0), x)
        want = ref.apply(params, x)
        ours = SubpixelConvTranspose(co, dtype=jnp.float32)
        got = ours.apply(params, x)
        assert got.shape == want.shape == (2, 2 * h, 2 * w, co)
        np.testing.assert_allclose(np.array(got), np.array(want),
                                   atol=1e-5)


def test_s2d_stem_exact_vs_standard():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 32, 40, 6).astype(np.float32))
    tower_std = VggPyramid(_cfg(s2d_stem=False), dtype=jnp.float32)
    tower_s2d = VggPyramid(_cfg(s2d_stem=True), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    v_std = tower_std.init(key, x)
    v_s2d = tower_s2d.init(key, x)

    # copy conv1 params across the two layouts
    p = jax.tree_util.tree_map(lambda a: a, v_s2d["params"])
    p = dict(p)
    for i in range(2):
        p[f"conv1_{i}_kernel"] = v_std["params"][f"conv1_{i}"]["kernel"]
        p[f"conv1_{i}_bias"] = v_std["params"][f"conv1_{i}"]["bias"]
    for name in v_std["params"]:
        if not name.startswith("conv1_"):
            p[name] = v_std["params"][name]

    out_std = tower_std.apply({"params": v_std["params"]}, x)
    out_s2d = tower_s2d.apply({"params": p}, x)
    np.testing.assert_allclose(np.array(out_s2d), np.array(out_std),
                               atol=1e-4)


def test_s2d_interior_exact_vs_standard():
    """The full s2d-interior tower (packed entry convs, s2d conv2
    block, packed subpixel up2 + s2d fusion2 with the phase-shuffle
    pad) computes EXACTLY the standard tower — including SAME boundary
    handling and the top-left global pad — with an identical parameter
    tree (r3 checkpoints load unchanged)."""
    rng = np.random.RandomState(4)
    for h, w in ((32, 40), (28, 44)):  # aligned + pad-requiring
        x = jnp.asarray(rng.rand(2, h, w, 6).astype(np.float32))
        # conv3=(3, ...) covers the 3-conv s2d block (production shape)
        kw = dict(conv1=(2, 8), conv2=(2, 8), conv3=(3, 16))
        t_std = VggPyramid(_cfg(s2d_stem=False, s2d_interior=False,
                                **kw), dtype=jnp.float32)
        t_int = VggPyramid(_cfg(s2d_stem=True, s2d_interior=True,
                                **kw), dtype=jnp.float32)
        key = jax.random.PRNGKey(0)
        v_std = t_std.init(key, x)
        v_int = t_int.init(key, x)
        p = dict(v_int["params"])
        for i in range(2):
            p[f"conv1_{i}_kernel"] = \
                v_std["params"][f"conv1_{i}"]["kernel"]
            p[f"conv1_{i}_bias"] = v_std["params"][f"conv1_{i}"]["bias"]
        for name in v_std["params"]:
            if not name.startswith("conv1_"):
                assert name in v_int["params"], name  # same tree
                p[name] = v_std["params"][name]
        out_std = t_std.apply({"params": v_std["params"]}, x)
        out_int = t_int.apply({"params": p}, x)
        assert out_int.shape == out_std.shape
        np.testing.assert_allclose(np.array(out_int),
                                   np.array(out_std), atol=2e-6)


def test_decode_stride_shapes():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 40, 6).astype(np.float32))
    key = jax.random.PRNGKey(0)
    t2 = VggPyramid(_cfg(), dtype=jnp.float32)
    v = t2.init(key, x)
    assert t2.apply(v, x).shape == (1, 16, 20, 8)
    t1 = VggPyramid(_cfg(decode_stride=1, s2d_stem=False),
                    dtype=jnp.float32)
    v = t1.init(key, x)
    assert t1.apply(v, x).shape == (1, 32, 40, 8)
    tp = VggPyramid(_cfg(pyramid=False), dtype=jnp.float32)
    v = tp.init(key, x)
    assert tp.apply(v, x).shape == (1, 16, 20, 16)


def test_preprocess_image_uint8_no_wraparound():
    """Batches ship uint8 images; mean subtraction must happen in
    float32 — uint8 arithmetic wraps modulo 256 for every pixel darker
    than the channel mean (50 - 92 would become 214)."""
    import jax.numpy as jnp
    from dodt_tpu.models.backbone import (preprocess_image,
                                          KITTI_IMAGE_MEANS)

    img_u8 = jnp.full((1, 4, 4, 3), 50, jnp.uint8)
    out = preprocess_image(img_u8)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.array(out[0, 0, 0]),
        50.0 - np.array(KITTI_IMAGE_MEANS), atol=1e-5)
    # float input gives identical results
    out_f = preprocess_image(img_u8.astype(jnp.float32))
    np.testing.assert_allclose(np.array(out), np.array(out_f))
