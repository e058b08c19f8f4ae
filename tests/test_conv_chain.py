"""Fused Pallas conv-chain equivalence (ops/conv_chain.py).

The kernel's correctness contract: same function as the Flax
conv+bias+relu block chain (reference bev_vgg_pyramid.py:29-178
semantics) up to f32-accumulation-order differences. On CPU the
compiled path dispatches to the XLA twin, so the Pallas kernel itself
is exercised in TPU interpret mode on small shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dodt_tpu.config import FeatureExtractorConfig
from dodt_tpu.models.backbone import VggPyramid
from dodt_tpu.ops.conv_chain import (conv_chain, conv_chain_pallas,
                                     conv_chain_xla)


def _chain(rng, ci, chain_out):
    ks, bs, c = [], [], ci
    for co in chain_out:
        ks.append(jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32))
        bs.append(jnp.asarray(rng.randn(co) * 0.1, jnp.float32))
        c = co
    return ks, bs


@pytest.mark.parametrize("h,w,ci,chain_out,th", [
    (19, 12, 8, (16, 16), 8),      # odd H, grid remainder strip
    (16, 12, 8, (16, 8, 16), 4),   # 3-conv chain, shrinking channels
    (33, 20, 16, (8,), 16),        # single conv
])
def test_pallas_kernel_matches_xla_chain(h, w, ci, chain_out, th):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(h, w, ci), jnp.float32)
    ks, bs = _chain(rng, ci, chain_out)
    ref = conv_chain_xla(x, ks, bs)
    with pltpu.force_tpu_interpret_mode():
        out = conv_chain_pallas(x, ks, bs, tile_rows=th)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_kernel_batched():
    """Batched input runs as a native leading grid dimension (vmap
    does not slice manual-DMA ANY refs, so the kernel owns the batch
    axis)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 17, 12, 8), jnp.float32)
    ks, bs = _chain(rng, 8, (16, 16))
    ref = jax.vmap(lambda xx: conv_chain_xla(xx, ks, bs))(x)
    with pltpu.force_tpu_interpret_mode():
        out = conv_chain(x, ks, bs, tile_rows=8, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_chain_gradient_matches_xla():
    """The custom VJP (backward through the XLA twin) equals plain
    autodiff of the XLA chain."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(10, 8, 4), jnp.float32)
    ks, bs = _chain(rng, 4, (8, 8))

    def f_fused(xx):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv_chain(xx, ks, bs, tile_rows=5,
                                      use_pallas=True) ** 2)

    def f_ref(xx):
        return jnp.sum(conv_chain_xla(xx, ks, bs) ** 2)

    g_fused = jax.grad(f_fused)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_backbone_fused_interior_same_function():
    """VggPyramid(fused_interior=True) is the same function with the
    same parameter tree (off-TPU the dispatch takes the XLA twin, so
    this pins the wiring + param-tree compatibility)."""
    cfg = FeatureExtractorConfig(conv1=(1, 8), conv2=(1, 8),
                                 conv3=(2, 16), conv4=(2, 16))
    cfg_f = FeatureExtractorConfig(
        conv1=(1, 8), conv2=(1, 8), conv3=(2, 16), conv4=(2, 16),
        fused_interior=("conv3", "conv4", "pyramid_fusion3"),
        fused_tile_rows=8)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 48, 64, 6),
                    jnp.float32)
    tower = VggPyramid(cfg, dtype=jnp.float32)
    tower_f = VggPyramid(cfg_f, dtype=jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    out_f = tower_f.apply(params, x)   # same tree restores verbatim
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
