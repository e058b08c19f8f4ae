"""Quick A/B of the fused Pallas conv chain vs XLA convs at the
production tower-interior shapes (iteration harness for
ops/conv_chain.py; the committed evidence is tower_bisect_r4 +
BENCH_r04). Run on TPU: python benchmarks/probe_conv_chain.py [tile]
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu.ops.conv_chain import conv_chain_xla, conv_chain_pallas  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 32

# (name, B, H, W, chain channels) — chain[0] = input channels
CASES = [
    ("bev_conv3", 2, 176, 200, (64, 128, 128, 128)),
    ("bev_conv4", 2, 88, 100, (128, 256, 256, 256)),
    ("bev_fusion3", 2, 176, 200, (256, 64)),
    ("img_conv3", 2, 90, 300, (64, 128, 128, 128)),
    ("img_conv4", 2, 45, 150, (128, 256, 256, 256)),
    ("img_fusion3", 2, 90, 300, (256, 64)),
]


def timeit(fn, *args, n=30):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / n * 1000


rng = np.random.RandomState(0)
tot_xla = tot_pal = 0.0
for name, b, h, w, chans in CASES:
    x = jnp.asarray(rng.rand(b, h, w, chans[0]), jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.float32)
          for ci, co in zip(chans[:-1], chans[1:])]
    bs = [jnp.asarray(rng.randn(co) * 0.05, jnp.float32)
          for co in chans[1:]]
    gflop = 2 * b * h * w * 9 * sum(
        ci * co for ci, co in zip(chans[:-1], chans[1:])) / 1e9

    f_xla = jax.jit(lambda xx, ks=ks, bs=bs: jax.vmap(
        lambda x1: conv_chain_xla(x1, ks, bs))(xx))
    f_pal = jax.jit(lambda xx, ks=ks, bs=bs: conv_chain_pallas(
        xx, ks, bs, tile_rows=TILE))
    ms_x = timeit(f_xla, x)
    ms_p = timeit(f_pal, x)
    ref = np.asarray(f_xla(x), np.float32)
    out = np.asarray(f_pal(x), np.float32)
    err = float(np.max(np.abs(ref - out)))
    tot_xla += ms_x
    tot_pal += ms_p
    print(f"{name:12s} {gflop:6.1f} GFLOP  xla {ms_x:6.2f} ms "
          f"({gflop / ms_x:6.1f} TF/s)  pallas {ms_p:6.2f} ms "
          f"({gflop / ms_p:6.1f} TF/s)  maxdiff {err:.4f}", flush=True)

print(f"TOTAL xla {tot_xla:.2f} ms   pallas {tot_pal:.2f} ms "
      f"({tot_xla - tot_pal:+.2f} ms)")
