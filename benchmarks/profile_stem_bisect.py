"""Sub-stem cumulative bisect of the BEV tower's dominant prefix.

profile_tower_bisect.py shows stem+conv1+conv2 is ~4.5 of the tower's
~9 ms (batch 2) but cannot see inside the space-to-depth stem (raw
lax.conv calls, not named submodules). This replicates the stem math
step by step on the REAL initialized tower params, timing cumulative
prefixes inside one jit each (profile_encode_bisect method), plus two
what-if variants:

* no_mask  — drop the inter-conv `_zero_outside` phase masking (NOT
  function-preserving; bounds what exact SAME-padding bookkeeping
  costs)
* f32_glue — keep convs bf16 but run mask/relu glue in f32 (layout
  probe)
* mask3d   — EXACT variant: `_zero_outside` as one multiply with a
  precomputed (hb, wb, 4C) constant mask — no 6D reshapes, so no
  sublane/lane relayout around the multiply
* slicemax — EXACT variant: the phase max-pool as elementwise
  `maximum` of the 4 contiguous C-lane channel groups instead of a
  reshape-(2,2,C)-reduce (channel layout is phase-major, backbone
  s2d_kernel_3x3)
* exact_glue — mask3d + slicemax together (candidate production form)

Run: python benchmarks/profile_stem_bisect.py  (TPU)
Writes results_r03/stem_bisect.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.models import backbone as bb  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

cfg = cfg_mod.cars_dt_tracking()
fe = cfg.model.bev_extractor
REPS = 30
DT = jnp.bfloat16

tower = bb.VggPyramid(fe)
x_np = np.random.RandomState(0).rand(2, 704, 800, 6).astype(np.float32)
x = jnp.asarray(x_np)
params = jax.jit(tower.init)(jax.random.PRNGKey(0), x)["params"]


def _mask3d(hb, wb, ch, h_in, w_in, orig):
    """(hb, wb, 4C) 0/1 constant: original positions inside
    [0, h_in) x [0, w_in), channel layout phase-major (ay, ax, c)."""
    rm = np.zeros((hb, 2), np.float32)
    pos = np.arange(hb * 2).reshape(hb, 2)
    rm[:] = ((pos >= -orig) & (pos < h_in - orig))
    cm = np.zeros((wb, 2), np.float32)
    pos = np.arange(wb * 2).reshape(wb, 2)
    cm[:] = ((pos >= -orig) & (pos < w_in - orig))
    m = (rm[:, None, :, None, None] * cm[None, :, None, :, None])
    return np.broadcast_to(m, (hb, wb, 2, 2, ch)).reshape(hb, wb, 4 * ch)


def stem_prefix(p, xx, stop, mask=True, glue_dtype=None,
                mask_form="6d", max_form="reshape"):
    """Replicates VggPyramid's use_s2d stem + conv2 block exactly
    (backbone.py:171-206)."""
    n, ch = fe.conv1
    xx = xx.astype(DT)
    h_in, w_in = xx.shape[1], xx.shape[2]
    hs = bb.space_to_depth(jnp.pad(
        xx, ((0, 0), (n, n), (n, n), (0, 0))))
    if stop == "s2d":
        return hs
    origin = -n
    for i in range(n):
        kern = p[f"conv1_{i}_kernel"].astype(DT)
        bias = p[f"conv1_{i}_bias"]
        ks2d = bb.s2d_kernel_3x3(kern)
        hs = jax.lax.conv_general_dilated(
            hs, ks2d, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        origin += 1
        if stop == f"conv1_{i}_raw":
            return hs
        if glue_dtype is not None:
            hs = hs.astype(glue_dtype)
        hs = jax.nn.relu(hs + jnp.tile(bias, 4).astype(hs.dtype))
        if i < n - 1 and mask:
            if mask_form == "3d":
                m = _mask3d(hs.shape[1], hs.shape[2], ch, h_in, w_in,
                            origin)
                hs = hs * jnp.asarray(m, hs.dtype)
            else:
                hs = bb._zero_outside(hs, 0, h_in, 0, w_in, origin,
                                      origin)
        hs = hs.astype(DT)
        if stop == f"conv1_{i}":
            return hs
    bb_, hb, wb, _ = hs.shape
    if max_form == "slices":
        c1p = jnp.maximum(
            jnp.maximum(hs[..., 0 * ch:1 * ch], hs[..., 1 * ch:2 * ch]),
            jnp.maximum(hs[..., 2 * ch:3 * ch], hs[..., 3 * ch:4 * ch]))
    else:
        c1p = hs.reshape(bb_, hb, wb, 2, 2, ch).max(axis=(3, 4))
    if stop == "pool":
        return c1p
    h = c1p
    for i in range(fe.conv2[0]):
        kern = p[f"conv2_{i}"]["kernel"].astype(DT)
        bias = p[f"conv2_{i}"]["bias"].astype(DT)
        h = jax.lax.conv_general_dilated(
            h, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        h = jax.nn.relu(h)
        if stop == f"conv2_{i}":
            return h
    return h


def timeit(name, fn):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    device_sync(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    print(f"  {name:16s} {ms:7.2f} ms", flush=True)
    return ms


results = {}
print("== cumulative stem prefixes (batch 2, 704x800x6) ==")
prev = 0.0
for stop in ("s2d", "conv1_0_raw", "conv1_0", "conv1_1_raw", "conv1_1",
             "pool", "conv2_0", "conv2_1"):
    fn = jax.jit(functools.partial(stem_prefix, stop=stop))
    t = timeit(f"cum_{stop}", lambda fn=fn: fn(params, x))
    results[stop] = {"cum_ms": round(t, 2),
                     "marginal_ms": round(t - prev, 2)}
    prev = t

print("== what-if variants (full prefix to conv2_1) ==")
fn_nomask = jax.jit(functools.partial(stem_prefix, stop="conv2_1",
                                      mask=False))
results["nomask_conv2_1"] = round(
    timeit("no_mask", lambda: fn_nomask(params, x)), 2)
fn_f32glue = jax.jit(functools.partial(stem_prefix, stop="conv2_1",
                                       glue_dtype=jnp.float32))
results["f32glue_conv2_1"] = round(
    timeit("f32_glue", lambda: fn_f32glue(params, x)), 2)

# exact variants (function-preserving rewrites of the glue ops)
ref_out = np.asarray(
    jax.jit(functools.partial(stem_prefix, stop="conv2_1"))(params, x),
    np.float32)
for name, kw in (("mask3d", {"mask_form": "3d"}),
                 ("slicemax", {"max_form": "slices"}),
                 ("exact_glue", {"mask_form": "3d",
                                 "max_form": "slices"})):
    fn_v = jax.jit(functools.partial(stem_prefix, stop="conv2_1", **kw))
    var_out = np.asarray(fn_v(params, x), np.float32)
    exact = bool(np.array_equal(ref_out, var_out))
    results[f"{name}_conv2_1"] = {
        "ms": round(timeit(name, lambda fn_v=fn_v: fn_v(params, x)), 2),
        "bit_exact_vs_default": exact}
    if not exact:
        print(f"  !! {name} NOT bit-exact "
              f"(max |d| {np.abs(ref_out - var_out).max():.3e})")

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/stem_bisect.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r03/stem_bisect.json")
