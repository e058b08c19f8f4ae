"""Within-tower cumulative-bisect profile on the real chip.

The towers are the #1 forward cost (results_r03/roofline.md). This
attributes time INSIDE VggPyramid: each probe jits the full tower but
returns only one captured intermediate, so XLA dead-code-eliminates
every later stage — consecutive differences are true marginal stage
costs inside one fusion context (same method as
profile_encode_bisect.py, one dispatch per probe).

Run: python benchmarks/profile_tower_bisect.py  (TPU)
Writes results_r03/tower_bisect.json.
"""
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
from dodt_tpu.models.backbone import VggPyramid  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

cfg = cfg_mod.cars_dt_tracking()
REPS = 30

# stage markers: module path whose output ends the prefix
STAGES = [
    ("conv2", ("conv2_1",)),
    ("conv3", ("conv3_2",)),
    ("conv4", ("conv4_2",)),
    ("up3+fuse3", ("pyramid_fusion3_0",)),
    ("up2+fuse2 (out)", ("pyramid_fusion2_0",)),
]


def probe_times(name, shape, fe_cfg):
    tower = VggPyramid(fe_cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)
    params = jax.jit(tower.init)(jax.random.PRNGKey(0), x)
    rows = []
    for label, path in STAGES:
        mods = set(path)

        def filt(mdl, _method, mods=mods):
            return mdl.name in mods

        def run(p, xx, filt=filt):
            _, inter = tower.apply(p, xx, capture_intermediates=filt)
            leaves = jax.tree_util.tree_leaves(inter)
            return leaves[0] if leaves else None

        fn = jax.jit(run)
        out = fn(params, x)
        if out is None:
            print(f"{name} {label}: no intermediate captured, skip")
            continue
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(params, x)
        device_sync(out)
        ms = (time.perf_counter() - t0) / REPS * 1000
        rows.append({"stage": label, "cum_ms": round(ms, 2)})
        print(f"{name:10s} {label:18s} cum {ms:7.2f} ms")
    for i in range(len(rows) - 1, 0, -1):
        rows[i]["marginal_ms"] = round(
            rows[i]["cum_ms"] - rows[i - 1]["cum_ms"], 2)
    if rows:
        rows[0]["marginal_ms"] = rows[0]["cum_ms"]
    return rows


results = {}
results["bev"] = probe_times("bev", (2, 704, 800, 6), cfg.model.bev_extractor)
results["img"] = probe_times("img", (2, 360, 1200, 3), cfg.model.img_extractor)

os.makedirs("results_r03", exist_ok=True)
with open("results_r03/tower_bisect.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r03/tower_bisect.json")
