"""Within-tower cumulative bisect, round 4 (post s2d-interior), with a
fused-conv-chain A/B.

The r3 bisect captured nn.Conv module outputs — the s2d and fused
paths hold parameters in _ConvParams modules whose captured
"intermediate" is the parameter tuple, so the old probe no longer
bounds real stages. VggPyramid now sows stage activations
(stage_c2p/c3/c4/f3 + the tower output); each probe jits the tower and
returns ONE sow, so XLA DCEs later stages — consecutive differences
are true marginal stage costs inside one fusion.

Run: python benchmarks/profile_tower_bisect_r4.py  (TPU)
Writes results_r04/tower_bisect.json.
"""
import dataclasses
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
STAGES = ["stage_c2p", "stage_c3", "stage_c4", "stage_f3", "output"]


def probe_times(name, shape, fe_cfg):
    tower = VggPyramid(fe_cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)
    params = jax.jit(tower.init)(jax.random.PRNGKey(0), x)
    params = {"params": params["params"]}
    rows = []
    for label in STAGES:
        if label == "output":
            def run(p, xx):
                return tower.apply(p, xx)
        else:
            def run(p, xx, label=label):
                _, state = tower.apply(p, xx,
                                       mutable=["intermediates"])
                return state["intermediates"][label][0]
        fn = jax.jit(run)
        out = fn(params, x)
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(params, x)
        device_sync(out)
        ms = (time.perf_counter() - t0) / REPS * 1000
        rows.append({"stage": label, "cum_ms": round(ms, 2)})
        print(f"{name:14s} {label:12s} cum {ms:7.2f} ms", flush=True)
    for i in range(len(rows) - 1, 0, -1):
        rows[i]["marginal_ms"] = round(
            rows[i]["cum_ms"] - rows[i - 1]["cum_ms"], 2)
    rows[0]["marginal_ms"] = rows[0]["cum_ms"]
    return rows


results = {}
for fused in ((), ("conv4",)):
    bev_cfg = dataclasses.replace(cfg.model.bev_extractor,
                                  fused_interior=fused)
    img_cfg = dataclasses.replace(cfg.model.img_extractor,
                                  fused_interior=fused)
    tag = "fused" if fused else "std"
    results[f"bev_{tag}"] = probe_times(
        f"bev[{tag}]", (2, 704, 800, 6), bev_cfg)
    results[f"img_{tag}"] = probe_times(
        f"img[{tag}]", (2, 360, 1200, 3), img_cfg)

os.makedirs("results_r04", exist_ok=True)
with open("results_r04/tower_bisect.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r04/tower_bisect.json")
