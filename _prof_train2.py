import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.models.dt_avod import DtAvodNet, compute_losses
from dodt_tpu.utils.metrics import device_sync

cfg = cars_dt_tracking()
cfg.dataset.max_points = 65536
model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)
rng = np.random.RandomState(0)
B = 1
p = cfg.dataset.max_points
g = cfg.dataset.max_gt_boxes
pts = rng.uniform(-40, 40, (B, 2, p, 3)).astype(np.float32)
pts[..., 1] = rng.uniform(-1, 2, (B, 2, p)); pts[..., 2] = rng.uniform(0, 70, (B, 2, p))
boxes = np.zeros((B, 2, g, 7), np.float32)
boxes[..., 0] = rng.uniform(-30, 30, (B, 2, g)); boxes[..., 2] = rng.uniform(5, 60, (B, 2, g))
boxes[..., 3:6] = [3.9, 1.6, 1.5]; boxes[..., 1] = 1.65
batch = {k: jnp.asarray(v) for k, v in {
    "points": pts, "points_valid": np.ones((B, 2, p), bool),
    "image": rng.uniform(0, 255, (B, 2, 360, 1200, 3)).astype(np.float32),
    "ground_plane": np.tile(np.array([[0., -1., 0., 1.65]], np.float32), (B, 1)),
    "p2": np.tile(np.array([[[721.5, 0, 609.5, 44.9], [0, 721.5, 172.8, 0.2], [0, 0, 1., 0.003]]], np.float32), (B, 1, 1)),
    "orig_image_shape": np.tile(np.array([[375, 1242]], np.int32), (B, 1)),
    "gt_boxes": boxes, "gt_classes": np.ones((B, 2, g), np.int32),
    "gt_valid": np.ones((B, 2, g), bool),
    "gt_track_ids": np.tile(np.arange(g, dtype=np.int32), (B, 2, 1)),
    "corr_offsets": np.zeros((B, g, 3), np.float32),
    "corr_coexist": np.ones((B, g), bool),
}.items()}
key = jax.random.PRNGKey(0)
variables = jax.jit(model.init, static_argnames=("train", "mode"))(
    {"params": key, "dropout": key, "pathdrop": key}, batch, train=True, mode="train")
params = variables["params"]

def loss_fn(p):
    out = model.apply({"params": p}, batch, train=True, mode="train",
                      rngs={"dropout": key, "pathdrop": key, "sampling": key})
    total, _ = compute_losses(cfg, out, batch, key)
    return total

fwd = jax.jit(loss_fn)
def timeit(name, fn, n=10):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)
timeit("train fwd only", lambda: fwd(params))
gradf = jax.jit(jax.grad(loss_fn))
timeit("train fwd+bwd", lambda: gradf(params))
