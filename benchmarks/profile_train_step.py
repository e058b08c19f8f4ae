import time, functools
import numpy as np
import jax, jax.numpy as jnp
import optax
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.models.dt_avod import DtAvodNet, compute_losses
from dodt_tpu.utils.metrics import device_sync

cfg = cars_dt_tracking()
cfg.dataset.max_points = 65536
model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)
rng = np.random.RandomState(0)

def make_batch(B):
    p = cfg.dataset.max_points
    h, w = cfg.dataset.image_shape
    g = cfg.dataset.max_gt_boxes
    pts = rng.uniform(-40, 40, (B, 2, p, 3)).astype(np.float32)
    pts[..., 1] = rng.uniform(-1, 2, (B, 2, p))
    pts[..., 2] = rng.uniform(0, 70, (B, 2, p))
    boxes = np.zeros((B, 2, g, 7), np.float32)
    boxes[..., 0] = rng.uniform(-30, 30, (B, 2, g))
    boxes[..., 2] = rng.uniform(5, 60, (B, 2, g))
    boxes[..., 3:6] = [3.9, 1.6, 1.5]
    boxes[..., 1] = 1.65
    valid = np.ones((B, 2, g), bool)
    return {k: jnp.asarray(v) for k, v in {
        "points": pts, "points_valid": np.ones((B, 2, p), bool),
        "image": rng.uniform(0, 255, (B, 2, 360, 1200, 3)).astype(np.float32),
        "ground_plane": np.tile(np.array([[0., -1., 0., 1.65]], np.float32), (B, 1)),
        "p2": np.tile(np.array([[[721.5, 0, 609.5, 44.9], [0, 721.5, 172.8, 0.2], [0, 0, 1., 0.003]]], np.float32), (B, 1, 1)),
        "orig_image_shape": np.tile(np.array([[375, 1242]], np.int32), (B, 1)),
        "gt_boxes": boxes,
        "gt_classes": np.ones((B, 2, g), np.int32),
        "gt_valid": valid,
        "gt_track_ids": np.tile(np.arange(g, dtype=np.int32), (B, 2, 1)),
        "corr_offsets": np.zeros((B, g, 3), np.float32),
        "corr_coexist": valid[:, 0],
    }.items()}

key = jax.random.PRNGKey(0)
batch = make_batch(1)
variables = jax.jit(model.init, static_argnames=("train", "mode"))(
    {"params": key, "dropout": key, "pathdrop": key}, batch, train=True, mode="train")
params = variables["params"]
tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
opt_state = jax.jit(tx.init)(params)

@functools.partial(jax.jit, donate_argnums=(0, 1))
def step(params, opt_state, batch, key):
    def loss_fn(p):
        out = model.apply({"params": p}, batch, train=True, mode="train",
                          rngs={"dropout": key, "pathdrop": key, "sampling": key})
        total, parts = compute_losses(cfg, out, batch, key)
        return total, parts
    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, total

for B in (1, 4):
    batch = make_batch(B)
    p2, o2, t = step(params, opt_state, batch, key)
    device_sync(t)
    params, opt_state = p2, o2
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, t = step(params, opt_state, batch, key)
    device_sync(t)
    dt = (time.perf_counter() - t0) / n
    print(f"train step B={B}: {dt*1000:.1f} ms  ({B/dt:.2f} couples/s)", flush=True)
