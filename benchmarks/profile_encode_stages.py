"""Sub-stage latency breakdown of DtAvodNet.encode_frame on the TPU.

Times (separately jitted, device-resident inputs, async-queue timing):
BEV rasterization, occupancy/anchor filtering, each tower, and the
full encode for reference — the difference is the RPN head + NMS tail.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu.config import cars_dt_tracking  # noqa: E402
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS  # noqa: E402
from dodt_tpu.models.dt_avod import DtAvodNet  # noqa: E402
from dodt_tpu.models.backbone import preprocess_image  # noqa: E402
from dodt_tpu.ops.voxel import bev_maps_from_points  # noqa: E402
from dodt_tpu.ops.anchors import integral_image_2d  # noqa: E402
from dodt_tpu.utils.metrics import device_sync  # noqa: E402

cfg = cars_dt_tracking()
cfg.dataset.max_points = 65536
model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)
rng = np.random.RandomState(0)
p = cfg.dataset.max_points
h, w = cfg.dataset.image_shape
pts = np.stack([rng.uniform(-40, 40, p), rng.uniform(-1, 2, p),
                rng.uniform(0, 70, p)], 1).astype(np.float32)
frame = {
    "points": jnp.asarray(pts[None]),
    "points_valid": jnp.ones((1, p), bool),
    "image": jnp.asarray(rng.uniform(0, 255, (1, h, w, 3))
                         .astype(np.float32)),
    "ground_plane": jnp.asarray(
        np.array([[0., -1., 0., 1.65]], np.float32)),
    "p2": jnp.asarray(np.array(
        [[[721.5, 0, 609.5, 44.9], [0, 721.5, 172.8, 0.2],
          [0, 0, 1., 0.003]]], np.float32)),
    "orig_image_shape": jnp.asarray(np.array([[375, 1242]], np.int32)),
}
batch_pair = {
    "points": jnp.stack([frame["points"], frame["points"]], 1),
    "points_valid": jnp.stack(
        [frame["points_valid"], frame["points_valid"]], 1),
    "image": jnp.stack([frame["image"], frame["image"]], 1),
    "ground_plane": frame["ground_plane"], "p2": frame["p2"],
    "orig_image_shape": frame["orig_image_shape"],
}
key = jax.random.PRNGKey(0)
init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
variables = init_fn({"params": key, "dropout": key, "pathdrop": key},
                    batch_pair, train=False, mode="val")
params = variables["params"]
V = {"params": params}


def timeit(name, fn, n=30):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)


ku = cfg.dataset.kitti_utils
area = np.asarray(ku.area_extents, np.float32)
bg = ku.bev_generator

raster = jax.jit(jax.vmap(functools.partial(
    bev_maps_from_points, area_extents=area, voxel_size=ku.voxel_size,
    height_lo=bg.height_lo, height_hi=bg.height_hi,
    num_slices=bg.num_slices)))
maps = raster(frame["points"], frame["points_valid"],
              frame["ground_plane"])
timeit("bev_raster", lambda: raster(
    frame["points"], frame["points_valid"], frame["ground_plane"]))

integ = jax.jit(jax.vmap(integral_image_2d))
timeit("integral_occupancy", lambda: integ(maps.occupancy))

bev_tower = jax.jit(lambda v, x: model.apply(
    v, x, method=lambda mdl, x: mdl.bev_tower(x)))
timeit("bev_tower", lambda: bev_tower(V, maps.features))

img_in = preprocess_image(frame["image"])
img_tower = jax.jit(lambda v, x: model.apply(
    v, x, method=lambda mdl, x: mdl.img_tower(x)))
timeit("img_tower", lambda: img_tower(V, img_in))

enc = jax.jit(lambda v, b: model.apply(v, b,
                                       method=model.encode_frame))
timeit("encode_frame_total", lambda: enc(V, frame))

pair = jax.jit(lambda v, a, b: model.apply(v, a, b,
                                           method=model.pair_stage))
st = enc(V, frame)
timeit("pair_stage", lambda: pair(V, st, st))
