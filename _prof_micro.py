import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.utils.metrics import device_sync
from dodt_tpu.ops import nms as nms_ops

rng = np.random.RandomState(0)
def timeit(name, fn, n=50):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

N, K = 89600, 8192
bev_flat = jnp.asarray(rng.rand(1, N, 9).astype(np.float32))
s1 = jnp.asarray(rng.rand(1, N).astype(np.float32))
f1 = jax.jit(lambda s: jax.lax.approx_max_k(s, K))
timeit("approx_max_k 8192/89600", lambda: f1(s1))
_, ci = f1(s1)
f2 = jax.jit(lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1))
timeit("take_along 8192 rows of 9", lambda: f2(bev_flat, ci))
anch = jnp.asarray(rng.rand(1, N, 6).astype(np.float32))
timeit("take_along 8192 rows of 6", lambda: f2(anch, ci))

# fast NMS on 1200
boxes = jnp.asarray(rng.rand(1200, 4).astype(np.float32))
boxes = boxes.at[:, 2:].add(1.0)
sc = jnp.asarray(rng.rand(1200).astype(np.float32))
v = jnp.ones(1200, bool)
f3 = jax.jit(lambda b, s, v: nms_ops.nms_bev_fast(b, s, v, 300, 0.8))
timeit("fast NMS 1200->300", lambda: f3(boxes, sc, v))

# dense rois current
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.ops.dense_rpn import build_bev_lattice, dense_bev_rois, dense_occupancy_counts
from dodt_tpu.ops.anchors import integral_image_2d
cfg = cars_dt_tracking()
ku = cfg.dataset.kitti_utils
lat = build_bev_lattice(ku.area_extents, ku.anchor_strides, DEFAULT_CAR_CLUSTERS, ku.bev_shape, ku.voxel_size, 3)
fm = jnp.asarray(rng.rand(700, 800, 1).astype(np.float32))
f4 = jax.jit(lambda x: dense_bev_rois(x, lat))
timeit("dense_bev_rois 700x800x1", lambda: f4(fm))
occ = jnp.asarray((rng.rand(800, 700) > 0.8).astype(np.float32))
ii = jax.jit(integral_image_2d)(occ)
f5 = jax.jit(lambda x: dense_occupancy_counts(x, lat))
timeit("dense_occupancy_counts", lambda: f5(ii))
f6 = jax.jit(integral_image_2d)
timeit("integral_image_2d 800x700", lambda: f6(occ))

# rasterize
from dodt_tpu.ops.voxel import bev_maps_from_points
bg = ku.bev_generator
P = 65536
pts = jnp.asarray(np.stack([rng.uniform(-40,40,P), rng.uniform(-1,2,P), rng.uniform(0,70,P)],1).astype(np.float32))
pv = jnp.ones((P,), bool)
gp = jnp.asarray(np.array([0.,-1.,0.,1.65], np.float32))
f7 = jax.jit(functools.partial(bev_maps_from_points, area_extents=np.asarray(ku.area_extents, np.float32),
    voxel_size=ku.voxel_size, height_lo=bg.height_lo, height_hi=bg.height_hi, num_slices=bg.num_slices))
timeit("rasterize", lambda: f7(pts, pv, gp))

# image crop 8192 anchors
from dodt_tpu.ops.roi import crop_and_resize
ib = jnp.asarray(rng.rand(180, 600, 1).astype(np.float32))
bx = jnp.asarray(np.clip(rng.rand(8192, 4), 0, 0.9).astype(np.float32))
bx = bx.at[:, 2:].set(bx[:, :2] + 0.05)
f8 = jax.jit(functools.partial(crop_and_resize, crop_size=3))
timeit("img crop 8192x3x3 packed", lambda: f8(ib, bx))
