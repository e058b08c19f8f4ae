import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.models.backbone import VggPyramid
from dodt_tpu.utils.metrics import device_sync

cfg = cars_dt_tracking()
rng = np.random.RandomState(0)
def timeit(name, fn, n=10):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)

# tower fwd+bwd
bev_tower = VggPyramid(cfg.model.bev_extractor, dtype=jnp.bfloat16)
x = jnp.asarray(rng.rand(2, 700, 800, 6).astype(np.float32))
v = jax.jit(bev_tower.init)(jax.random.PRNGKey(0), x)
g1 = jax.jit(jax.grad(lambda p, x: jnp.sum(bev_tower.apply(p, x).astype(jnp.float32)**2)))
timeit("bev tower x2 fwd+bwd", lambda: g1(v, x))

img_tower = VggPyramid(cfg.model.img_extractor, dtype=jnp.bfloat16)
xi = jnp.asarray(rng.rand(2, 360, 1200, 3).astype(np.float32))
vi = jax.jit(img_tower.init)(jax.random.PRNGKey(0), xi)
g2 = jax.jit(jax.grad(lambda p, x: jnp.sum(img_tower.apply(p, x).astype(jnp.float32)**2)))
timeit("img tower x2 fwd+bwd", lambda: g2(vi, xi))

# img crop backward (gather -> scatter-add)
from dodt_tpu.ops.roi import crop_and_resize
ib = jnp.asarray(rng.rand(360, 1200, 1).astype(np.float32))
bx = np.clip(rng.rand(89600, 4), 0, 0.9).astype(np.float32)
bx[:, 2:] = bx[:, :2] + 0.05
bx = jnp.asarray(bx)
g3 = jax.jit(jax.grad(lambda im: jnp.sum(crop_and_resize(im, bx, 3)**2)))
timeit("img crop 89600 fwd+bwd", lambda: g3(ib))

# dense rois backward
from dodt_tpu.ops.dense_rpn import build_bev_lattice, dense_bev_rois
ku = cfg.dataset.kitti_utils
lat = build_bev_lattice(ku.area_extents, ku.anchor_strides, DEFAULT_CAR_CLUSTERS, ku.bev_shape, ku.voxel_size, 3)
fm = jnp.asarray(rng.rand(700, 800, 1).astype(np.float32))
g4 = jax.jit(jax.grad(lambda m: jnp.sum(dense_bev_rois(m, lat)**2)))
timeit("dense rois fwd+bwd", lambda: g4(fm))

# corr blur backward
from dodt_tpu.ops.correlation import corr_bottleneck_blur
a = jnp.asarray(rng.rand(350, 400, 32).astype(np.float32))
b = jnp.asarray(rng.rand(350, 400, 32).astype(np.float32))
w = jnp.asarray(rng.rand(121, 1).astype(np.float32))
g5 = jax.jit(jax.grad(lambda a_, b_, w_: jnp.sum(corr_bottleneck_blur(a_, b_, w_, 5)**2), argnums=(0,1,2)))
timeit("corr blur half-res fwd+bwd", lambda: g5(a, b, w))
