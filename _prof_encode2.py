import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.models.dt_avod import DtAvodNet
from dodt_tpu.models.backbone import VggPyramid, pad_rows_for_stride, preprocess_image
from dodt_tpu.ops.voxel import bev_maps_from_points
from dodt_tpu.ops import boxes as box_ops
from dodt_tpu.ops.anchors import tile_anchors_3d, integral_image_2d
from dodt_tpu.ops.dense_rpn import build_bev_lattice, dense_bev_rois, dense_empty_anchor_mask
from dodt_tpu.ops.roi import crop_and_resize
from dodt_tpu.ops.projection import project_to_bev, project_to_image_space, reorder_boxes_yx
from dodt_tpu.utils.metrics import device_sync

cfg = cars_dt_tracking()
ku = cfg.dataset.kitti_utils
m = cfg.model
area = np.asarray(ku.area_extents, np.float32)
bev_extents = np.asarray(ku.bev_extents, np.float32)
bg = ku.bev_generator
rng = np.random.RandomState(0)
P = 65536

def timeit(name, fn, n=20):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

pts = jnp.asarray(np.stack([rng.uniform(-40,40,P), rng.uniform(-1,2,P), rng.uniform(0,70,P)],1).astype(np.float32))
pv = jnp.ones((P,), bool)
gp = jnp.asarray(np.array([0.,-1.,0.,1.65], np.float32))
lat = build_bev_lattice(ku.area_extents, ku.anchor_strides, DEFAULT_CAR_CLUSTERS, ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)

@jax.jit
def e1(pts, pv, gp):
    maps = bev_maps_from_points(pts, pv, gp, area_extents=area, voxel_size=ku.voxel_size,
                                height_lo=bg.height_lo, height_hi=bg.height_hi, num_slices=bg.num_slices)
    anchors = box_ops.box_3d_to_anchor(tile_anchors_3d(area, np.asarray(DEFAULT_CAR_CLUSTERS, np.float32), ku.anchor_strides, gp))
    ii = integral_image_2d(maps.occupancy)
    mask = dense_empty_anchor_mask(ii, lat, ku.density_threshold)
    return maps.features, anchors, mask
timeit("E1 rasterize+anchors+mask", lambda: e1(pts, pv, gp))
feats, anchors, mask = e1(pts, pv, gp)

bev_tower = VggPyramid(m.bev_extractor, dtype=jnp.bfloat16)
vb = jax.jit(bev_tower.init)(jax.random.PRNGKey(0), feats[None])
bfwd = jax.jit(bev_tower.apply)
timeit("E2a bev tower", lambda: bfwd(vb, feats[None]))
bev_feats = bfwd(vb, feats[None])

img_h, img_w = cfg.dataset.image_shape
img_tower = VggPyramid(m.img_extractor, dtype=jnp.bfloat16)
img_in = jnp.asarray(rng.rand(1, img_h, img_w, 3).astype(np.float32))
vi = jax.jit(img_tower.init)(jax.random.PRNGKey(0), img_in)
ifwd = jax.jit(img_tower.apply)
timeit("E2b img tower", lambda: ifwd(vi, img_in))
img_feats = ifwd(vi, img_in)

@jax.jit
def e3_bev(bb):
    return dense_bev_rois(bb[0], lat)
bb1 = jnp.asarray(rng.rand(1, 700, 800, 1).astype(np.float32))
timeit("E3a dense bev rois (C=1)", lambda: e3_bev(bb1))

p2 = jnp.asarray(np.array([[721.5,0,609.5,44.9],[0,721.5,172.8,0.2],[0,0,1.,0.003]], np.float32))
sh = jnp.asarray(np.array([375.,1242.], np.float32))
ib1 = jnp.asarray(rng.rand(img_h, img_w, 1).astype(np.float32))
@jax.jit
def e3_img(ib, anchors):
    _, img_norm = project_to_image_space(anchors, p2, sh)
    return crop_and_resize(ib, reorder_boxes_yx(img_norm), m.rpn.proposal_roi_crop_size)
timeit("E3b img crop 89600 (packed)", lambda: e3_img(ib1, anchors))
