"""Break down the RPN tail of encode_frame (everything after the
towers): bottlenecks, dense BEV ROI extraction + pass-1 ranking, image
ROI fusion pass, and NMS. Subtract ~1.15 ms tunnel dispatch overhead
from every number (see profile_encode_stages calibration).
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
from dodt_tpu.ops.anchors import (integral_image_2d,  # noqa: E402
                                  tile_anchors_3d)
from dodt_tpu.ops import boxes as box_ops  # noqa: E402
from dodt_tpu.ops import nms as nms_ops  # noqa: E402
from dodt_tpu.ops.dense_rpn import (build_bev_lattice,  # noqa: E402
                                    dense_bev_rois,
                                    dense_empty_anchor_mask)
from dodt_tpu.ops.projection import (project_to_bev,  # noqa: E402
                                     project_to_image_space,
                                     reorder_boxes_yx)
from dodt_tpu.ops.roi import crop_and_resize  # noqa: E402
from dodt_tpu.models.dt_avod import feature_fuse  # noqa: E402
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

ku = cfg.dataset.kitti_utils
m = cfg.model
area = np.asarray(ku.area_extents, np.float32)
bev_extents = np.asarray(ku.bev_extents, np.float32)
bg = ku.bev_generator


def timeit(name, fn, n=30):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)


# ---- precompute tower outputs once
raster = jax.jit(jax.vmap(functools.partial(
    bev_maps_from_points, area_extents=area, voxel_size=ku.voxel_size,
    height_lo=bg.height_lo, height_hi=bg.height_hi,
    num_slices=bg.num_slices)))
maps = raster(frame["points"], frame["points_valid"],
              frame["ground_plane"])
bev_feats = jax.jit(lambda v, x: model.apply(
    v, x, method=lambda mdl, x: mdl.bev_tower(x)))(V, maps.features)
img_feats = jax.jit(lambda v, x: model.apply(
    v, x, method=lambda mdl, x: mdl.img_tower(x)))(
        V, preprocess_image(frame["image"]))

sizes = np.asarray(DEFAULT_CAR_CLUSTERS, np.float32)
anchors = jax.jit(jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
    tile_anchors_3d(area, sizes, ku.anchor_strides, gp))))(
        frame["ground_plane"])
lattice = build_bev_lattice(
    ku.area_extents, ku.anchor_strides, DEFAULT_CAR_CLUSTERS,
    ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)
integral = jax.jit(jax.vmap(integral_image_2d))(maps.occupancy)
anchor_valid = jax.jit(jax.vmap(
    lambda ii: dense_empty_anchor_mask(
        ii, lattice, ku.density_threshold)))(integral)

from dodt_tpu.models.dt_avod import _resize_to  # noqa: E402

bottle = jax.jit(lambda v, bf, imf: (
    _resize_to(model.apply(v, bf,
                           method=lambda mdl, x: mdl.bev_bottleneck(x)),
               ku.bev_shape),
    model.apply(v, imf, method=lambda mdl, x: mdl.img_bottleneck(x))))
bev_bottle, img_bottle = bottle(V, bev_feats, img_feats)
timeit("bottlenecks(+resize)", lambda: bottle(V, bev_feats, img_feats))

rois = jax.jit(lambda bb: jax.vmap(
    lambda fm1: dense_bev_rois(fm1, lattice))(bb))
bev_rois = rois(bev_bottle)
timeit("dense_bev_rois", lambda: rois(bev_bottle))

n_anchors = anchors.shape[1]
b = 1
bev_flat = bev_rois.reshape(b, n_anchors, -1)


def pass1_fn(v, bev_flat, anchor_valid):
    pass1 = feature_fuse(bev_flat, jnp.zeros_like(bev_flat), 1.0, 0.0,
                         m.rpn.fusion_method)
    obj1 = model.apply(v, pass1.reshape(b * n_anchors, -1), False,
                       method=lambda mdl, x, t: mdl.rpn_cls(x, t))
    s1 = jax.nn.softmax(obj1.reshape(b, n_anchors, 2), axis=-1)[..., 1]
    s1 = jnp.where(anchor_valid, s1, -1e9)
    _, cand_idx = jax.lax.approx_max_k(s1, m.rpn.fusion_top_k)
    return cand_idx


pass1 = jax.jit(pass1_fn)
cand_idx = pass1(V, bev_flat, anchor_valid)
timeit("pass1_rank(90k anchors)", lambda: pass1(V, bev_flat,
                                                anchor_valid))

k_fuse = m.rpn.fusion_top_k
img_shapes = frame["orig_image_shape"].astype(jnp.float32)


def pass2_fn(v, bev_flat, cand_idx, anchor_valid):
    cand_valid = jnp.take_along_axis(anchor_valid, cand_idx, axis=1)
    cand_anchors = jnp.take_along_axis(anchors, cand_idx[..., None],
                                       axis=1)
    bev_sel = jnp.take_along_axis(bev_flat, cand_idx[..., None], axis=1)
    _, img_norm = jax.vmap(project_to_image_space)(
        cand_anchors, frame["p2"], img_shapes)
    crop = functools.partial(crop_and_resize,
                             crop_size=m.rpn.proposal_roi_crop_size)
    img_rois = jax.vmap(crop)(img_bottle, reorder_boxes_yx(img_norm))
    fused = feature_fuse(bev_sel, img_rois.reshape(b, k_fuse, -1),
                         1.0, 1.0, m.rpn.fusion_method)
    flat = fused.reshape(b * k_fuse, -1)
    obj = model.apply(v, flat, False,
                      method=lambda mdl, x, t: mdl.rpn_cls(x, t))
    off = model.apply(v, flat, False,
                      method=lambda mdl, x, t: mdl.rpn_reg(x, t))
    return (obj.reshape(b, k_fuse, 2), off.reshape(b, k_fuse, 6),
            cand_anchors, cand_valid)


pass2 = jax.jit(pass2_fn)
obj, off, cand_anchors, cand_valid = pass2(V, bev_flat, cand_idx,
                                           anchor_valid)
timeit("pass2_img_fuse(1200)", lambda: pass2(V, bev_flat, cand_idx,
                                             anchor_valid))


def nms_fn(obj, off, cand_anchors, cand_valid):
    proposals = box_ops.offset_to_anchor(cand_anchors, off)
    _, prop_bev_norm = project_to_bev(proposals, bev_extents)
    obj_scores = jax.nn.softmax(obj, axis=-1)[..., 1]
    obj_scores = jnp.where(cand_valid, obj_scores, -1.0)
    k_rpn = m.rpn.test_nms_size
    pre_k = min(4 * k_rpn, k_fuse)

    def rpn_nms(boxes_norm, scores, valid):
        ci, cv = nms_ops.top_k_prefilter(
            jnp.where(valid, scores, -1e9), valid, pre_k)
        keep, kv = nms_ops.nms_bev_mode(m.nms_mode)(
            boxes_norm[ci], scores[ci], cv, k_rpn,
            m.rpn.nms_iou_thresh)
        return ci[keep], kv

    return jax.vmap(rpn_nms)(prop_bev_norm, obj_scores, cand_valid)


nmsj = jax.jit(nms_fn)
r = nmsj(obj, off, cand_anchors, cand_valid)
timeit("rpn_nms(exact)", lambda: nmsj(obj, off, cand_anchors,
                                      cand_valid))
