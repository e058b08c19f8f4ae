"""Cumulative bisect of the fused encode_frame + pair_stage jits.

The per-stage profilers (profile_encode_stages/_tail) time stages as
SEPARATE jits, each paying ~1 ms tunnel dispatch and losing XLA fusion
context; their sum under-explains the fused encode_frame time. Here we
jit cumulative prefixes of the real pipeline — each timing is one
dispatch — so consecutive differences are the true marginal cost of a
stage INSIDE the fusion. Feeds results_r03/roofline.md.
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
from dodt_tpu.models.dt_avod import (DtAvodNet, _resize_to,  # noqa: E402
                                     feature_fuse, encode_proposals,
                                     decode_predictions, OFFSETS_SIZE,
                                     ANGLE_SIZE)
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
V = {"params": variables["params"]}

ku = cfg.dataset.kitti_utils
m = cfg.model
area = np.asarray(ku.area_extents, np.float32)
bev_extents = np.asarray(ku.bev_extents, np.float32)
bg = ku.bev_generator
sizes = np.asarray(DEFAULT_CAR_CLUSTERS, np.float32)
lattice = build_bev_lattice(
    ku.area_extents, ku.anchor_strides, DEFAULT_CAR_CLUSTERS,
    ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)
assert lattice is not None


def encode_prefix(v, batch, stop):
    """Re-implementation of DtAvodNet.encode_frame with a static cutoff
    (`stop`): returns intermediate tensors so XLA cannot DCE the work."""
    raster = functools.partial(
        bev_maps_from_points, area_extents=area,
        voxel_size=ku.voxel_size, height_lo=bg.height_lo,
        height_hi=bg.height_hi, num_slices=bg.num_slices)
    maps = jax.vmap(raster)(batch["points"], batch["points_valid"],
                            batch["ground_plane"])
    if stop == "raster":
        return maps.features, maps.occupancy
    anchors = jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
        tile_anchors_3d(area, sizes, ku.anchor_strides, gp)))(
            batch["ground_plane"])
    integral = jax.vmap(integral_image_2d)(maps.occupancy)
    anchor_valid = jax.vmap(lambda ii: dense_empty_anchor_mask(
        ii, lattice, ku.density_threshold))(integral)
    if stop == "filter":
        return anchor_valid, anchors
    bev_feats = model.apply(
        v, maps.features,
        method=lambda mdl, x: mdl.bev_tower(x)).astype(jnp.float32)
    img_feats = model.apply(
        v, preprocess_image(batch["image"]),
        method=lambda mdl, x: mdl.img_tower(x)).astype(jnp.float32)
    if stop == "towers":
        return bev_feats, img_feats, anchor_valid
    bev_bottle = _resize_to(
        model.apply(v, bev_feats,
                    method=lambda mdl, x: mdl.bev_bottleneck(x)),
        ku.bev_shape)
    img_bottle = model.apply(
        v, img_feats, method=lambda mdl, x: mdl.img_bottleneck(x))
    bev_rois = jax.vmap(lambda fm1: dense_bev_rois(fm1, lattice))(
        bev_bottle)
    n_anchors = anchors.shape[1]
    b = bev_bottle.shape[0]
    bev_flat = bev_rois.reshape(b, n_anchors, -1)
    if stop == "rois":
        return bev_flat, img_bottle, anchor_valid
    pass1 = feature_fuse(bev_flat, jnp.zeros_like(bev_flat), 1.0, 0.0,
                         m.rpn.fusion_method)
    obj1 = model.apply(v, pass1.reshape(b * n_anchors, -1), False,
                       method=lambda mdl, x, t: mdl.rpn_cls(x, t))
    s1 = jax.nn.softmax(obj1.reshape(b, n_anchors, 2), axis=-1)[..., 1]
    s1 = jnp.where(anchor_valid, s1, -1e9)
    k_fuse = m.rpn.fusion_top_k
    _, cand_idx = jax.lax.approx_max_k(s1, k_fuse)
    if stop == "pass1":
        return cand_idx, bev_flat, img_bottle
    cand_valid = jnp.take_along_axis(anchor_valid, cand_idx, axis=1)
    cand_anchors = jnp.take_along_axis(anchors, cand_idx[..., None],
                                       axis=1)
    bev_sel = jnp.take_along_axis(bev_flat, cand_idx[..., None], axis=1)
    img_shapes = batch["orig_image_shape"].astype(jnp.float32)
    _, img_norm = jax.vmap(project_to_image_space)(
        cand_anchors, batch["p2"], img_shapes)
    crop = functools.partial(crop_and_resize,
                             crop_size=m.rpn.proposal_roi_crop_size)
    img_rois = jax.vmap(crop)(img_bottle, reorder_boxes_yx(img_norm))
    fused = feature_fuse(bev_sel, img_rois.reshape(b, k_fuse, -1),
                         1.0, 1.0, m.rpn.fusion_method)
    flat = fused.reshape(b * k_fuse, -1)
    objectness = model.apply(v, flat, False,
                             method=lambda mdl, x, t: mdl.rpn_cls(x, t)
                             ).reshape(b, k_fuse, 2)
    rpn_offsets = model.apply(v, flat, False,
                              method=lambda mdl, x, t: mdl.rpn_reg(x, t)
                              ).reshape(b, k_fuse, 6)
    if stop == "pass2":
        return objectness, rpn_offsets, cand_anchors
    proposals = box_ops.offset_to_anchor(cand_anchors, rpn_offsets)
    _, prop_bev_norm = project_to_bev(proposals, bev_extents)
    obj_scores = jax.nn.softmax(objectness, axis=-1)[..., 1]
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

    top_idx, top_valid = jax.vmap(rpn_nms)(prop_bev_norm, obj_scores,
                                           cand_valid)
    top_anchors = jnp.take_along_axis(proposals, top_idx[..., None],
                                      axis=1)
    return top_anchors, top_valid, bev_feats, img_feats


def timeit(name, fn, n=30):
    out = fn()
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


print("== cumulative encode prefixes (one dispatch each) ==")
prev = 0.0
for stop in ("raster", "filter", "towers", "rois", "pass1", "pass2",
             "nms"):
    fn = jax.jit(functools.partial(encode_prefix, stop=stop))
    t = timeit(f"cum_{stop}", lambda fn=fn: fn(V, frame))
    print(f"   marginal {stop}: {t - prev:.2f} ms", flush=True)
    prev = t

# pair_stage marginals: corr bottleneck vs full second stage
enc = jax.jit(lambda v, bt: model.apply(v, bt,
                                        method=model.encode_frame))
st = enc(V, frame)
jax.block_until_ready(st["top_anchors"])


def corr_only(v, sa, sb):
    return model.apply(
        v, sa["bev_feats"], sb["bev_feats"],
        method=lambda mdl, a, b: mdl.corr_bottleneck(a, b))


print("== pair stage ==")
t_corr = timeit("corr_bottleneck", lambda: jax.jit(corr_only)(V, st, st))
pair = jax.jit(lambda v, a, b: model.apply(v, a, b,
                                           method=model.pair_stage))
t_pair = timeit("pair_stage_total", lambda: pair(V, st, st))
print(f"   second stage (crops+trunk+corr head+decode+nms): "
      f"{t_pair - t_corr:.2f} ms", flush=True)
