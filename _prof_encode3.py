import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dodt_tpu.config import cars_dt_tracking
from dodt_tpu.data.clusters import DEFAULT_CAR_CLUSTERS
from dodt_tpu.models.dt_avod import DtAvodNet
from dodt_tpu.utils.metrics import device_sync
from dodt_tpu.ops import boxes as box_ops, nms as nms_ops
from dodt_tpu.ops.projection import project_to_bev, project_to_image_space, reorder_boxes_yx
from dodt_tpu.ops.roi import crop_and_resize
from dodt_tpu.ops.dense_rpn import build_bev_lattice, dense_bev_rois, dense_empty_anchor_mask
from dodt_tpu.ops.anchors import tile_anchors_3d, integral_image_2d
from dodt_tpu.ops.voxel import bev_maps_from_points

cfg = cars_dt_tracking()
cfg.dataset.max_points = 65536
ku = cfg.dataset.kitti_utils
m = cfg.model
area = np.asarray(ku.area_extents, np.float32)
bev_extents = np.asarray(ku.bev_extents, np.float32)
bg = ku.bev_generator
model = DtAvodNet(cfg=cfg, cluster_sizes=DEFAULT_CAR_CLUSTERS)
rng = np.random.RandomState(0)
p = cfg.dataset.max_points
h, w = cfg.dataset.image_shape
pts = np.stack([rng.uniform(-40,40,p), rng.uniform(-1,2,p), rng.uniform(0,70,p)],1).astype(np.float32)
frame = {
    "points": jnp.asarray(pts[None]),
    "points_valid": jnp.ones((1, p), bool),
    "image": jnp.asarray(rng.uniform(0,255,(1,h,w,3)).astype(np.float32)),
    "ground_plane": jnp.asarray(np.array([[0.,-1.,0.,1.65]], np.float32)),
    "p2": jnp.asarray(np.array([[[721.5,0,609.5,44.9],[0,721.5,172.8,0.2],[0,0,1.,0.003]]], np.float32)),
    "orig_image_shape": jnp.asarray(np.array([[375,1242]], np.int32)),
}
bp = {
    "points": jnp.stack([frame["points"], frame["points"]], 1),
    "points_valid": jnp.stack([frame["points_valid"], frame["points_valid"]], 1),
    "image": jnp.stack([frame["image"], frame["image"]], 1),
    "ground_plane": frame["ground_plane"], "p2": frame["p2"],
    "orig_image_shape": frame["orig_image_shape"],
}
key = jax.random.PRNGKey(0)
variables = jax.jit(model.init, static_argnames=("train","mode"))(
    {"params": key, "dropout": key, "pathdrop": key}, bp, train=False, mode="val")

def timeit(name, fn, n=20):
    out = fn(); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    device_sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)

def encode_until(stage):
    def run(vars_, batch):
        def inner(self, batch):
            ku_ = ku; m_ = m
            maps = jax.vmap(functools.partial(bev_maps_from_points, area_extents=area,
                voxel_size=ku_.voxel_size, height_lo=bg.height_lo, height_hi=bg.height_hi,
                num_slices=bg.num_slices))(batch["points"], batch["points_valid"], batch["ground_plane"])
            sizes = np.asarray(DEFAULT_CAR_CLUSTERS, np.float32)
            anchors = jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
                tile_anchors_3d(area, sizes, ku_.anchor_strides, gp)))(batch["ground_plane"])
            lattice = build_bev_lattice(ku_.area_extents, ku_.anchor_strides, DEFAULT_CAR_CLUSTERS,
                                        ku_.bev_shape, ku_.voxel_size, m_.rpn.proposal_roi_crop_size)
            integral = jax.vmap(integral_image_2d)(maps.occupancy)
            anchor_valid = jax.vmap(lambda ii: dense_empty_anchor_mask(ii, lattice, ku_.density_threshold))(integral)
            if stage == "prep": return anchor_valid
            from dodt_tpu.models.backbone import preprocess_image
            bev_feats = self.bev_tower(maps.features).astype(jnp.float32)
            img_feats = self.img_tower(preprocess_image(batch["image"])).astype(jnp.float32)
            if stage == "towers": return bev_feats.sum() + img_feats.sum()
            bev_bottle = self.bev_bottleneck(bev_feats)
            img_bottle = self.img_bottleneck(img_feats)
            if stage == "bottles": return bev_bottle.sum() + img_bottle.sum()
            n_anchors = anchors.shape[1]
            _, img_norm = jax.vmap(project_to_image_space)(anchors, batch["p2"], batch["orig_image_shape"].astype(jnp.float32))
            crop = functools.partial(crop_and_resize, crop_size=m_.rpn.proposal_roi_crop_size)
            bev_rois = jax.vmap(lambda fm1: dense_bev_rois(fm1, lattice))(bev_bottle)
            img_rois = jax.vmap(crop)(img_bottle, reorder_boxes_yx(img_norm))
            fused = (bev_rois + img_rois) / 2.0
            if stage == "rois": return fused.sum()
            b = fused.shape[0]
            flat = fused.reshape(b * n_anchors, -1)
            objectness = self.rpn_cls(flat, False).reshape(b, n_anchors, 2)
            rpn_offsets = self.rpn_reg(flat, False).reshape(b, n_anchors, 6)
            if stage == "heads": return objectness.sum() + rpn_offsets.sum()
            proposals = box_ops.offset_to_anchor(anchors, rpn_offsets)
            _, prop_bev_norm = project_to_bev(proposals, bev_extents)
            obj_scores = jax.nn.softmax(objectness, axis=-1)[..., 1]
            obj_scores = jnp.where(anchor_valid, obj_scores, -1.0)
            k_rpn = m_.rpn.test_nms_size
            pre_k = min(4 * k_rpn, n_anchors)
            def rpn_nms(boxes_norm, scores, valid):
                cand_idx, cand_valid = nms_ops.top_k_prefilter(jnp.where(valid, scores, -1e9), valid, pre_k)
                keep, keep_valid = nms_ops.nms_bev(boxes_norm[cand_idx], scores[cand_idx], cand_valid, k_rpn, m_.rpn.nms_iou_thresh)
                return cand_idx[keep], keep_valid
            top_idx, top_valid = jax.vmap(rpn_nms)(prop_bev_norm, obj_scores, anchor_valid)
            top_anchors = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)
            return top_anchors.sum()
        return model.apply(vars_, batch, method=lambda self, b: inner(self, b))
    return jax.jit(run)

for st in ("prep", "towers", "bottles", "rois", "heads", "full"):
    f = encode_until(st)
    timeit(f"encode..{st}", lambda f=f: f({"params": variables["params"]}, frame))
