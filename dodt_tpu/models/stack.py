"""Stack model: N-frame detection over an integrated BEV.

Parity targets: reference StackRpnModel (stack_rpn_model.py:25) and
StackAvodModel (stack_avod_model.py:24):
  * the integrated point cloud (all frames ego-aligned and combined)
    feeds a dedicated BEV tower; RPN runs ONCE on the integrated BEV
    bottleneck + frame-0 image (stack_rpn_model.py:349-460);
  * proposals are shared by all frames; each frame ROI-pools its own
    BEV/image features through shared-weight second-stage heads;
  * a correlation FC head over the concatenated first/last-frame ROI
    features predicts coexist logits + [dx, dz, dry] motion
    (corr_fc_layers.py:6-63, stack_avod_model.py:306-316).

TPU design: the integrated cloud is points.reshape(B, F*P, 3) — the
scatter rasterizer doesn't care about frame boundaries; all per-frame
tower/head invocations fold frames into the batch axis for weight
sharing.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dodt_tpu.config import PipelineConfig
from dodt_tpu.models.backbone import VggPyramid, preprocess_image
from dodt_tpu.models.dt_avod import (Bottleneck, FcTrunk, MlpHead,
                                     _path_drop_masks, _resize_to,
                                     bev_crop_fn)
from dodt_tpu.ops.dense_rpn import (build_bev_lattice, dense_bev_rois,
                                    dense_empty_anchor_mask)
from dodt_tpu.ops import boxes as box_ops
from dodt_tpu.ops import losses as loss_ops
from dodt_tpu.ops import nms as nms_ops
from dodt_tpu.ops import sampling
from dodt_tpu.ops.anchors import (empty_anchor_mask, integral_image_2d,
                                  tile_anchors_3d)
from dodt_tpu.ops.iou import aligned_iou_matrix
from dodt_tpu.ops.projection import (project_to_bev,
                                     project_to_image_space,
                                     reorder_boxes_yx)
from dodt_tpu.ops.roi import crop_and_resize
from dodt_tpu.ops.voxel import bev_maps_from_points


class StackCorrHead(nn.Module):
    """Concat paired ROI features -> 1x1 conv -> FC stacks ->
    (coexist logits (2), corr offsets (3))."""
    conv_channels: int = 256
    fc_sizes: Tuple[int, int] = (256, 256)
    keep_prob: float = 0.5

    @nn.compact
    def __call__(self, roi_first, roi_last, train: bool):
        x = jnp.concatenate([roi_first, roi_last], axis=-1)
        x = nn.Conv(self.conv_channels, (1, 1))(x)
        x = nn.relu(x)
        flat = x.reshape(x.shape[0], -1)
        cls = MlpHead(self.fc_sizes, 2, self.keep_prob,
                      name="corr_cls")(flat, train)
        off = MlpHead(self.fc_sizes, 3, self.keep_prob,
                      name="corr_off")(flat, train)
        return cls, off


class StackAvodNet(nn.Module):
    cfg: PipelineConfig
    cluster_sizes: Tuple[Tuple[float, float, float], ...]

    @property
    def num_classes(self) -> int:
        return len(self.cfg.dataset.classes) + 1

    @staticmethod
    def loss_builder():
        """Stack loss family (RPN on merged GT + per-frame AVOD +
        coexist CE + corr smooth-L1); picked up by the Trainer."""
        return compute_stack_losses

    def setup(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if m.tower_dtype == "bfloat16" \
            else jnp.float32
        # remat towers in training backward (see dt_avod.DtAvodNet.setup)
        Tower = (nn.remat(VggPyramid, static_argnums=(2,))
                 if m.remat_towers else VggPyramid)
        self.bev_tower = Tower(m.bev_extractor, dtype=dtype,
                               name="bev_vgg_pyr")
        self.int_bev_tower = Tower(m.bev_extractor, dtype=dtype,
                                   name="int_bev_vgg_pyr")
        self.img_tower = Tower(m.img_extractor, dtype=dtype,
                               name="img_vgg_pyr")
        self.bev_bottleneck = Bottleneck(m.rpn.bottleneck_channels,
                                         name="int_bev_bottleneck")
        self.img_bottleneck = Bottleneck(m.rpn.bottleneck_channels,
                                         name="img_bottleneck")
        # heads share the towers' compute dtype (bf16 on TPU)
        self.rpn_cls = MlpHead(m.rpn.cls_fc_sizes, 2, m.rpn.keep_prob,
                               dtype=dtype, name="rpn_cls")
        self.rpn_reg = MlpHead(m.rpn.reg_fc_sizes, 6, m.rpn.keep_prob,
                               dtype=dtype, name="rpn_reg")
        self.avod_trunk = FcTrunk(m.avod.fc_layer_sizes,
                                  (self.num_classes, 10, 2),
                                  m.avod.keep_prob, dtype=dtype,
                                  name="avod_fc")
        self.corr_head = StackCorrHead(fc_sizes=m.rpn.corr_fc_sizes,
                                       keep_prob=m.rpn.keep_prob,
                                       name="stack_corr")

    def __call__(self, batch: Dict[str, Any], train: bool,
                 mode: str = "train") -> Dict[str, Any]:
        cfg = self.cfg
        ku = cfg.dataset.kitti_utils
        m = cfg.model
        area = np.asarray(ku.area_extents, np.float32)
        bev_extents = np.asarray(ku.bev_extents, np.float32)
        bg = ku.bev_generator

        points = batch["points"]                   # (B, F, P, 3)
        b, f = points.shape[0], points.shape[1]

        rasterize = functools.partial(
            bev_maps_from_points, area_extents=area,
            voxel_size=ku.voxel_size, height_lo=bg.height_lo,
            height_hi=bg.height_hi, num_slices=bg.num_slices)

        # per-frame BEV maps
        gp_bf = jnp.broadcast_to(batch["ground_plane"][:, None, :],
                                 (b, f, 4))
        frame_maps = jax.vmap(jax.vmap(rasterize))(
            points, batch["points_valid"], gp_bf)
        # integrated BEV: rasterize the union of all frames' points
        int_maps = jax.vmap(rasterize)(
            points.reshape(b, -1, 3),
            batch["points_valid"].reshape(b, -1),
            batch["ground_plane"])

        # anchors on the integrated occupancy
        sizes = np.asarray(self.cluster_sizes, np.float32)
        anchors = jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
            tile_anchors_3d(area, sizes, ku.anchor_strides, gp)))(
                batch["ground_plane"])
        n_anchors = anchors.shape[1]
        lattice = build_bev_lattice(
            ku.area_extents, ku.anchor_strides, self.cluster_sizes,
            ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)
        integral = jax.vmap(integral_image_2d)(int_maps.occupancy)
        if lattice is not None:
            anchor_valid = jax.vmap(
                lambda ii: dense_empty_anchor_mask(
                    ii, lattice, ku.density_threshold))(integral)
        else:
            anchor_valid = jax.vmap(
                lambda ii, anc: empty_anchor_mask(
                    ii, anc, bev_extents, ku.voxel_size,
                    ku.density_threshold))(integral, anchors)  # (B, N)

        # towers (fused Pallas interior on eval paths only — see
        # dt_avod.DtAvodNet.__call__)
        fused = () if mode == "train" else None
        bev_feats = self.bev_tower(
            frame_maps.features.reshape(
                (b * f,) + frame_maps.features.shape[2:]), fused
        ).astype(jnp.float32)
        int_feats = self.int_bev_tower(
            int_maps.features, fused).astype(jnp.float32)
        img_flat = preprocess_image(
            batch["image"].reshape((b * f,) + batch["image"].shape[2:]))
        img_feats = self.img_tower(img_flat, fused).astype(jnp.float32)

        int_bottle = _resize_to(self.bev_bottleneck(int_feats),
                                ku.bev_shape)             # (B, H, W, 1)
        img_bottle = self.img_bottleneck(img_feats)       # (B*F, ...)
        img_bottle0 = img_bottle.reshape(
            (b, f) + img_bottle.shape[1:])[:, 0]

        p_img, p_bev = m.path_drop_probabilities
        if train and not (p_img == p_bev == 1.0):
            rnd = jax.random.uniform(self.make_rng("pathdrop"), (b, 3))
            img_mask, bev_mask = _path_drop_masks(rnd, p_img, p_bev)
        else:
            img_mask = jnp.ones((b,))
            bev_mask = jnp.ones((b,))
        fusion_div = img_mask + bev_mask

        # ---- RPN on integrated BEV + frame-0 image -----------------
        _, bev_norm = project_to_bev(anchors, bev_extents)
        img_shapes = batch["orig_image_shape"].astype(jnp.float32)
        _, img_norm = jax.vmap(project_to_image_space)(
            anchors, batch["p2"], img_shapes)
        # scatter-free VJP on gather crops in training, batch-aware
        # (see the crop_method comment in dt_avod.DtAvodNet);
        # config.train_crop_vjp forces one form for A/B profiling
        if mode != "train":
            crop_method = "auto"
        elif m.train_crop_vjp == "gather":
            crop_method = "auto"
        elif m.train_crop_vjp == "mmbwd":
            crop_method = "auto_train"
        else:  # batch_auto
            crop_method = "auto_train" if b > 1 else "auto"
        crop = functools.partial(crop_and_resize,
                                 crop_size=m.rpn.proposal_roi_crop_size,
                                 method=crop_method)
        if lattice is not None:
            bev_rois = jax.vmap(
                lambda fm1: dense_bev_rois(fm1, lattice))(int_bottle)
        else:
            bev_rois = jax.vmap(crop)(int_bottle,
                                      reorder_boxes_yx(bev_norm))
        img_rois = jax.vmap(crop)(img_bottle0,
                                  reorder_boxes_yx(img_norm))
        fused = (bev_rois * bev_mask[:, None, None, None, None] +
                 img_rois * img_mask[:, None, None, None, None]) / \
            fusion_div[:, None, None, None, None]
        flat = fused.reshape(b * n_anchors, -1)
        objectness = self.rpn_cls(flat, train).reshape(b, n_anchors, 2)
        rpn_offsets = self.rpn_reg(flat, train).reshape(b, n_anchors, 6)

        proposals = box_ops.offset_to_anchor(anchors, rpn_offsets)
        _, prop_bev_norm = project_to_bev(proposals, bev_extents)
        obj_scores = jax.nn.softmax(objectness, axis=-1)[..., 1]
        obj_scores = jnp.where(anchor_valid, obj_scores, -1.0)

        k_rpn = (m.rpn.train_nms_size if mode == "train"
                 else m.rpn.test_nms_size)
        pre_k = min(4 * k_rpn, n_anchors)

        def rpn_nms(boxes_norm, scores, valid):
            cand_idx, cand_valid = nms_ops.top_k_prefilter(
                jnp.where(valid, scores, -1e9), valid, pre_k)
            keep, keep_valid = nms_ops.nms_bev_mode(m.nms_mode)(
                boxes_norm[cand_idx], scores[cand_idx], cand_valid,
                k_rpn, m.rpn.nms_iou_thresh)
            return cand_idx[keep], keep_valid

        top_idx, top_valid = jax.vmap(rpn_nms)(
            prop_bev_norm, obj_scores, anchor_valid)       # (B, K)
        top_anchors = jnp.take_along_axis(proposals,
                                          top_idx[..., None], axis=1)
        top_scores = jnp.take_along_axis(obj_scores, top_idx, axis=1)

        # ---- second stage: shared proposals, per-frame features ----
        _, ss_bev_norm = project_to_bev(top_anchors, bev_extents)
        _, ss_img_norm = jax.vmap(project_to_image_space)(
            top_anchors, batch["p2"], img_shapes)
        ss_bev_yx = reorder_boxes_yx(ss_bev_norm)          # (B, K, 4)
        ss_img_yx = reorder_boxes_yx(ss_img_norm)

        crop2 = functools.partial(crop_and_resize,
                                  crop_size=m.avod.proposal_roi_crop_size,
                                  method=crop_method)
        bev_feats_bf = bev_feats.reshape((b, f) + bev_feats.shape[1:])
        img_feats_bf = img_feats.reshape((b, f) + img_feats.shape[1:])
        bev_crop2 = bev_crop_fn(m.avod.proposal_roi_crop_size,
                                m.avod.bev_roi_window, mode == "train",
                                bev_feats_bf.shape[2:],
                                train_method=crop_method)
        ss_bev_rois = jax.vmap(lambda fm, bx: jax.vmap(
            lambda fm1: bev_crop2(fm1, bx))(fm))(bev_feats_bf, ss_bev_yx)
        ss_img_rois = jax.vmap(lambda fm, bx: jax.vmap(
            lambda fm1: crop2(fm1, bx))(fm))(img_feats_bf, ss_img_yx)

        ss_fused = (ss_bev_rois * bev_mask[:, None, None, None, None,
                                           None] +
                    ss_img_rois * img_mask[:, None, None, None, None,
                                           None]) / \
            fusion_div[:, None, None, None, None, None]
        k = ss_fused.shape[2]
        cls_logits, box_offsets, angle_vecs = self.avod_trunk(
            ss_fused.reshape(b * f * k, -1), train)
        cls_logits = cls_logits.reshape(b, f, k, self.num_classes)
        box_offsets = box_offsets.reshape(b, f, k, 10)
        angle_vecs = angle_vecs.reshape(b, f, k, 2)

        # ---- stack correlation head (first vs last frame ROIs) -----
        roi_first = ss_fused[:, 0].reshape(
            (b * k,) + ss_fused.shape[3:])
        roi_last = ss_fused[:, -1].reshape(
            (b * k,) + ss_fused.shape[3:])
        coexist_logits, corr_offsets = self.corr_head(
            roi_first, roi_last, train)
        coexist_logits = coexist_logits.reshape(b, k, 2)
        corr_offsets = corr_offsets.reshape(b, k, 3)

        # ---- decode + per-frame NMS ---------------------------------
        prop_boxes_3d = box_ops.anchors_to_box_3d(top_anchors,
                                                  fix_lw=True)
        gp4 = batch["ground_plane"][:, None, :]
        prop_4c = box_ops.box_3d_to_box_4c(prop_boxes_3d, gp4)
        pred_4c = prop_4c[:, None] + box_offsets
        pred_boxes_3d = box_ops.box_4c_to_box_3d(
            pred_4c, batch["ground_plane"][:, None, None, :])
        pred_orient = box_ops.angle_vector_to_orientation(angle_vecs)

        pred_anchors = box_ops.box_3d_to_anchor(pred_boxes_3d,
                                                ortho_rotate=True)
        _, pred_bev_norm = project_to_bev(pred_anchors, bev_extents)
        final_scores_all = jnp.max(
            jax.nn.softmax(cls_logits, axis=-1)[..., 1:], axis=-1)

        def final_nms(boxes_norm, scores, valid):
            return nms_ops.nms_bev_mode(m.nms_mode)(boxes_norm, scores, valid,
                                   m.avod.nms_size,
                                   m.avod.nms_iou_thresh)

        f_idx, f_valid = jax.vmap(jax.vmap(
            final_nms, in_axes=(0, 0, None)))(
            pred_bev_norm, final_scores_all, top_valid)

        def gather2(x, idx):
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)),
                axis=2)

        out = {
            "anchors": anchors, "anchor_valid": anchor_valid,
            "objectness": objectness, "rpn_offsets": rpn_offsets,
            "top_anchors": top_anchors, "top_scores": top_scores,
            "top_valid": top_valid, "proposal_4c": prop_4c,
            "cls_logits": cls_logits, "box_offsets": box_offsets,
            "angle_vectors": angle_vecs,
            "coexist_logits": coexist_logits,
            "corr_pred": corr_offsets,
            "pred_boxes_3d": pred_boxes_3d,
            "final_indices": f_idx,
            "final_valid": f_valid &
            jnp.take_along_axis(top_valid[:, None].repeat(f, 1), f_idx,
                                axis=2),
            "final_boxes_3d": gather2(pred_boxes_3d, f_idx),
            "final_orientations": jnp.take_along_axis(pred_orient, f_idx,
                                                      axis=2),
            "final_cls_softmax": gather2(
                jax.nn.softmax(cls_logits, axis=-1), f_idx),
            "final_scores": jnp.take_along_axis(final_scores_all, f_idx,
                                                axis=2),
            "final_corr_offsets": jnp.take_along_axis(
                corr_offsets, f_idx[:, 0][..., None], axis=1),
            "final_coexist": jnp.take_along_axis(
                jax.nn.softmax(coexist_logits, axis=-1)[..., 1],
                f_idx[:, 0], axis=1),
        }
        return out


def compute_stack_losses(cfg: PipelineConfig, outputs: Dict[str, Any],
                         batch: Dict[str, Any], rng):
    """RPN (merged GT) + per-frame AVOD + coexist CE + corr smooth-L1
    (reference stack_avod_loss_builder.py:488 semantics)."""
    ku = cfg.dataset.kitti_utils
    mb = cfg.dataset.mini_batch
    lw = cfg.model.loss
    eps = cfg.model.label_smoothing_epsilon
    bev_extents = np.asarray(ku.bev_extents, np.float32)

    anchors = outputs["anchors"]
    b = anchors.shape[0]
    f = outputs["cls_logits"].shape[1]
    num_classes = outputs["cls_logits"].shape[-1]

    merged = batch["merged_boxes"]                 # (B, G, 7)
    merged_anchors = box_ops.box_3d_to_anchor(merged, ortho_rotate=True)
    merged_bev, _ = project_to_bev(merged_anchors, bev_extents)
    anchors_bev, _ = project_to_bev(anchors, bev_extents)

    rngs = jax.random.split(rng, b * (f + 1)).reshape(b, f + 1, 2)

    def rpn_loss_one(anchors_1, anchors_bev_1, valid_1, obj_1, off_1,
                     gt_bev_1, gt_anchor_1, gt_cls_1, gt_valid_1, key):
        tgt = sampling.assign_targets(anchors_bev_1, anchors_1,
                                      gt_bev_1, gt_anchor_1, gt_cls_1,
                                      gt_valid_1)
        max_iou = jnp.where(valid_1, tgt.max_iou, 0.0)
        sel, pos = sampling.sample_mini_batch(
            key, max_iou, mb.rpn_mini_batch_size,
            mb.rpn_neg_iou_range, mb.rpn_pos_iou_range)
        sel &= valid_1
        pos &= valid_1
        num_sel = jnp.maximum(jnp.sum(sel), 1)
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        onehot = jax.nn.one_hot(jnp.where(pos, 1, 0), 2) * \
            (1 - 2 * eps) + eps
        ce = -jnp.sum(onehot * jax.nn.log_softmax(obj_1, -1), -1)
        cls_loss = jnp.sum(ce * sel) * lw.cls_loss_weight / num_sel
        reg = loss_ops.weighted_smooth_l1(off_1, tgt.offsets,
                                          pos.astype(jnp.float32))
        return cls_loss, jnp.sum(reg) * lw.reg_loss_weight / num_pos

    rpn_cls, rpn_reg = jax.vmap(rpn_loss_one)(
        anchors, anchors_bev, outputs["anchor_valid"],
        outputs["objectness"], outputs["rpn_offsets"], merged_bev,
        merged_anchors, batch["merged_classes"], batch["merged_valid"],
        rngs[:, 0])

    # per-frame second stage + stack corr
    top_anchors = outputs["top_anchors"]
    top_bev, _ = project_to_bev(top_anchors, bev_extents)
    gt_anchors = box_ops.box_3d_to_anchor(batch["gt_boxes"],
                                          ortho_rotate=True)
    gt_bev, _ = project_to_bev(gt_anchors, bev_extents)

    def avod_loss_one(top_bev_1, top_valid_1, prop_4c_1, cls_1, off_1,
                      ang_1, gt_bev_1, gt_boxes_1, gt_cls_1,
                      gt_valid_1, gp_1, key):
        iou = jnp.where(gt_valid_1[None, :],
                        aligned_iou_matrix(top_bev_1, gt_bev_1), -1.0)
        gt_index = jnp.argmax(iou, axis=1)
        max_iou = jnp.where(top_valid_1,
                            jnp.maximum(jnp.max(iou, axis=1), 0.0), 0.0)
        sel, pos = sampling.sample_mini_batch(
            key, max_iou, mb.avod_mini_batch_size,
            mb.avod_neg_iou_range, mb.avod_pos_iou_range)
        sel &= top_valid_1
        pos &= top_valid_1
        num_sel = jnp.maximum(jnp.sum(sel), 1)
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        cls_gt = jnp.where(pos, gt_cls_1[gt_index], 0)
        onehot = jax.nn.one_hot(cls_gt, num_classes) * \
            (1 - 2 * eps) + eps
        ce = -jnp.sum(onehot * jax.nn.log_softmax(cls_1, -1), -1)
        cls_loss = jnp.sum(ce * sel) * lw.cls_loss_weight / num_sel
        gt_4c = box_ops.box_3d_to_box_4c(gt_boxes_1[gt_index],
                                         gp_1[None, :])
        reg = loss_ops.weighted_smooth_l1(off_1, gt_4c - prop_4c_1,
                                          pos.astype(jnp.float32))
        reg_loss = jnp.sum(reg) * lw.reg_loss_weight / num_pos
        ang_gt = box_ops.orientation_to_angle_vector(
            gt_boxes_1[gt_index][:, 6])
        ang = loss_ops.weighted_smooth_l1(ang_1, ang_gt,
                                          pos.astype(jnp.float32))
        ang_loss = jnp.sum(ang) * lw.ang_loss_weight / num_pos
        return cls_loss, reg_loss, ang_loss, pos, gt_index

    avod_cls, avod_reg, avod_ang, pos_bf, gtidx_bf = jax.vmap(jax.vmap(
        avod_loss_one,
        in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0, None, 0)))(
        top_bev, outputs["top_valid"], outputs["proposal_4c"],
        outputs["cls_logits"], outputs["box_offsets"],
        outputs["angle_vectors"], gt_bev, batch["gt_boxes"],
        batch["gt_classes"], batch["gt_valid"], batch["ground_plane"],
        rngs[:, 1:])

    # correlation (frame-0 positives matched to merged GT rows)
    def corr_loss_one(top_bev_1, top_valid_1, coexist_logits_1,
                      corr_pred_1, merged_bev_1, merged_valid_1,
                      coexist_gt_1, corr_gt_1):
        iou = jnp.where(merged_valid_1[None, :],
                        aligned_iou_matrix(top_bev_1, merged_bev_1),
                        -1.0)
        gt_index = jnp.argmax(iou, axis=1)
        pos = top_valid_1 & (jnp.max(iou, axis=1) > 0.5)
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        both = coexist_gt_1[gt_index] == 0.0
        onehot = jax.nn.one_hot(both.astype(jnp.int32), 2)
        ce = -jnp.sum(onehot *
                      jax.nn.log_softmax(coexist_logits_1, -1), -1)
        cls_loss = jnp.sum(ce * pos) * lw.cls_loss_weight / num_pos
        w = pos.astype(jnp.float32) * both.astype(jnp.float32)
        off = loss_ops.weighted_smooth_l1(corr_pred_1,
                                          corr_gt_1[gt_index], w)
        off_loss = jnp.sum(off) * lw.corr_loss_weight / \
            jnp.maximum(jnp.sum(w), 1)
        return cls_loss, off_loss

    coex_l, corr_l = jax.vmap(corr_loss_one)(
        top_bev, outputs["top_valid"], outputs["coexist_logits"],
        outputs["corr_pred"], merged_bev, batch["merged_valid"],
        batch["coexist"], batch["corr_offsets"])

    losses = {
        "rpn_cls": jnp.mean(rpn_cls), "rpn_reg": jnp.mean(rpn_reg),
        "avod_cls": jnp.mean(avod_cls), "avod_reg": jnp.mean(avod_reg),
        "avod_ang": jnp.mean(avod_ang),
        "coexist": jnp.mean(coex_l), "corr": jnp.mean(corr_l),
    }
    total = sum(losses.values())
    losses["total"] = total
    return total, losses
