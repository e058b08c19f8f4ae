"""DODT detector (single-frame AVOD + paired-frame DT) — Flax, fully
jit-able, statically shaped, batched.

Re-design of the reference models (rpn_model.py, avod_model.py,
dt_rpn_model.py, dt_avod_model.py): one functional pipeline that takes a
padded point-cloud/image batch and runs

  device BEV rasterization -> siamese VGG-pyramid towers -> 1x1
  bottlenecks -> all-anchor ROI scoring (masked, not gathered) -> RPN
  decode + fixed-capacity greedy NMS -> second-stage ROI fusion FC
  (box_4ca) -> BEV correlation (Pallas) -> corr-offset head -> final NMS

Siamese weight sharing across the frame axis is achieved by folding
frames into the batch for every parameterized module (the reference
uses TF scope.reuse_variables(), dt_rpn_model.py:282-322).

Losses are computed in `compute_losses` from the forward outputs
(mini-batch sampling + target assignment run on device, replacing the
reference's offline .npy caches).
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dodt_tpu.config import PipelineConfig
from dodt_tpu.models.backbone import (VggPyramid, pad_rows_for_stride,
                                      preprocess_image)
from dodt_tpu.ops import boxes as box_ops
from dodt_tpu.ops import losses as loss_ops
from dodt_tpu.ops import nms as nms_ops
from dodt_tpu.ops import sampling
from dodt_tpu.ops.iou import aligned_iou_matrix
from dodt_tpu.ops.anchors import (empty_anchor_mask, integral_image_2d,
                                  tile_anchors_3d)
from dodt_tpu.ops.dense_rpn import (build_bev_lattice, dense_bev_rois,
                                    dense_empty_anchor_mask)
from dodt_tpu.ops.projection import (project_to_bev,
                                     project_to_image_space,
                                     reorder_boxes_yx)
from dodt_tpu.ops.roi import crop_and_resize
from dodt_tpu.ops.roi_pallas import crop_and_resize_window
from dodt_tpu.ops.voxel import bev_maps_from_points


class MlpHead(nn.Module):
    """FC stack with dropout, final linear output (conv-as-FC heads in
    the reference, rpn_model.py:365-441 / fusion_fc_layers.py).

    `dtype` is the compute dtype (params stay f32): bf16 puts the FC
    matmuls on the MXU at full rate and halves their HBM traffic;
    outputs are cast back to f32 for decode/losses."""
    sizes: Tuple[int, ...]
    out_dim: int
    keep_prob: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        for i, s in enumerate(self.sizes):
            x = nn.Dense(s, name=f"fc{6 + i}", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(x)
        return nn.Dense(self.out_dim, name="out",
                        dtype=self.dtype)(x).astype(jnp.float32)


class FcTrunk(nn.Module):
    """Shared FC trunk + multiple linear output branches. Computes in
    `dtype` (see MlpHead), emits f32."""
    sizes: Tuple[int, ...]
    out_dims: Tuple[int, ...]
    keep_prob: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        for i, s in enumerate(self.sizes):
            x = nn.Dense(s, name=f"fc{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(x)
        return tuple(nn.Dense(d, name=f"out{i}",
                              dtype=self.dtype)(x).astype(jnp.float32)
                     for i, d in enumerate(self.out_dims))


def feature_fuse(a: jnp.ndarray, b: jnp.ndarray, wa, wb,
                 method: str) -> jnp.ndarray:
    """Masked two-branch feature fusion (reference
    avod_fc_layer_utils.feature_fusion:20, mean | concat | max).

    a, b: (..., D) features; wa, wb: broadcastable path-drop weights
    (0. or 1. per sample). Inputs are pre-scaled by their weights.
    """
    a = a * wa
    b = b * wb
    if method == "concat":
        return jnp.concatenate([a, b], axis=-1)
    if method == "max":
        return jnp.maximum(a, b)
    return (a + b) / jnp.maximum(wa + wb, 1.0)       # mean


class AvodTrunk(nn.Module):
    """Second-stage FC trunk over (bev, img) ROI features with
    early / late / deep fusion (reference fusion_fc_layers.py:136,
    183, 236) and mean / concat / max feature fusion, followed by
    linear output branches. Computes in `dtype` (bf16 on TPU), emits
    f32 (see MlpHead)."""
    sizes: Tuple[int, ...]
    out_dims: Tuple[int, ...]
    keep_prob: float = 0.5
    fusion_type: str = "early"
    fusion_method: str = "mean"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev, img, wb, wi, train: bool):
        bev = bev.astype(self.dtype)
        img = img.astype(self.dtype)
        wb = jnp.asarray(wb, self.dtype)
        wi = jnp.asarray(wi, self.dtype)
        nn_Dense = functools.partial(nn.Dense, dtype=self.dtype)
        drop = functools.partial(nn.Dropout, deterministic=not train)

        if self.fusion_type == "late":
            # separate per-modality stacks, fuse the last hiddens
            hb, hi = bev, img
            for i, s in enumerate(self.sizes):
                hb = drop(1.0 - self.keep_prob)(
                    nn.relu(nn_Dense(s, name=f"bev_fc{i}")(hb)))
                hi = drop(1.0 - self.keep_prob)(
                    nn.relu(nn_Dense(s, name=f"img_fc{i}")(hi)))
            h = feature_fuse(hb, hi, wb, wi, self.fusion_method)
        elif self.fusion_type == "deep":
            # fuse at every layer, each branch consumes the fusion
            hb, hi = bev * wb, img * wi
            for i, s in enumerate(self.sizes):
                h = feature_fuse(hb, hi, 1.0, 1.0, self.fusion_method) \
                    if i else feature_fuse(bev, img, wb, wi,
                                           self.fusion_method)
                hb = drop(1.0 - self.keep_prob)(
                    nn.relu(nn_Dense(s, name=f"bev_fc{i}")(h)))
                hi = drop(1.0 - self.keep_prob)(
                    nn.relu(nn_Dense(s, name=f"img_fc{i}")(h)))
            h = feature_fuse(hb, hi, 1.0, 1.0, self.fusion_method)
        else:                                        # early
            h = feature_fuse(bev, img, wb, wi, self.fusion_method)
            for i, s in enumerate(self.sizes):
                h = drop(1.0 - self.keep_prob)(
                    nn.relu(nn_Dense(s, name=f"fc{i}")(h)))
        return tuple(nn_Dense(d, name=f"out{i}")(h).astype(jnp.float32)
                     for i, d in enumerate(self.out_dims))


# box-representation output sizes (reference
# avod_fc_layer_utils.OFFSETS_OUTPUT_SIZE / ANG_VECS_OUTPUT_SIZE:3-17)
OFFSETS_SIZE = {"box_3d": 6, "box_8c": 24, "box_8co": 24,
                "box_4c": 10, "box_4ca": 10}
ANGLE_SIZE = {"box_3d": 2, "box_8c": 0, "box_8co": 0,
              "box_4c": 0, "box_4ca": 2}


def bev_crop_fn(crop_size: int, window: int, train: bool,
                map_shape: Tuple[int, ...],
                train_method: str = "auto_train"):
    """Second-stage BEV crop dispatch: the windowed Pallas form
    (ops/roi_pallas.py) at eval on an accelerator — BEV proposals are
    metric-bounded so every crop fits a static window — the general
    (differentiable) gather form in training and on CPU tests.
    `train_method` lets the caller pick the training VJP form
    (batch-aware: plain gather VJP at B=1, see the crop_method
    comment in DtAvodNet)."""
    c = map_shape[2] if len(map_shape) > 2 else 1
    use_window = (not train and window > 0
                  and map_shape[0] >= window and map_shape[1] >= window
                  # lane-alignment slack (roi_pallas.py): thin-channel
                  # maps need too coarse an x origin to fit the window
                  and 128 // math.gcd(c, 128) < window - crop_size
                  and jax.default_backend() != "cpu")
    if use_window:
        return functools.partial(crop_and_resize_window,
                                 crop_size=crop_size, window=window)
    return functools.partial(crop_and_resize, crop_size=crop_size,
                             method=train_method if train else "auto")


def encode_proposals(rep: str, prop_boxes_3d, top_anchors, gp4):
    """Proposal encoding in the regression representation."""
    if rep in ("box_4c", "box_4ca"):
        return box_ops.box_3d_to_box_4c(prop_boxes_3d, gp4)
    if rep in ("box_8c", "box_8co"):
        c = box_ops.box_3d_to_box_8c(prop_boxes_3d)
        return c.reshape(c.shape[:-2] + (24,))
    return top_anchors                               # box_3d


def decode_predictions(rep: str, prop_enc, box_offsets, angle_vecs,
                       gp4):
    """Apply predicted offsets in the chosen representation and return
    (pred_boxes_3d, pred_orientations)."""
    if rep in ("box_4c", "box_4ca"):
        boxes = box_ops.box_4c_to_box_3d(prop_enc + box_offsets, gp4)
    elif rep in ("box_8c", "box_8co"):
        pred_c = (prop_enc + box_offsets).reshape(
            prop_enc.shape[:-1] + (3, 8))
        boxes = box_ops.box_8c_to_box_3d(pred_c)
    else:                                            # box_3d
        pred_anchor = box_ops.offset_to_anchor(prop_enc, box_offsets)
        boxes = box_ops.anchors_to_box_3d(pred_anchor, fix_lw=True)
    if angle_vecs is not None:
        orient = box_ops.angle_vector_to_orientation(angle_vecs)
    else:
        orient = boxes[..., 6]
    return boxes, orient


class Bottleneck(nn.Module):
    """1x1 conv + norm + relu (rpn_model.py:251-267)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (1, 1))(x)
        x = nn.GroupNorm(num_groups=1)(x)
        return nn.relu(x)


class CorrBottleneck(nn.Module):
    """Fused correlation + 1x1 bottleneck + norm + relu.

    Takes the two frames' BEV feature maps (B, H, W, C) and returns
    (B, H, W, channels). On TPU the D^2 correlation volume is contracted
    with the bottleneck weights inside the Pallas kernel and never hits
    HBM (dt_rpn_model.py:324-345 equivalent, fused)."""
    channels: int = 1
    max_displacement: int = 5
    stride_2: int = 1

    @nn.compact
    def __call__(self, feat_a, feat_b):
        from dodt_tpu.ops.correlation import _disp_grid, corr_bottleneck
        _, d = _disp_grid(self.max_displacement, self.stride_2)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (d * d, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        x_cf = corr_bottleneck(feat_a, feat_b, kernel,
                               self.max_displacement, self.stride_2)
        x = jnp.moveaxis(x_cf, 1, -1) + bias     # (B, H, W, Cb)
        x = nn.GroupNorm(num_groups=1)(x)
        return nn.relu(x)


class DtAvodNet(nn.Module):
    """Paired-frame (or single-frame) AVOD with correlation head."""
    cfg: PipelineConfig
    cluster_sizes: Tuple[Tuple[float, float, float], ...]
    num_frames: int = 2

    @property
    def num_classes(self) -> int:
        return len(self.cfg.dataset.classes) + 1  # + background

    @staticmethod
    def loss_builder():
        """Loss function for this model family (used by the Trainer so
        every model trains with its own losses — reference analogue:
        avod/dt_avod loss builders selected per model)."""
        return compute_losses

    def setup(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if m.tower_dtype == "bfloat16" else jnp.float32
        bev_h, _ = self.cfg.dataset.kitti_utils.bev_shape
        # remat: tower-internal activations are recomputed in backward
        # instead of stored (config.ModelConfig.remat_towers); identity
        # for forward-only eval
        # static_argnums: the fused block-name tuple (arg 2; 0 = self)
        Tower = (nn.remat(VggPyramid, static_argnums=(2,))
                 if m.remat_towers else VggPyramid)
        self.bev_tower = Tower(m.bev_extractor, dtype=dtype,
                               pad_rows=pad_rows_for_stride(bev_h),
                               name="bev_vgg_pyr")
        img_h = self.cfg.dataset.image_shape[0]
        self.img_tower = Tower(m.img_extractor, dtype=dtype,
                               pad_rows=pad_rows_for_stride(img_h),
                               name="img_vgg_pyr")
        self.bev_bottleneck = Bottleneck(m.rpn.bottleneck_channels,
                                         name="bev_bottleneck")
        self.img_bottleneck = Bottleneck(m.rpn.bottleneck_channels,
                                         name="img_bottleneck")
        self.corr_bottleneck = CorrBottleneck(
            1, m.correlation.max_displacement, m.correlation.stride_2,
            name="bev_corr_bottleneck")
        # heads share the towers' compute dtype (bf16 on TPU: full-rate
        # MXU matmuls + half the HBM traffic; outputs are f32)
        self.rpn_cls = MlpHead(m.rpn.cls_fc_sizes, 2, m.rpn.keep_prob,
                               dtype=dtype, name="rpn_cls")
        self.rpn_reg = MlpHead(m.rpn.reg_fc_sizes, 6, m.rpn.keep_prob,
                               dtype=dtype, name="rpn_reg")
        # representation branch: cls / offsets / [angle vector]
        rep = m.avod.box_representation
        out_dims = (self.num_classes, OFFSETS_SIZE[rep])
        if ANGLE_SIZE[rep]:
            out_dims = out_dims + (ANGLE_SIZE[rep],)
        self.avod_trunk = AvodTrunk(m.avod.fc_layer_sizes, out_dims,
                                    m.avod.keep_prob,
                                    m.avod.fusion_type,
                                    m.avod.fusion_method,
                                    dtype=dtype,
                                    name="avod_fc")
        self.corr_head = MlpHead(m.avod.fc_layer_sizes, 3,
                                 m.avod.keep_prob, dtype=dtype,
                                 name="corr_fc")

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], train: bool,
                 mode: str = "train") -> Dict[str, Any]:
        """Full forward. batch arrays (B = couples, F = frames):

          points (B, F, P, 3), points_valid (B, F, P),
          image (B, F, Hi, Wi, 3), ground_plane (B, 4), p2 (B, 3, 4),
          orig_image_shape (B, 2)
          [optional labels] gt_boxes (B, F, G, 7), gt_classes (B, F, G),
          gt_valid (B, F, G), corr_offsets (B, G, 3),
          corr_coexist (B, G)
        """
        cfg = self.cfg
        ku = cfg.dataset.kitti_utils
        m = cfg.model
        bev_h, bev_w = ku.bev_shape
        area = np.asarray(ku.area_extents, np.float32)
        bev_extents = np.asarray(ku.bev_extents, np.float32)
        bg = ku.bev_generator

        points = batch["points"]
        b, f = points.shape[0], points.shape[1]

        # ---------------- BEV rasterization (on device) ----------------
        rasterize = functools.partial(
            bev_maps_from_points, area_extents=area,
            voxel_size=ku.voxel_size, height_lo=bg.height_lo,
            height_hi=bg.height_hi, num_slices=bg.num_slices)
        maps = jax.vmap(jax.vmap(
            lambda p, v, gp: rasterize(p, v, gp)))(
                points, batch["points_valid"],
                jnp.broadcast_to(batch["ground_plane"][:, None, :],
                                 (b, f, 4)))
        bev_input = maps.features                     # (B, F, H, W, S+1)
        occupancy = maps.occupancy                    # (B, F, X, Z)

        # ---------------- anchors ---------------------------------------
        sizes = np.asarray(self.cluster_sizes, np.float32)
        anchors = jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
            tile_anchors_3d(area, sizes, ku.anchor_strides, gp)))(
                batch["ground_plane"])                # (B, N, 6)
        n_anchors = anchors.shape[1]

        # dense lattice path (gather-free) when the anchor grid is an
        # exact pixel lattice of the BEV map (ops/dense_rpn.py)
        lattice = build_bev_lattice(
            ku.area_extents, ku.anchor_strides, self.cluster_sizes,
            ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)

        integral = jax.vmap(jax.vmap(integral_image_2d))(occupancy)
        if lattice is not None:
            anchor_valid = jax.vmap(jax.vmap(
                lambda ii: dense_empty_anchor_mask(
                    ii, lattice, ku.density_threshold)))(integral)
        else:
            anchor_valid = jax.vmap(jax.vmap(
                lambda ii, anc: empty_anchor_mask(
                    ii, anc, bev_extents, ku.voxel_size,
                    ku.density_threshold),
                in_axes=(0, None)))(integral, anchors)  # (B, F, N)

        # ---------------- towers ----------------------------------------
        bev_flat = bev_input.reshape((b * f,) + bev_input.shape[2:])
        img_flat = preprocess_image(
            batch["image"].reshape((b * f,) + batch["image"].shape[2:]))
        # fused Pallas conv-chain interior dispatches on eval paths
        # only (windowed-ROI precedent): its custom VJP replays the
        # XLA twin, so a train forward would pay Pallas + XLA
        fused = () if mode == "train" else None
        bev_feats = self.bev_tower(bev_flat, fused).astype(jnp.float32)
        img_feats = self.img_tower(img_flat, fused).astype(jnp.float32)
        # upsample the (1-ch) RPN bottleneck back to full BEV res so the
        # anchor lattice stays integer-periodic (decode_stride = 2)
        bev_bottle = _resize_to(self.bev_bottleneck(bev_feats),
                                (bev_h, bev_w))
        img_bottle = self.img_bottleneck(img_feats)

        # path drop (reference rpn_model.create_path_drop_masks:931)
        p_img, p_bev = m.path_drop_probabilities
        if train and not (p_img == p_bev == 1.0):
            rnd = jax.random.uniform(self.make_rng("pathdrop"), (b, 3))
            img_mask, bev_mask = _path_drop_masks(rnd, p_img, p_bev)
        else:
            img_mask = jnp.ones((b,))
            bev_mask = jnp.ones((b,))
        fusion_div = img_mask + bev_mask               # (B,)

        # ---------------- RPN -------------------------------------------
        # auto_train: gather forwards take the matmul form's
        # scatter-free VJP (the gather transpose's scatter-adds were
        # the superlinear backward term — results_r03/train_fwd_bwd.json).
        # Batch-aware: at B=1 the serialized scatter is still cheaper
        # than the matmul backward's rowred materialization
        # (bwd/couple 64.6 vs 80.8 ms; at B=4 it's 123.6 vs 63.1 —
        # train_fwd_bwd.json pre/post), so the plain gather VJP is kept
        # for single-couple steps.
        if mode != "train":
            crop_method = "auto"
        elif m.train_crop_vjp == "gather":
            crop_method = "auto"
        elif m.train_crop_vjp == "mmbwd":
            crop_method = "auto_train"
        else:  # batch_auto
            crop_method = "auto_train" if b > 1 else "auto"
        img_shapes = batch["orig_image_shape"].astype(jnp.float32)
        crop = functools.partial(crop_and_resize,
                                 crop_size=m.rpn.proposal_roi_crop_size,
                                 method=crop_method)
        # (B, F, N, s, s, C)
        if lattice is not None:
            bev_rois = jax.vmap(jax.vmap(
                lambda fm1: dense_bev_rois(fm1, lattice)))(
                    bev_bottle.reshape((b, f) + bev_bottle.shape[1:]))
        else:
            _, bev_norm = project_to_bev(anchors, bev_extents)
            bev_rois = jax.vmap(lambda fm, bx: jax.vmap(
                lambda fm1: crop(fm1, bx))(fm))(
                    bev_bottle.reshape((b, f) + bev_bottle.shape[1:]),
                    reorder_boxes_yx(bev_norm))
        bev_flat = bev_rois.reshape(b, f, n_anchors, -1)
        img_bf = img_bottle.reshape((b, f) + img_bottle.shape[1:])

        k_rpn = (m.rpn.train_nms_size if mode == "train"
                 else m.rpn.test_nms_size)
        k_fuse = m.rpn.fusion_top_k
        two_pass = bool(k_fuse) and k_fuse < n_anchors
        out = {"anchors": anchors, "anchor_valid": anchor_valid,
               "bev_input": bev_input,
               "img_mask": img_mask, "bev_mask": bev_mask}

        if two_pass:
            # Two-pass fusion (see encode_frame): rank all anchors by
            # the dense BEV-only head score, gather image ROIs only for
            # the top-K candidates. In train mode the RPN mini-batch is
            # sampled HERE (IoU-based, score-free) and appended to the
            # interest set, so the loss sees exactly-fused features for
            # every sampled anchor while image gathers drop ~10x.
            rank_feats = feature_fuse(
                jax.lax.stop_gradient(bev_flat),
                jnp.zeros_like(bev_flat),
                bev_mask[:, None, None, None], 0.0, m.rpn.fusion_method)
            obj1 = self.rpn_cls(
                rank_feats.reshape(b * f * n_anchors, -1),
                False).reshape(b, f, n_anchors, 2)
            # rank by the logit margin: strictly monotonic in
            # softmax[..., 1], skips a 90k-anchor exp/normalize
            s1 = jnp.where(anchor_valid, obj1[..., 1] - obj1[..., 0],
                           -1e9)
            _, cand_idx = jax.lax.approx_max_k(s1, k_fuse)   # (B,F,K)
            interest = cand_idx

            # Gate on the loss-computation mode, not the dropout flag:
            # the evaluator's val-health pass runs train-mode losses
            # with dropout off (train=False, mode="train") and still
            # needs the in-forward mini-batch on the two-pass route.
            sample_mb = mode == "train" and "gt_boxes" in batch
            if sample_mb:
                mbc = cfg.dataset.mini_batch
                s_mb = mbc.rpn_mini_batch_size
                gt_anchors_mb = box_ops.box_3d_to_anchor(
                    batch["gt_boxes"], ortho_rotate=True)
                gt_bev_mb, _ = project_to_bev(gt_anchors_mb,
                                              bev_extents)
                anchors_bev_mb, _ = project_to_bev(anchors, bev_extents)
                keys = jax.random.split(
                    self.make_rng("sampling"), b * f).reshape(b, f, 2)

                def mb_one(abev, anc, valid, gbev, ganc, gcls, gvalid,
                           key):
                    tgt = sampling.assign_targets(abev, anc, gbev,
                                                  ganc, gcls, gvalid)
                    miou = jnp.where(valid, tgt.max_iou, 0.0)
                    sel, pos = sampling.sample_mini_batch(
                        key, miou, s_mb, mbc.rpn_neg_iou_range,
                        mbc.rpn_pos_iou_range)
                    sel &= valid
                    pos &= valid
                    _, idx = jax.lax.top_k(sel.astype(jnp.float32),
                                           s_mb)
                    idx = idx.astype(jnp.int32)
                    return idx, sel[idx], pos[idx], tgt.offsets[idx]

                mb_idx, mb_sel, mb_pos, mb_offt = jax.vmap(jax.vmap(
                    mb_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0)),
                    in_axes=(0,) * 8)(
                    anchors_bev_mb, anchors, anchor_valid, gt_bev_mb,
                    gt_anchors_mb, batch["gt_classes"],
                    batch["gt_valid"], keys)
                interest = jnp.concatenate([cand_idx, mb_idx], axis=-1)

            mi = interest.shape[-1]
            int_anchors = jnp.take_along_axis(
                jnp.broadcast_to(anchors[:, None],
                                 (b, f, n_anchors, 6)),
                interest[..., None], axis=2)             # (B,F,M,6)
            int_valid = jnp.take_along_axis(anchor_valid, interest,
                                            axis=2)
            bev_sel = jnp.take_along_axis(bev_flat,
                                          interest[..., None], axis=2)
            _, int_img_norm = jax.vmap(
                lambda anc, p2, sh: project_to_image_space(
                    anc.reshape(-1, 6), p2, sh))(
                int_anchors.reshape(b, -1, 6), batch["p2"], img_shapes)
            int_img_yx = reorder_boxes_yx(
                int_img_norm.reshape(b, f, mi, 4))
            img_sel = jax.vmap(lambda fm, bx: jax.vmap(crop)(fm, bx))(
                img_bf, int_img_yx)
            fused = feature_fuse(bev_sel,
                                 img_sel.reshape(b, f, mi, -1),
                                 bev_mask[:, None, None, None],
                                 img_mask[:, None, None, None],
                                 m.rpn.fusion_method)
            flat = fused.reshape(b * f * mi, -1)
            objectness = self.rpn_cls(flat, train).reshape(b, f, mi, 2)
            rpn_offsets = self.rpn_reg(flat, train).reshape(b, f, mi, 6)
            proposals = box_ops.offset_to_anchor(int_anchors,
                                                 rpn_offsets)
            if sample_mb:
                out["rpn_mb"] = {
                    "objectness": objectness[:, :, k_fuse:],
                    "offsets": rpn_offsets[:, :, k_fuse:],
                    "sel": mb_sel, "pos": mb_pos,
                    "offset_targets": mb_offt,
                }
            # NMS over the candidate slice
            nms_prop = proposals[:, :, :k_fuse]
            nms_valid = int_valid[:, :, :k_fuse]
            _, prop_bev_norm = project_to_bev(nms_prop, bev_extents)
            obj_scores = jax.nn.softmax(
                objectness[:, :, :k_fuse], axis=-1)[..., 1]
            obj_scores = jnp.where(nms_valid, obj_scores, -1.0)
            pre_k = min(4 * k_rpn, k_fuse)
        else:
            _, img_norm = jax.vmap(
                lambda anc, p2, sh: project_to_image_space(
                    anc, p2, sh))(anchors, batch["p2"], img_shapes)
            img_rois = jax.vmap(lambda fm, bx: jax.vmap(
                lambda fm1: crop(fm1, bx))(fm))(
                    img_bf, reorder_boxes_yx(img_norm))
            fused = feature_fuse(
                bev_rois, img_rois,
                bev_mask[:, None, None, None, None, None],
                img_mask[:, None, None, None, None, None],
                m.rpn.fusion_method)
            flat = fused.reshape(b * f * n_anchors, -1)
            objectness = self.rpn_cls(flat, train).reshape(
                b, f, n_anchors, 2)
            rpn_offsets = self.rpn_reg(flat, train).reshape(
                b, f, n_anchors, 6)
            nms_prop = box_ops.offset_to_anchor(
                anchors[:, None], rpn_offsets)           # (B, F, N, 6)
            nms_valid = anchor_valid
            _, prop_bev_norm = project_to_bev(nms_prop, bev_extents)
            obj_scores = jax.nn.softmax(objectness, axis=-1)[..., 1]
            obj_scores = jnp.where(anchor_valid, obj_scores, -1.0)
            pre_k = min(4 * k_rpn, n_anchors)

        def rpn_nms(boxes_norm, scores, valid):
            cand_i, cand_v = nms_ops.top_k_prefilter(
                jnp.where(valid, scores, -1e9), valid, pre_k)
            cand_boxes = boxes_norm[cand_i]
            keep, keep_valid = nms_ops.nms_bev_mode(m.nms_mode)(
                cand_boxes, scores[cand_i], cand_v, k_rpn,
                m.rpn.nms_iou_thresh)
            return cand_i[keep], keep_valid

        top_idx, top_valid = jax.vmap(jax.vmap(rpn_nms))(
            prop_bev_norm, obj_scores, nms_valid)       # (B, F, K)
        top_anchors = jnp.take_along_axis(
            nms_prop, top_idx[..., None], axis=2)       # (B, F, K, 6)
        top_scores = jnp.take_along_axis(obj_scores, top_idx, axis=2)

        # ---------------- correlation (frame 0 vs frame 1) --------------
        out.update({
            "objectness": objectness, "rpn_offsets": rpn_offsets,
            "top_anchors": top_anchors, "top_scores": top_scores,
            "top_valid": top_valid,
        })

        bev_feats_bf = bev_feats.reshape((b, f) + bev_feats.shape[1:])
        if f == 2:
            corr_bottle = self.corr_bottleneck(
                bev_feats_bf[:, 0], bev_feats_bf[:, 1])  # (B, H, W, 1)
        else:
            corr_bottle = None

        # ---------------- second stage ----------------------------------
        exp = m.expand_proposals_xz
        if exp > 0.0:
            proj_in = top_anchors.at[..., 3].add(exp).at[..., 5].add(exp)
        else:
            proj_in = top_anchors
        _, ss_bev_norm = project_to_bev(proj_in, bev_extents)
        _, ss_img_norm = jax.vmap(
            lambda anc, p2, sh: project_to_image_space(
                anc.reshape(-1, 6), p2, sh))(
                proj_in.reshape(b, -1, 6), batch["p2"], img_shapes)
        ss_img_norm = ss_img_norm.reshape(b, f, -1, 4)
        ss_bev_yx = reorder_boxes_yx(ss_bev_norm)
        ss_img_yx = reorder_boxes_yx(ss_img_norm)

        crop2 = functools.partial(crop_and_resize,
                                  crop_size=m.avod.proposal_roi_crop_size,
                                  method=crop_method)
        bev_crop2 = bev_crop_fn(m.avod.proposal_roi_crop_size,
                                m.avod.bev_roi_window, mode == "train",
                                bev_feats_bf.shape[2:],
                                train_method=crop_method)
        ss_bev_rois = jax.vmap(jax.vmap(bev_crop2))(
            bev_feats_bf, ss_bev_yx)                    # (B, F, K, 7, 7, C)
        ss_img_rois = jax.vmap(jax.vmap(crop2))(
            img_feats.reshape((b, f) + img_feats.shape[1:]), ss_img_yx)

        k = ss_bev_rois.shape[2]
        rep = m.avod.box_representation
        wb = jnp.repeat(bev_mask, f * k)[:, None]
        wi = jnp.repeat(img_mask, f * k)[:, None]
        branch = self.avod_trunk(ss_bev_rois.reshape(b * f * k, -1),
                                 ss_img_rois.reshape(b * f * k, -1),
                                 wb, wi, train)
        cls_logits = branch[0].reshape(b, f, k, self.num_classes)
        box_offsets = branch[1].reshape(b, f, k, OFFSETS_SIZE[rep])
        angle_vecs = (branch[2].reshape(b, f, k, 2)
                      if ANGLE_SIZE[rep] else None)

        # correlation head on frame-0 proposals
        if corr_bottle is not None:
            corr_rois = jax.vmap(crop2)(corr_bottle, ss_bev_yx[:, 0])
            corr_offsets = self.corr_head(
                corr_rois.reshape(b * k, -1), train).reshape(b, k, 3)
            out["corr_pred"] = corr_offsets

        # decode in the configured representation
        prop_boxes_3d = box_ops.anchors_to_box_3d(top_anchors, fix_lw=True)
        gp4 = batch["ground_plane"][:, None, None, :]
        prop_enc = encode_proposals(rep, prop_boxes_3d, top_anchors, gp4)
        pred_boxes_3d, pred_orientations = decode_predictions(
            rep, prop_enc, box_offsets, angle_vecs, gp4)

        # final NMS per frame on highest non-bkg score
        pred_anchors = box_ops.box_3d_to_anchor(pred_boxes_3d,
                                                ortho_rotate=True)
        _, pred_bev_norm = project_to_bev(pred_anchors, bev_extents)
        final_scores_all = jnp.max(
            jax.nn.softmax(cls_logits, axis=-1)[..., 1:], axis=-1)

        def final_nms(boxes_norm, scores, valid):
            keep, keep_valid = nms_ops.nms_bev_mode(m.nms_mode)(
                boxes_norm, scores, valid, m.avod.nms_size,
                m.avod.nms_iou_thresh)
            return keep, keep_valid

        f_idx, f_valid = jax.vmap(jax.vmap(final_nms))(
            pred_bev_norm, final_scores_all, top_valid)

        def gather2(x, idx):
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)),
                axis=2)

        out.update({
            "proposal_boxes_3d": prop_boxes_3d,
            "proposal_enc": prop_enc,
            "cls_logits": cls_logits,
            "box_offsets": box_offsets,
            "angle_vectors": angle_vecs,
            "pred_boxes_3d": pred_boxes_3d,
            "pred_orientations": pred_orientations,
            "final_indices": f_idx,
            "final_valid": f_valid & jnp.take_along_axis(top_valid, f_idx,
                                                         axis=2),
            "final_boxes_3d": gather2(pred_boxes_3d, f_idx),
            "final_orientations": jnp.take_along_axis(
                pred_orientations, f_idx, axis=2),
            "final_cls_softmax": gather2(
                jax.nn.softmax(cls_logits, axis=-1), f_idx),
            "final_scores": jnp.take_along_axis(final_scores_all, f_idx,
                                                axis=2),
        })
        if corr_bottle is not None:
            out["final_corr_offsets"] = jnp.take_along_axis(
                out["corr_pred"], f_idx[:, 0][..., None], axis=1)
        return out


    # ------------------------------------------------------------------
    # Streaming interface: per-frame encode + pair stage. Keeps frame-t
    # tower features and proposals resident on device so only the NEW
    # frame is encoded per step (north-star requirement, SURVEY.md
    # section 7 stage 8; replaces run_inference_by_one's full-pair
    # recompute). Mirrors __call__'s math in eval mode (no path drop /
    # dropout); the equivalence is pinned by tests/test_streaming.py.
    # ------------------------------------------------------------------

    def encode_frame(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Encode ONE frame (batch axis 1): towers + RPN proposals.

        batch: points (1, P, 3), points_valid (1, P),
               image (1, Hi, Wi, 3), ground_plane (1, 4), p2 (1, 3, 4),
               orig_image_shape (1, 2).
        Returns a FrameState dict of device arrays.
        """
        cfg = self.cfg
        ku = cfg.dataset.kitti_utils
        m = cfg.model
        area = np.asarray(ku.area_extents, np.float32)
        bev_extents = np.asarray(ku.bev_extents, np.float32)
        bg = ku.bev_generator

        maps = jax.vmap(functools.partial(
            bev_maps_from_points, area_extents=area,
            voxel_size=ku.voxel_size, height_lo=bg.height_lo,
            height_hi=bg.height_hi, num_slices=bg.num_slices))(
            batch["points"], batch["points_valid"],
            batch["ground_plane"])

        sizes = np.asarray(self.cluster_sizes, np.float32)
        anchors = jax.vmap(lambda gp: box_ops.box_3d_to_anchor(
            tile_anchors_3d(area, sizes, ku.anchor_strides, gp)))(
                batch["ground_plane"])
        lattice = build_bev_lattice(
            ku.area_extents, ku.anchor_strides, self.cluster_sizes,
            ku.bev_shape, ku.voxel_size, m.rpn.proposal_roi_crop_size)
        integral = jax.vmap(integral_image_2d)(maps.occupancy)
        if lattice is not None:
            anchor_valid = jax.vmap(
                lambda ii: dense_empty_anchor_mask(
                    ii, lattice, ku.density_threshold))(integral)
        else:
            anchor_valid = jax.vmap(
                lambda ii, anc: empty_anchor_mask(
                    ii, anc, bev_extents, ku.voxel_size,
                    ku.density_threshold))(integral, anchors)

        bev_feats = self.bev_tower(maps.features).astype(jnp.float32)
        img_feats = self.img_tower(
            preprocess_image(batch["image"])).astype(jnp.float32)
        bev_bottle = _resize_to(self.bev_bottleneck(bev_feats),
                                ku.bev_shape)
        img_bottle = self.img_bottleneck(img_feats)

        n_anchors = anchors.shape[1]
        b = bev_bottle.shape[0]
        img_shapes = batch["orig_image_shape"].astype(jnp.float32)
        crop = functools.partial(crop_and_resize,
                                 crop_size=m.rpn.proposal_roi_crop_size)
        if lattice is not None:
            bev_rois = jax.vmap(
                lambda fm1: dense_bev_rois(fm1, lattice))(bev_bottle)
        else:
            _, bev_norm = project_to_bev(anchors, bev_extents)
            bev_rois = jax.vmap(crop)(bev_bottle,
                                      reorder_boxes_yx(bev_norm))
        bev_flat = bev_rois.reshape(b, n_anchors, -1)

        k_fuse = m.rpn.fusion_top_k
        if k_fuse and k_fuse < n_anchors:
            # two-pass fusion: rank anchors by the BEV-only head score
            # (dense, gather-free, image branch treated as path-dropped),
            # fuse image evidence only for the top-K candidates — image
            # ROI gathers drop ~10x.
            pass1 = feature_fuse(bev_flat, jnp.zeros_like(bev_flat),
                                 1.0, 0.0, m.rpn.fusion_method)
            obj1 = self.rpn_cls(pass1.reshape(b * n_anchors, -1),
                                False).reshape(b, n_anchors, 2)
            # logit-margin ranking (monotonic in softmax[..., 1])
            s1 = jnp.where(anchor_valid, obj1[..., 1] - obj1[..., 0],
                           -1e9)
            _, cand_idx = jax.lax.approx_max_k(s1, k_fuse)   # (B, K)
            cand_valid = jnp.take_along_axis(anchor_valid, cand_idx,
                                             axis=1)
            cand_anchors = jnp.take_along_axis(
                anchors, cand_idx[..., None], axis=1)
            bev_sel = jnp.take_along_axis(bev_flat, cand_idx[..., None],
                                          axis=1)
        else:
            k_fuse = n_anchors
            cand_valid = anchor_valid
            cand_anchors = anchors
            bev_sel = bev_flat

        _, img_norm = jax.vmap(project_to_image_space)(
            cand_anchors, batch["p2"], img_shapes)
        img_rois = jax.vmap(crop)(img_bottle, reorder_boxes_yx(img_norm))
        fused = feature_fuse(bev_sel, img_rois.reshape(b, k_fuse, -1),
                             1.0, 1.0, m.rpn.fusion_method)
        flat = fused.reshape(b * k_fuse, -1)
        objectness = self.rpn_cls(flat, False).reshape(b, k_fuse, 2)
        rpn_offsets = self.rpn_reg(flat, False).reshape(b, k_fuse, 6)

        proposals = box_ops.offset_to_anchor(cand_anchors, rpn_offsets)
        _, prop_bev_norm = project_to_bev(proposals, bev_extents)
        obj_scores = jax.nn.softmax(objectness, axis=-1)[..., 1]
        obj_scores = jnp.where(cand_valid, obj_scores, -1.0)
        k_rpn = m.rpn.test_nms_size
        pre_k = min(4 * k_rpn, k_fuse)

        def rpn_nms(boxes_norm, scores, valid):
            cand_idx, cand_valid = nms_ops.top_k_prefilter(
                jnp.where(valid, scores, -1e9), valid, pre_k)
            keep, keep_valid = nms_ops.nms_bev_mode(m.nms_mode)(
                boxes_norm[cand_idx], scores[cand_idx], cand_valid,
                k_rpn, m.rpn.nms_iou_thresh)
            return cand_idx[keep], keep_valid

        top_idx, top_valid = jax.vmap(rpn_nms)(
            prop_bev_norm, obj_scores, cand_valid)
        top_anchors = jnp.take_along_axis(proposals,
                                          top_idx[..., None], axis=1)
        return {
            "bev_feats": bev_feats, "img_feats": img_feats,
            "top_anchors": top_anchors, "top_valid": top_valid,
            "ground_plane": batch["ground_plane"], "p2": batch["p2"],
            "orig_image_shape": batch["orig_image_shape"],
        }

    def pair_stage(self, state_a: Dict[str, Any],
                   state_b: Dict[str, Any]) -> Dict[str, Any]:
        """Second stage over a cached frame pair (eval mode)."""
        cfg = self.cfg
        ku = cfg.dataset.kitti_utils
        m = cfg.model
        bev_extents = np.asarray(ku.bev_extents, np.float32)

        corr_bottle = self.corr_bottleneck(state_a["bev_feats"],
                                           state_b["bev_feats"])

        top_anchors = jnp.stack(
            [state_a["top_anchors"], state_b["top_anchors"]], axis=1)
        top_valid = jnp.stack(
            [state_a["top_valid"], state_b["top_valid"]], axis=1)
        b, f, k = top_anchors.shape[0:3]
        gp = state_a["ground_plane"]
        img_shapes = state_a["orig_image_shape"].astype(jnp.float32)

        _, ss_bev_norm = project_to_bev(top_anchors, bev_extents)
        _, ss_img_norm = jax.vmap(
            lambda anc, p2, sh: project_to_image_space(
                anc.reshape(-1, 6), p2, sh))(
                top_anchors.reshape(b, -1, 6), state_a["p2"],
                img_shapes)
        ss_img_norm = ss_img_norm.reshape(b, f, -1, 4)
        ss_bev_yx = reorder_boxes_yx(ss_bev_norm)
        ss_img_yx = reorder_boxes_yx(ss_img_norm)

        crop2 = functools.partial(crop_and_resize,
                                  crop_size=m.avod.proposal_roi_crop_size)
        bev_feats_bf = jnp.stack(
            [state_a["bev_feats"], state_b["bev_feats"]], axis=1)
        img_feats_bf = jnp.stack(
            [state_a["img_feats"], state_b["img_feats"]], axis=1)
        bev_crop2 = bev_crop_fn(m.avod.proposal_roi_crop_size,
                                m.avod.bev_roi_window, False,
                                bev_feats_bf.shape[2:])
        ss_bev_rois = jax.vmap(jax.vmap(bev_crop2))(bev_feats_bf,
                                                    ss_bev_yx)
        ss_img_rois = jax.vmap(jax.vmap(crop2))(img_feats_bf, ss_img_yx)

        rep = m.avod.box_representation
        branch = self.avod_trunk(ss_bev_rois.reshape(b * f * k, -1),
                                 ss_img_rois.reshape(b * f * k, -1),
                                 1.0, 1.0, False)
        cls_logits = branch[0].reshape(b, f, k, self.num_classes)
        box_offsets = branch[1].reshape(b, f, k, OFFSETS_SIZE[rep])
        angle_vecs = (branch[2].reshape(b, f, k, 2)
                      if ANGLE_SIZE[rep] else None)

        corr_rois = jax.vmap(crop2)(corr_bottle, ss_bev_yx[:, 0])
        corr_offsets = self.corr_head(
            corr_rois.reshape(b * k, -1), False).reshape(b, k, 3)

        prop_boxes_3d = box_ops.anchors_to_box_3d(top_anchors,
                                                  fix_lw=True)
        gp4 = gp[:, None, None, :]
        prop_enc = encode_proposals(rep, prop_boxes_3d, top_anchors,
                                    gp4)
        pred_boxes_3d, pred_orient = decode_predictions(
            rep, prop_enc, box_offsets, angle_vecs, gp4)

        pred_anchors = box_ops.box_3d_to_anchor(pred_boxes_3d,
                                                ortho_rotate=True)
        _, pred_bev_norm = project_to_bev(pred_anchors, bev_extents)
        final_scores_all = jnp.max(
            jax.nn.softmax(cls_logits, axis=-1)[..., 1:], axis=-1)

        def final_nms(boxes_norm, scores, valid):
            return nms_ops.nms_bev_mode(m.nms_mode)(boxes_norm, scores, valid,
                                   m.avod.nms_size,
                                   m.avod.nms_iou_thresh)

        f_idx, f_valid = jax.vmap(jax.vmap(final_nms))(
            pred_bev_norm, final_scores_all, top_valid)

        def gather2(x, idx):
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - idx.ndim)),
                axis=2)

        return {
            "final_boxes_3d": gather2(pred_boxes_3d, f_idx),
            "final_orientations": jnp.take_along_axis(pred_orient,
                                                      f_idx, axis=2),
            "final_cls_softmax": gather2(
                jax.nn.softmax(cls_logits, axis=-1), f_idx),
            "final_scores": jnp.take_along_axis(final_scores_all,
                                                f_idx, axis=2),
            "final_valid": f_valid & jnp.take_along_axis(top_valid,
                                                         f_idx, axis=2),
            "final_corr_offsets": jnp.take_along_axis(
                corr_offsets, f_idx[:, 0][..., None], axis=1),
        }


def _resize_to(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear-upsample (B, h, w, C) to (B, H, W, C) if needed."""
    if x.shape[1:3] == tuple(hw):
        return x
    return jax.image.resize(x, (x.shape[0],) + tuple(hw) + x.shape[3:],
                            method="bilinear")


def _path_drop_masks(rnd: jnp.ndarray, p_img: float, p_bev: float):
    """Per-sample path-drop coin flips (rpn_model.py:931-992)."""
    img_chance = (rnd[:, 0] < p_img).astype(jnp.float32)
    bev_chance = (rnd[:, 1] < p_bev).astype(jnp.float32)
    both_dead = (img_chance + bev_chance) < 0.5
    img_second = (rnd[:, 2] > 0.5).astype(jnp.float32)
    bev_second = 1.0 - img_second
    img_mask = jnp.where(both_dead, img_second, img_chance)
    bev_mask = jnp.where(both_dead, bev_second, bev_chance)
    return img_mask, bev_mask


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def compute_losses(cfg: PipelineConfig, outputs: Dict[str, Any],
                   batch: Dict[str, Any], rng) -> Tuple[jnp.ndarray, Dict]:
    """RPN + AVOD + correlation losses (reference rpn_model.loss:875,
    avod_loss_builder, dt_avod_loss_builder._get_correlation_loss:264).

    All mini-batch sampling and target assignment happens here, on
    device, per (sample, frame).
    """
    ku = cfg.dataset.kitti_utils
    mb = cfg.dataset.mini_batch
    lw = cfg.model.loss
    eps = cfg.model.label_smoothing_epsilon
    bev_extents = np.asarray(ku.bev_extents, np.float32)

    anchors = outputs["anchors"]                     # (B, N, 6)
    b, f = outputs["objectness"].shape[0:2]
    num_classes = outputs["cls_logits"].shape[-1]

    gt_boxes = batch["gt_boxes"]                     # (B, F, G, 7)
    gt_classes = batch["gt_classes"]
    gt_valid = batch["gt_valid"]

    # GT in (ortho) anchor form + BEV boxes
    gt_anchors = box_ops.box_3d_to_anchor(gt_boxes, ortho_rotate=True)
    gt_bev, _ = project_to_bev(gt_anchors, bev_extents)

    anchors_bev, _ = project_to_bev(anchors, bev_extents)

    rngs = jax.random.split(rng, b * f * 2).reshape(b, f, 2, 2)

    def rpn_loss_one(anchors_1, anchors_bev_1, valid_1, obj_1, off_1,
                     gt_bev_1, gt_anchor_1, gt_cls_1, gt_valid_1, key):
        tgt = sampling.assign_targets(anchors_bev_1, anchors_1, gt_bev_1,
                                      gt_anchor_1, gt_cls_1, gt_valid_1)
        max_iou = jnp.where(valid_1, tgt.max_iou, 0.0)
        sel, pos = sampling.sample_mini_batch(
            key, max_iou, mb.rpn_mini_batch_size,
            mb.rpn_neg_iou_range, mb.rpn_pos_iou_range)
        sel &= valid_1
        pos &= valid_1
        num_sel = jnp.maximum(jnp.sum(sel), 1)
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        obj_gt = jnp.where(pos, 1, 0)
        onehot = jax.nn.one_hot(obj_gt, 2) * (1 - 2 * eps) + eps
        logp = jax.nn.log_softmax(obj_1, axis=-1)
        ce = -jnp.sum(onehot * logp, axis=-1)
        cls_loss = jnp.sum(ce * sel) * lw.cls_loss_weight / num_sel
        reg = loss_ops.weighted_smooth_l1(off_1, tgt.offsets,
                                          pos.astype(jnp.float32))
        reg_loss = jnp.sum(reg) * lw.reg_loss_weight / num_pos
        return cls_loss, reg_loss

    if "rpn_mb" in outputs:
        # the mini-batch was sampled inside the forward (two-pass RPN):
        # head outputs/targets for exactly the sampled anchors
        mbout = outputs["rpn_mb"]
        selw = mbout["sel"].astype(jnp.float32)           # (B, F, S)
        posw = mbout["pos"].astype(jnp.float32)
        num_sel = jnp.maximum(selw.sum(-1), 1)
        num_pos = jnp.maximum(posw.sum(-1), 1)
        onehot = jax.nn.one_hot(
            mbout["pos"].astype(jnp.int32), 2) * (1 - 2 * eps) + eps
        logp = jax.nn.log_softmax(mbout["objectness"], axis=-1)
        ce = -jnp.sum(onehot * logp, axis=-1)
        rpn_cls = (ce * selw).sum(-1) * lw.cls_loss_weight / num_sel
        reg = loss_ops.weighted_smooth_l1(
            mbout["offsets"], mbout["offset_targets"], posw)
        rpn_reg = reg.sum(-1) * lw.reg_loss_weight / num_pos
    else:
        assert outputs["objectness"].shape[2] == anchors.shape[1], (
            "compute_losses on two-pass candidate outputs requires the "
            "in-forward mini-batch (mode='train' with gt in the batch)")
        rpn_cls, rpn_reg = jax.vmap(jax.vmap(
            rpn_loss_one,
            in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))(
            anchors, anchors_bev, outputs["anchor_valid"],
            outputs["objectness"], outputs["rpn_offsets"],
            gt_bev, gt_anchors, gt_classes, gt_valid, rngs[:, :, 0])

    # ---------------- second stage ------------------------------------
    rep = cfg.model.avod.box_representation
    top_anchors = outputs["top_anchors"]             # (B, F, K, 6)
    top_bev, _ = project_to_bev(top_anchors, bev_extents)
    prop_enc = outputs["proposal_enc"]
    gp = batch["ground_plane"]
    ang_pred = outputs["angle_vectors"]
    if ang_pred is None:
        ang_pred = jnp.zeros(top_anchors.shape[:3] + (2,))
    have_angle = float(bool(ANGLE_SIZE[rep]))

    def avod_loss_one(top_bev_1, top_valid_1, prop_enc_1, top_anchor_1,
                      cls_1, off_1,
                      ang_1, gt_bev_1, gt_boxes_1, gt_cls_1, gt_valid_1,
                      gp_1, corr_pred_1, corr_gt_1, coexist_1, key,
                      use_corr):
        iou = jnp.where(gt_valid_1[None, :],
                        aligned_iou_matrix(top_bev_1, gt_bev_1),
                        -1.0)
        gt_index = jnp.argmax(iou, axis=1)
        max_iou = jnp.maximum(jnp.max(iou, axis=1), 0.0)
        max_iou = jnp.where(top_valid_1, max_iou, 0.0)
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
        logp = jax.nn.log_softmax(cls_1, axis=-1)
        ce = -jnp.sum(onehot * logp, axis=-1)
        cls_loss = jnp.sum(ce * sel) * lw.cls_loss_weight / num_sel

        # regression targets in the configured representation
        gt_best = gt_boxes_1[gt_index]               # (K, 7)
        if rep in ("box_4c", "box_4ca"):
            gt_enc = box_ops.box_3d_to_box_4c(gt_best, gp_1[None, :])
        elif rep in ("box_8c", "box_8co"):
            c8 = box_ops.box_3d_to_box_8c(gt_best)
            gt_enc = c8.reshape(c8.shape[:-2] + (24,))
        else:                                        # box_3d
            gt_enc = box_ops.box_3d_to_anchor(gt_best, ortho_rotate=True)
        if rep == "box_3d":
            off_gt = box_ops.anchor_to_offset(prop_enc_1, gt_enc)
        else:
            off_gt = gt_enc - prop_enc_1
        reg = loss_ops.weighted_smooth_l1(off_1, off_gt,
                                          pos.astype(jnp.float32))
        reg_loss = jnp.sum(reg) * lw.reg_loss_weight / num_pos

        ang_gt = box_ops.orientation_to_angle_vector(gt_best[:, 6])
        ang = loss_ops.weighted_smooth_l1(ang_1, ang_gt,
                                          pos.astype(jnp.float32))
        ang_loss = (jnp.sum(ang) * lw.ang_loss_weight / num_pos
                    * have_angle)

        # correlation loss (frame 0 only): targets gathered by matched GT
        corr_gt_k = corr_gt_1[gt_index]              # (K, 3)
        corr_w = pos.astype(jnp.float32) * \
            coexist_1[gt_index].astype(jnp.float32) * use_corr
        corr = loss_ops.weighted_smooth_l1(corr_pred_1, corr_gt_k, corr_w)
        corr_loss = jnp.sum(corr) * lw.corr_loss_weight / \
            jnp.maximum(jnp.sum(corr_w), 1)
        return cls_loss, reg_loss, ang_loss, corr_loss

    has_corr = "corr_pred" in outputs
    if has_corr:
        corr_pred = outputs["corr_pred"]
        corr_pred_bf = jnp.stack([corr_pred, jnp.zeros_like(corr_pred)],
                                 axis=1)
        corr_gt = batch["corr_offsets"]
        coexist = batch["corr_coexist"]
    else:
        k = top_anchors.shape[2]
        corr_pred_bf = jnp.zeros((b, f, k, 3))
        g = gt_boxes.shape[2]
        corr_gt = jnp.zeros((b, g, 3))
        coexist = jnp.zeros((b, g), bool)
    use_corr = jnp.asarray([1.0, 0.0])[:f] if has_corr else jnp.zeros(f)

    avod_cls, avod_reg, avod_ang, corr_l = jax.vmap(jax.vmap(
        avod_loss_one,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, 0, None, None,
                 0, 0)),
        in_axes=(0,) * 11 + (0,) + (0, 0, 0, 0, None))(
        top_bev, outputs["top_valid"], prop_enc, top_anchors,
        outputs["cls_logits"],
        outputs["box_offsets"], ang_pred, gt_bev,
        gt_boxes, gt_classes, gt_valid, gp, corr_pred_bf, corr_gt,
        coexist, rngs[:, :, 1], use_corr)

    losses = {
        "rpn_cls": jnp.mean(rpn_cls), "rpn_reg": jnp.mean(rpn_reg),
        "avod_cls": jnp.mean(avod_cls), "avod_reg": jnp.mean(avod_reg),
        "avod_ang": jnp.mean(avod_ang), "corr": jnp.mean(corr_l),
    }
    total = sum(losses.values())
    losses["total"] = total
    return total, losses
