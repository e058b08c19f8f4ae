"""Evaluation runtime: checkpoint -> predictions -> AP + MOT metrics.

Replaces the reference DtEvaluator (dt_evaluator.py:38): per-checkpoint
loop over validation couples, KITTI-format prediction files per frame,
detection AP via eval/kitti_ap, tracking via the IoU tracker + MoI,
MOT metrics via tracking/mot_eval. `repeated_checkpoint_run` keeps the
reference's poll-the-checkpoint-dir concurrency model
(dt_evaluator.py:461-533).
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dodt_tpu.config import PipelineConfig
from dodt_tpu.data import kitti
from dodt_tpu.eval import decode as decode_lib
from dodt_tpu.eval import kitti_ap, kitti_writer
from dodt_tpu.runtime.trainer import CheckpointIO
from dodt_tpu.tracking import iou_tracker, moi, mot_eval


class Evaluator:
    def __init__(self, cfg: PipelineConfig, model, dataset,
                 ckpt_dir: str, output_dir: str, mesh=None):
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.ckpt = CheckpointIO(ckpt_dir)
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        # optional device mesh: the val couple axis is sharded over
        # 'data' (the reference evaluator is strictly single-GPU,
        # dt_evaluator.py:233-365; eval dominates wall time in every
        # accuracy benchmark, and with params replicated the batched
        # loop data-parallelizes with zero code change inside the jit)
        self.mesh = mesh
        self._mesh_params = None
        self._apply = jax.jit(model.apply,
                              static_argnames=("train", "mode"))
        self._evaluated: set = set()
        self._oxts_cache: Dict = {}
        self._val_health_jit = None
        # MoI stride evaluation default (reference DtEvaluatorStride):
        # both the one-shot and the --repeat polling path evaluate
        # under the same protocol
        self.interpolate = cfg.dataset.data_stride > 1
        # best-effort build of the native AP evaluator (falls back to
        # the Python implementation when no toolchain is present)
        from dodt_tpu import native
        native.build()

    # ---------------------------------------------------------- core

    def _load(self, idx: int) -> dict:
        if hasattr(self.dataset, "load_stack"):
            return self.dataset.load_stack(idx, augs=())
        return self.dataset.load_couple(idx, augs=())

    def predict_couples(self, params, idxs: List[int]) -> List[Dict]:
        """Run the model on a BATCH of val couples (or N-frame stacks)
        through one jit dispatch; per couple, return detection dicts
        for the FIRST and LAST frame in frame-0 coordinates (the
        detection/tracking contract downstream — the reference
        StackEvaluator likewise scores the keyframe and uses the far
        frame for offsets/MoI).

        The reference evaluator loops a batch-1 feed_dict
        (dt_evaluator.py:233-365); batching the val loop is the TPU
        redesign (SURVEY §2.13 "on-device batching replacing batch-1").
        The batch is padded to cfg.eval.batch_size by repeating the
        last sample so the jit shape stays static; padded outputs are
        dropped."""
        bsz = max(self.cfg.eval.batch_size, 1)
        samples = [self._load(i) for i in idxs]
        target = max(bsz, len(samples))
        if self.mesh is not None:
            # the sharded couple axis must divide evenly over 'data'
            target += (-target) % self.mesh.shape["data"]
        padded = samples + [samples[-1]] * (target - len(samples))
        batch = {k: jnp.asarray(np.stack([s[k] for s in padded]))
                 for k in padded[0]
                 if isinstance(padded[0][k], np.ndarray)}
        if self.mesh is not None:
            from dodt_tpu.parallel import mesh as mesh_lib
            batch = mesh_lib.shard_batch(batch, self.mesh)
            params = self._replicated(params)
        out = self._apply({"params": params}, batch, train=False,
                          mode="val")
        # fetch ONLY the decoded final_* outputs: the full output dict
        # carries anchor-scale RPN tensors (90k objectness/anchors) —
        # MBs per couple that the val loop never reads, and host
        # fetches dominate eval wall time on remote-tunnel platforms
        out = jax.device_get({k: out[k] for k in (
            "final_boxes_3d", "final_orientations", "final_scores",
            "final_cls_softmax", "final_valid", "final_corr_offsets",
            "final_coexist")
            if k in out})
        thr = self.cfg.eval.kitti_score_threshold
        n_frames = out["final_boxes_3d"].shape[1]
        results = []
        for b, (idx, sample) in enumerate(zip(idxs, samples)):
            dets = []
            for f in (0, n_frames - 1):
                corr = (np.array(out["final_corr_offsets"][b])
                        if f == 0 and "final_corr_offsets" in out
                        else None)
                # learned coexist (stack model): P(exists in both
                # keyframes), indexed like the frame-0 final dets —
                # drives MoI birth/death and tracker early termination
                coex = (np.array(out["final_coexist"][b])
                        if f == 0 and "final_coexist" in out
                        else None)
                dets.append(decode_lib.outputs_to_detections(
                    np.array(out["final_boxes_3d"][b, f]),
                    np.array(out["final_orientations"][b, f]),
                    np.array(out["final_scores"][b, f]),
                    np.array(out["final_cls_softmax"][b, f]),
                    np.array(out["final_valid"][b, f]),
                    corr_offsets=corr, coexist=coex,
                    score_threshold=thr))
            results.append({"sample": sample, "dets": dets,
                            "couple": self.dataset.couples[idx]})
        return results

    def _replicated(self, params):
        """Params replicated over the mesh, cached per params object
        (one host->devices broadcast per checkpoint, not per batch)."""
        if self._mesh_params is None or \
                self._mesh_params[0] is not params:
            from dodt_tpu.parallel import mesh as mesh_lib
            placed = jax.device_put(params,
                                    mesh_lib.replicated(self.mesh))
            self._mesh_params = (params, placed)
        return self._mesh_params[1]

    def predict_couple(self, params, idx: int) -> Dict:
        """Single-couple convenience wrapper (streaming/infer paths).
        Uses the configured eval batch size (padding as needed)."""
        return self.predict_couples(params, [idx])[0]

    # --------------------------------------------- val health metrics

    def _val_health_apply(self):
        """Jitted val-split loss + proposal pass (reference
        save_proposal_losses_results / save_prediction_losses_results,
        dt_evaluator.py:764-810): train-mode heads without dropout or
        gradients, so mid-training detector health (val losses, RPN
        proposal recall) is visible per checkpoint."""
        if self._val_health_jit is None:
            from dodt_tpu.models import dt_avod as dt_avod_mod
            loss_builder = (self.model.loss_builder()
                            if hasattr(self.model, "loss_builder")
                            else dt_avod_mod.compute_losses)

            def fn(params, batch, rng):
                rngs = {"dropout": rng, "pathdrop": rng,
                        "sampling": rng}
                out = self.model.apply({"params": params}, batch,
                                       train=False, mode="train",
                                       rngs=rngs)
                total, losses = loss_builder(self.cfg, out, batch, rng)
                losses = dict(losses)
                losses["total"] = total
                return losses, out["top_anchors"], out["top_valid"]

            self._val_health_jit = jax.jit(fn)
        return self._val_health_jit

    def val_health(self, params, max_couples: Optional[int] = None
                   ) -> Dict:
        """Per-checkpoint val losses + RPN proposal recall (BEV rotated
        IoU of top proposals vs GT at 0.3/0.5)."""
        from dodt_tpu.ops import boxes as box_ops
        from dodt_tpu.utils.np_iou import rotated_iou_matrix

        fn = self._val_health_apply()
        rng = jax.random.PRNGKey(0)
        bsz = max(self.cfg.eval.batch_size, 1)
        n = len(self.dataset.couples)
        if max_couples is not None:
            n = min(n, max_couples)
        loss_sums: Dict[str, float] = defaultdict(float)
        hits = {0.3: 0, 0.5: 0}
        total_gt = 0
        for start in range(0, n, bsz):
            idxs = list(range(start, min(start + bsz, n)))
            samples = [self._load(i) for i in idxs]
            padded = samples + [samples[-1]] * (bsz - len(samples))
            batch = {k: jnp.asarray(np.stack([s[k] for s in padded]))
                     for k in padded[0]
                     if isinstance(padded[0][k], np.ndarray)}
            losses, top_anchors, top_valid = jax.device_get(
                fn(params, batch, rng))
            for k, v in losses.items():
                # chunk loss is a batch mean (padding duplicates the
                # last sample; the small skew only affects the final
                # partial chunk)
                loss_sums[k] += float(v) * len(idxs)
            props_all = np.asarray(box_ops.anchors_to_box_3d(
                jnp.asarray(top_anchors), fix_lw=True))
            for b, sample in enumerate(samples):
                props = props_all[b, 0][np.asarray(top_valid)[b, 0]]
                gt = sample["gt_boxes"][0][sample["gt_valid"][0]]
                total_gt += len(gt)
                if not len(props) or not len(gt):
                    continue
                best = rotated_iou_matrix(
                    gt[:, [0, 2, 3, 4, 6]],
                    props[:, [0, 2, 3, 4, 6]]).max(axis=1)
                for thr in hits:
                    hits[thr] += int(np.sum(best > thr))
        return {
            "val_losses": {k: v / max(n, 1)
                           for k, v in loss_sums.items()},
            "proposal_recall": {f"iou_{t}": hits[t] / max(total_gt, 1)
                                for t in sorted(hits)},
            "num_couples": n, "num_gt": total_gt,
        }

    def run_checkpoint_once(self, step: Optional[int] = None,
                            interpolate: Optional[bool] = None) -> Dict:
        """Evaluate one checkpoint. With interpolation (default: on
        whenever data_stride > 1, overridable per call or via
        `self.interpolate`) MoI fills the tau-1 non-keyframes per
        couple and writes per-frame files (reference
        DtEvaluatorStride)."""
        if interpolate is None:
            interpolate = self.interpolate
        params = self.ckpt.restore_params(
            step,
            prefer_ema=self.cfg.train.optimizer.use_moving_average)
        if params is None:
            raise FileNotFoundError("no checkpoint")
        step = step if step is not None else self.ckpt.latest_step()

        if not hasattr(self.dataset, "couples"):
            # single-frame detection dataset (reference evaluator.py):
            # detection AP only, no tracking axis
            return self._run_detection_only(params, step)

        pred_dir = os.path.join(self.output_dir,
                                f"predictions_{step}", "data")
        os.makedirs(pred_dir, exist_ok=True)
        # extended per-couple files carrying corr offsets + coexist so
        # offline MOT runs reconstruct the full in-memory contract
        # (reference dt_evaluator.py:1134-1259 writes these columns;
        # dt_tracking_eval.decode_tracking_file:80 re-reads them)
        couples_dir = os.path.join(self.output_dir,
                                   f"predictions_{step}", "couples")
        os.makedirs(couples_dir, exist_ok=True)

        # per-video collections for tracking
        video_dets: Dict[int, Dict[int, List]] = defaultdict(dict)
        video_img_size: Dict[int, tuple] = {}
        gts: List[kitti_ap.FrameGt] = []
        det_frames: List[kitti_ap.FrameDet] = []

        n = len(self.dataset.couples)
        bsz = max(self.cfg.eval.batch_size, 1)

        def chunks():
            for start in range(0, n, bsz):
                idxs = list(range(start, min(start + bsz, n)))
                yield from zip(idxs,
                               self.predict_couples(params, idxs))

        for idx, res in chunks():
            cp = self.dataset.couples[idx]
            dets0 = res["dets"][0]
            calib = self.dataset.calib(cp.video_id)
            img_size = (int(res["sample"]["orig_image_shape"][1]),
                        int(res["sample"]["orig_image_shape"][0]))
            tau = cp.frame_b - cp.frame_a
            for d in dets0:
                # predicted corr offsets span the couple's frame gap
                d["offsets_span"] = tau

            # ---- detection AP bookkeeping (frame 0 only, like
            # dt_evaluator.py:296-300)
            raw0 = self.dataset.raw_labels(cp.video_id, cp.frame_a)
            dc0 = np.array([t == "DontCare" for t in raw0.types], bool)
            gts.append(kitti_ap.FrameGt.from_labels(
                raw0.select(~dc0), dontcare=raw0.bbox_2d[dc0]))
            det_frames.append(self._frame_det(dets0, calib, img_size))

            # ---- KITTI txt files
            lines = self._kitti_lines(dets0, calib, img_size)
            kitti_writer.write_kitti_file(
                os.path.join(pred_dir,
                             f"{cp.video_id:02d}{cp.frame_a:04d}.txt"),
                lines)

            video_dets[cp.video_id][cp.frame_a] = dets0
            video_img_size[cp.video_id] = img_size

            # ---- far keyframe: the model emits frame-B boxes in
            # frame-A coordinates; recover them into frame-B's own
            # coordinates (reference recovery_coordinate,
            # evaluator_utils.py:401 via the num==2 branch of
            # interpolate_non_keyframe_predicitons:424) and store.
            # The next couple's own frame-A detections overwrite this
            # entry / file when present — this matters only for the
            # final keyframe of each video, which no couple covers as
            # frame A.
            dets_b = None
            if cp.frame_b > cp.frame_a:
                dets_b = self._recover_dets(
                    res["dets"][1], calib, cp.video_id, cp.frame_a,
                    cp.frame_b)
                kitti_writer.write_kitti_file(
                    os.path.join(
                        pred_dir,
                        f"{cp.video_id:02d}{cp.frame_b:04d}.txt"),
                    self._kitti_lines(dets_b, calib, img_size))
                video_dets[cp.video_id][cp.frame_b] = dets_b

            # extended couple file: keyframe dets with offsets/coexist
            by_frame = {cp.frame_a: dets0}
            if dets_b is not None:
                by_frame[cp.frame_b] = dets_b
            kitti_writer.write_kitti_file(
                os.path.join(couples_dir, f"{cp.name}.txt"),
                kitti_writer.couple_detections_to_lines(
                    by_frame, classes=self.cfg.dataset.classes))

            # ---- MoI: synthesize the tau-1 intermediate frames, then
            # recover each from frame-A coordinates into its own frame
            # (reference recovery loop, evaluator_utils.py:502-506)
            if interpolate and cp.frame_b > cp.frame_a + 1:
                frames = moi.interpolate_non_keyframes(
                    dets0, res["dets"][1], tau + 1,
                    self.cfg.eval.kitti_score_threshold)
                for off in range(1, tau):
                    frame_no = cp.frame_a + off
                    recovered = self._recover_dets(
                        frames[off], calib, cp.video_id, cp.frame_a,
                        frame_no)
                    lines = self._kitti_lines(recovered, calib,
                                              img_size)
                    kitti_writer.write_kitti_file(
                        os.path.join(
                            pred_dir,
                            f"{cp.video_id:02d}{frame_no:04d}.txt"),
                        lines)
                    video_dets[cp.video_id][frame_no] = recovered

        # ---- AP, per class (Car scored at min IoU 0.7, others at 0.5,
        # matching the official evaluator's CLASS_NAMES/MIN_OVERLAP)
        ap_per_class = {}
        for cls_name in self.cfg.dataset.classes:
            min_iou = 0.7 if cls_name == "Car" else 0.5
            ap_per_class[cls_name] = {
                name: kitti_ap.evaluate_ap(gts, det_frames, cls_name,
                                           metric, min_iou)
                for metric, name in (("image", "AP_2D"),
                                     ("ground", "AP_BEV"),
                                     ("3d", "AP_3D"))}
        ap = ap_per_class[self.cfg.dataset.classes[0]]

        # ---- second pass at min IoU 0.5 for every class, mirroring
        # the reference's evaluate_object_3d_offline_05_iou run
        # (scripts/offline_eval/all_eval.sh executes both binaries).
        # Non-Car classes are already scored at 0.5 in the first pass —
        # reuse those results instead of recomputing.
        ap_05_per_class = {}
        for cls_name in self.cfg.dataset.classes:
            if cls_name != "Car":
                ap_05_per_class[cls_name] = ap_per_class[cls_name]
                continue
            ap_05_per_class[cls_name] = {
                name: kitti_ap.evaluate_ap(gts, det_frames, cls_name,
                                           metric, 0.5)
                for metric, name in (("image", "AP_2D"),
                                     ("ground", "AP_BEV"),
                                     ("3d", "AP_3D"))}

        # ---- tracking
        mot = self._run_tracking(video_dets, video_img_size)

        results = {"step": int(step), "ap": ap,
                   "ap_per_class": ap_per_class,
                   "ap_05_per_class": ap_05_per_class, "mot": mot}

        # ---- val health: per-checkpoint val losses + proposal recall
        # (reference dt_evaluator.py:764-810)
        if self.cfg.eval.val_health:
            results["val_health"] = self.val_health(params)
        with open(os.path.join(self.output_dir,
                               f"results_{step}.json"), "w") as f:
            json.dump(results, f, indent=2)
        self._evaluated.add(int(step))
        return results

    def _run_detection_only(self, params, step) -> Dict:
        """Single-frame evaluation over KittiDataset samples (the
        reference's original AVOD evaluator loop, evaluator.py):
        per-sample KITTI txt + official-protocol AP, no MOT."""
        from dodt_tpu.data import kitti as kitti_io

        pred_dir = os.path.join(self.output_dir,
                                f"predictions_{step}", "data")
        os.makedirs(pred_dir, exist_ok=True)
        thr = self.cfg.eval.kitti_score_threshold
        gts: List[kitti_ap.FrameGt] = []
        det_frames: List[kitti_ap.FrameDet] = []

        names = list(self.dataset.sample_names)
        bsz = max(self.cfg.eval.batch_size, 1)

        def batched_dets():
            for start in range(0, len(names), bsz):
                idxs = range(start, min(start + bsz, len(names)))
                samples = [self.dataset.load_sample(i, augs=())
                           for i in idxs]
                padded = samples + [samples[-1]] * (bsz - len(samples))
                batch = {k: jnp.asarray(np.stack([s[k] for s in padded]))
                         for k in padded[0]
                         if isinstance(padded[0][k], np.ndarray)}
                raw_out = self._apply(
                    {"params": params}, batch, train=False, mode="val")
                # selective fetch, same rationale as predict_couples
                out = jax.device_get({k: raw_out[k] for k in (
                    "final_boxes_3d", "final_orientations",
                    "final_scores", "final_cls_softmax", "final_valid")
                    if k in raw_out})
                for b, sample in enumerate(samples):
                    yield sample, decode_lib.outputs_to_detections(
                        np.array(out["final_boxes_3d"][b, 0]),
                        np.array(out["final_orientations"][b, 0]),
                        np.array(out["final_scores"][b, 0]),
                        np.array(out["final_cls_softmax"][b, 0]),
                        np.array(out["final_valid"][b, 0]),
                        score_threshold=thr)

        for name, (sample, dets) in zip(names, batched_dets()):
            calib = kitti_io.read_calibration(self.dataset.calib_dir,
                                              name)
            img_size = (int(sample["orig_image_shape"][1]),
                        int(sample["orig_image_shape"][0]))
            raw = kitti_io.read_labels(self.dataset.label_dir, name,
                                       keep_dontcare=True)
            dc_mask = np.array([t == "DontCare" for t in raw.types],
                               bool)
            gts.append(kitti_ap.FrameGt.from_labels(
                raw.select(~dc_mask), dontcare=raw.bbox_2d[dc_mask]))
            det_frames.append(self._frame_det(dets, calib, img_size))
            kitti_writer.write_kitti_file(
                os.path.join(pred_dir, f"{name}.txt"),
                self._kitti_lines(dets, calib, img_size))

        ap_per_class = {}
        for cls_name in self.cfg.dataset.classes:
            min_iou = 0.7 if cls_name == "Car" else 0.5
            ap_per_class[cls_name] = {
                metric_name: kitti_ap.evaluate_ap(
                    gts, det_frames, cls_name, metric, min_iou)
                for metric, metric_name in (("image", "AP_2D"),
                                            ("ground", "AP_BEV"),
                                            ("3d", "AP_3D"))}
        # 0.5-IoU second pass (reference all_eval.sh runs both the 0.7
        # and 05_iou binaries for single-frame evaluation too);
        # non-Car classes already scored at 0.5 in the first pass
        ap_05_per_class = {}
        for cls_name in self.cfg.dataset.classes:
            if cls_name != "Car":
                ap_05_per_class[cls_name] = ap_per_class[cls_name]
                continue
            ap_05_per_class[cls_name] = {
                metric_name: kitti_ap.evaluate_ap(
                    gts, det_frames, cls_name, metric, 0.5)
                for metric, metric_name in (("image", "AP_2D"),
                                            ("ground", "AP_BEV"),
                                            ("3d", "AP_3D"))}
        results = {"step": int(step),
                   "ap": ap_per_class[self.cfg.dataset.classes[0]],
                   "ap_per_class": ap_per_class,
                   "ap_05_per_class": ap_05_per_class}
        with open(os.path.join(self.output_dir,
                               f"results_{step}.json"), "w") as f:
            json.dump(results, f, indent=2)
        self._evaluated.add(int(step))
        return results

    # ------------------------------------------- ego-motion recovery

    def _oxts(self, video_id: int, frame: int):
        key = (video_id, frame)
        if key not in self._oxts_cache:
            try:
                self._oxts_cache[key] = kitti.read_oxts(
                    self.dataset.oxts_dir, video_id, frame)
            except (OSError, IndexError, ValueError):
                self._oxts_cache[key] = None   # no pose: zero ego
        return self._oxts_cache[key]

    def _ego(self, video_id: int, frame_from: int, frame_to: int):
        """(trans, matrix, dyaw) expressing frame_to coords in
        frame_from coords, or None for identity/unknown."""
        if frame_from == frame_to:
            return None
        o_from = self._oxts(video_id, frame_from)
        o_to = self._oxts(video_id, frame_to)
        if o_from is None or o_to is None:
            return None
        trans, matrix, dyaw = kitti.ego_motion(o_from, o_to)
        if kitti.is_identity_ego(trans, matrix, dyaw):
            return None
        return trans, matrix, dyaw

    def _recover_dets(self, dets, calib, video_id: int,
                      frame_base: int, frame_own: int):
        """Copy det dicts whose box_3d is in frame_base coordinates,
        recovering box_3d into frame_own's own coordinates (reference
        recovery_coordinate, evaluator_utils.py:401). Identity ego ->
        boxes pass through bit-identical."""
        ego = self._ego(video_id, frame_base, frame_own)
        if not dets or ego is None:
            return [dict(d) for d in dets]
        trans, matrix, dyaw = ego
        boxes = np.stack([d["box_3d"] for d in dets])
        rec = kitti.transform_boxes_3d(boxes, calib, trans, matrix,
                                       dyaw, inverse=True)
        out = []
        for d, b in zip(dets, rec):
            nd = dict(d)
            nd["box_3d"] = b
            out.append(nd)
        return out

    def _align_dets_to_prev(self, vid: int, frames: Dict[int, List],
                            order, calib):
        """Set box_aligned on every det: its box expressed in the
        PREVIOUS tracked frame's coordinates, so the tracker's
        association IoU is ego-compensated (the reference's
        dets_for_ious second stream, evaluator_utils.py:642-646 — the
        model's frame-B output is natively in frame-A coordinates; we
        apply the same known oxts transform uniformly, which also
        covers MoI-interpolated in-between frames)."""
        for i in range(1, len(order)):
            dets = frames[order[i]]
            if not dets:
                continue
            ego = self._ego(vid, order[i - 1], order[i])
            if ego is None:
                for d in dets:
                    d["box_aligned"] = None
                continue
            trans, matrix, dyaw = ego
            boxes = np.stack([d["box_3d"] for d in dets])
            aligned = kitti.transform_boxes_3d(boxes, calib, trans,
                                               matrix, dyaw)
            for d, b in zip(dets, aligned):
                d["box_aligned"] = b

    def _frame_det(self, dets, calib, img_size) -> kitti_ap.FrameDet:
        boxes, bbs, scores, types = [], [], [], []
        for d in dets:
            bb = kitti_writer.project_box_to_image(d["box_3d"], calib,
                                                   img_size)
            if bb is None:
                continue
            boxes.append(d["box_3d"])
            bbs.append(bb)
            scores.append(d["score"])
            types.append(self.cfg.dataset.classes[d["class_idx"]])
        if not boxes:
            return kitti_ap.FrameDet(np.zeros((0, 7)), np.zeros((0, 4)),
                                     np.zeros(0), [])
        return kitti_ap.FrameDet(np.stack(boxes), np.stack(bbs),
                                 np.asarray(scores), types)

    def _kitti_lines(self, dets, calib, img_size):
        if not dets:
            return []
        boxes = np.stack([d["box_3d"] for d in dets])
        scores = np.array([d["score"] for d in dets])
        cls = np.array([d["class_idx"] for d in dets])
        return kitti_writer.predictions_to_kitti_lines(
            boxes, scores, cls, calib, img_size,
            classes=self.cfg.dataset.classes,
            score_threshold=self.cfg.eval.kitti_score_threshold)

    def _run_tracking(self, video_dets, video_img_size=None) -> Dict:
        """Track per video and score with the official-protocol MOT
        scorer: GT includes DontCare regions, neighboring classes and
        truncation/occlusion for the official ignore rules; 'overall'
        pools all videos in one accumulator (like the official scorer
        pools its sequences) rather than averaging per-video scores."""
        ev = self.cfg.eval
        cls = self.cfg.dataset.classes[0].lower()
        # GT classes the official loader keeps for this eval class
        allowed = {cls} | set(mot_eval._NEIGHBORS.get(cls, ()))
        raw_labels = getattr(self.dataset, "raw_labels",
                             self.dataset.labels)
        all_results = {}
        pooled = mot_eval.MotEvaluator(cls=cls)
        for vid, frames in video_dets.items():
            order = sorted(frames)
            img_size = (video_img_size or {}).get(vid, (1242, 375))
            calib = self.dataset.calib(vid)
            # ego-compensated association: express each frame's boxes
            # in the previous tracked frame's coordinates
            self._align_dets_to_prev(vid, frames, order, calib)
            gaps = [0] + [order[i] - order[i - 1]
                          for i in range(1, len(order))]
            dets_seq = [[d for d in frames[f]
                         if d["score"] >= ev.track_lth] for f in order]
            tracks = iou_tracker.track_through_ious(
                dets_seq, ev.track_hth, ev.track_liou, ev.track_tmin,
                frame_gaps=gaps)
            # score vs GT tracking labels
            gt_frames, pred_frames = [], []
            for fi, f in enumerate(order):
                lab = raw_labels(vid, f)
                keep = np.array([t.lower() in allowed
                                 for t in lab.types], bool)
                dontcare = [b for t, b in zip(lab.types, lab.bbox_2d)
                            if t == "DontCare"]
                gt_frames.append({
                    "ids": list(lab.track_ids[keep]),
                    "boxes": list(lab.bbox_2d[keep]),
                    "types": [t.lower() for t in lab.types[keep]],
                    "truncation": list(lab.truncation[keep].astype(int)),
                    "occlusion": list(lab.occlusion[keep].astype(int)),
                    "dontcare": dontcare})
                ids, boxes = [], []
                for tid, tr in enumerate(tracks):
                    if fi in tr["frames"]:
                        det = tr["trajectory"][tr["frames"].index(fi)]
                        # clip to the real image so pred and GT 2D boxes
                        # live in the same coordinate contract
                        bb = kitti_writer.project_box_to_image(
                            det["box_3d"], calib, img_size)
                        if bb is not None:
                            ids.append(tid)
                            boxes.append(bb)
                pred_frames.append({"ids": ids, "boxes": boxes})
            all_results[vid] = mot_eval.evaluate_tracking(
                gt_frames, pred_frames, cls=cls)
            pooled.add_sequence(gt_frames, pred_frames)
        if all_results:
            all_results["overall"] = pooled.results()
        return all_results

    # ------------------------------------------------------- polling

    def run_latest_checkpoints(self):
        results = []
        for step in self.ckpt.all_steps():
            if step not in self._evaluated:
                results.append(self.run_checkpoint_once(step))
        return results

    def repeated_checkpoint_run(self, max_wait_rounds: int = 10000,
                                stop_at_step: Optional[int] = None):
        """Poll the checkpoint dir like the reference evaluator
        (dt_evaluator.py:461: poll every eval_wait_interval seconds,
        skip already-evaluated checkpoints)."""
        interval = self.cfg.eval.eval_wait_interval
        results = []
        for _ in range(max_wait_rounds):
            new = self.run_latest_checkpoints()
            results.extend(new)
            if stop_at_step is not None and \
                    any(r["step"] >= stop_at_step for r in results):
                break
            if not new:
                time.sleep(interval)
        return results
