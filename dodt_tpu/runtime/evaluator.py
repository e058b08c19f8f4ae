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
                 ckpt_dir: str, output_dir: str):
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.ckpt = CheckpointIO(ckpt_dir)
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self._apply = jax.jit(model.apply,
                              static_argnames=("train", "mode"))
        self._evaluated: set = set()
        # best-effort build of the native AP evaluator (falls back to
        # the Python implementation when no toolchain is present)
        from dodt_tpu import native
        native.build()

    # ---------------------------------------------------------- core

    def predict_couple(self, params, idx: int) -> Dict:
        """Run the model on one val couple (or N-frame stack); return
        detection dicts for the FIRST and LAST frame in frame-0
        coordinates (the detection/tracking contract downstream — the
        reference StackEvaluator likewise scores the keyframe and uses
        the far frame for offsets/MoI)."""
        if hasattr(self.dataset, "load_stack"):
            sample = self.dataset.load_stack(idx, augs=())
        else:
            sample = self.dataset.load_couple(idx, augs=())
        batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                 if isinstance(v, np.ndarray)}
        out = self._apply({"params": params}, batch, train=False,
                          mode="val")
        thr = self.cfg.eval.kitti_score_threshold
        n_frames = out["final_boxes_3d"].shape[1]
        dets = []
        for f in (0, n_frames - 1):
            corr = (np.array(out["final_corr_offsets"][0])
                    if f == 0 and "final_corr_offsets" in out else None)
            dets.append(decode_lib.outputs_to_detections(
                np.array(out["final_boxes_3d"][0, f]),
                np.array(out["final_orientations"][0, f]),
                np.array(out["final_scores"][0, f]),
                np.array(out["final_cls_softmax"][0, f]),
                np.array(out["final_valid"][0, f]),
                corr_offsets=corr,
                score_threshold=thr))
        return {"sample": sample, "dets": dets,
                "couple": self.dataset.couples[idx]}

    def run_checkpoint_once(self, step: Optional[int] = None,
                            interpolate: bool = False) -> Dict:
        """Evaluate one checkpoint. With `interpolate=True` and a data
        stride tau > 1, MoI fills the tau-1 non-keyframes per couple and
        writes per-frame files (reference DtEvaluatorStride)."""
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

        # per-video collections for tracking
        video_dets: Dict[int, Dict[int, List]] = defaultdict(dict)
        video_img_size: Dict[int, tuple] = {}
        gts: List[kitti_ap.FrameGt] = []
        det_frames: List[kitti_ap.FrameDet] = []

        for idx in range(len(self.dataset.couples)):
            cp = self.dataset.couples[idx]
            res = self.predict_couple(params, idx)
            dets0 = res["dets"][0]
            calib = self.dataset.calib(cp.video_id)
            img_size = (int(res["sample"]["orig_image_shape"][1]),
                        int(res["sample"]["orig_image_shape"][0]))

            # ---- detection AP bookkeeping (frame 0 only, like
            # dt_evaluator.py:296-300)
            labels = self.dataset.labels(cp.video_id, cp.frame_a)
            gts.append(kitti_ap.FrameGt.from_labels(labels))
            det_frames.append(self._frame_det(dets0, calib, img_size))

            # ---- KITTI txt files
            lines = self._kitti_lines(dets0, calib, img_size)
            kitti_writer.write_kitti_file(
                os.path.join(pred_dir,
                             f"{cp.video_id:02d}{cp.frame_a:04d}.txt"),
                lines)

            video_dets[cp.video_id][cp.frame_a] = dets0
            video_img_size[cp.video_id] = img_size

            # ---- MoI: synthesize the tau-1 intermediate frames
            if interpolate and cp.frame_b > cp.frame_a + 1:
                tau = cp.frame_b - cp.frame_a
                frames = moi.interpolate_non_keyframes(
                    dets0, res["dets"][1], tau + 1,
                    self.cfg.eval.kitti_score_threshold)
                for off in range(1, tau):
                    frame_no = cp.frame_a + off
                    lines = self._kitti_lines(frames[off], calib,
                                              img_size)
                    kitti_writer.write_kitti_file(
                        os.path.join(
                            pred_dir,
                            f"{cp.video_id:02d}{frame_no:04d}.txt"),
                        lines)
                    video_dets[cp.video_id][frame_no] = frames[off]

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

        for idx, name in enumerate(self.dataset.sample_names):
            sample = self.dataset.load_sample(idx, augs=())
            batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                     if isinstance(v, np.ndarray)}
            out = self._apply({"params": params}, batch, train=False,
                              mode="val")
            dets = decode_lib.outputs_to_detections(
                np.array(out["final_boxes_3d"][0, 0]),
                np.array(out["final_orientations"][0, 0]),
                np.array(out["final_scores"][0, 0]),
                np.array(out["final_cls_softmax"][0, 0]),
                np.array(out["final_valid"][0, 0]),
                score_threshold=thr)
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
        results = {"step": int(step),
                   "ap": ap_per_class[self.cfg.dataset.classes[0]],
                   "ap_per_class": ap_per_class}
        with open(os.path.join(self.output_dir,
                               f"results_{step}.json"), "w") as f:
            json.dump(results, f, indent=2)
        self._evaluated.add(int(step))
        return results

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
            dets_seq = [[d for d in frames[f]
                         if d["score"] >= ev.track_lth] for f in order]
            tracks = iou_tracker.track_through_ious(
                dets_seq, ev.track_hth, ev.track_liou, ev.track_tmin)
            # score vs GT tracking labels
            calib = self.dataset.calib(vid)
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
