"""Ego-warp evidence (VERDICT r3 item 5a): same-checkpoint AP/MOTA A/B
on the highway-ego fixture between

  * the re-encode path: the standard evaluator protocol, where each
    couple's far frame is point-level ego-aligned into the keyframe and
    re-encoded by the towers (reference kitti_tracking_dataset.py
    point_cloud_transform semantics), and
  * the streaming ego-warp path: every keyframe encoded ONCE in its own
    coordinates (runtime/predictor.StreamingPredictor), the cached BEV
    features + proposals warped into the previous keyframe's
    coordinates by the affine ego warp (ops/warp.py) — the path a
    moving platform uses to avoid a tower re-encode per couple.

Both arms share one checkpoint, one val protocol (stride-3 couples, MoI
interpolation, ego recovery, MOT over all frames) and the parity-tested
scorers. Writes results_r04/warp_ab.json.

Run: python benchmarks/ab_warp.py [steps]
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import kitti, synthetic, tracking  # noqa: E402
from dodt_tpu.eval import decode as decode_lib  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402
from dodt_tpu.runtime.predictor import StreamingPredictor  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2400

root = tempfile.mkdtemp(prefix="warpab_fix_")
synthetic.write_tracking_fixture(root, num_videos=2, num_frames=13,
                                 ego_speed=1.2, num_cars=7,
                                 points_per_car=512)
cfg = cfg_mod.cars_dt_tracking(data_stride=3)
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = STEPS
cfg.train.optimizer.initial_lr = 1e-3
cfg.eval.batch_size = 4

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="warpab_ck_")
trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=STEPS // 2)
print("train done:", [(h["step"], round(h["total"], 3))
                      for h in history])


class StreamingWarpEvaluator(Evaluator):
    """Evaluator whose per-couple predictions come from the streaming
    predictor with ego feature-warp instead of the aligned re-encode.
    Couples must arrive in per-video temporal order (eval.batch_size=1
    keeps the chunking sequential)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._pred = None
        self._pred_params = None
        self._last = None  # (video_id, frame)

    def _frame_own(self, cp, frame, sample, slot):
        velo = kitti.read_lidar(
            os.path.join(self.dataset.velo_dir, f"{cp.video_id:04d}"),
            f"{frame:06d}")[:, :3]
        calib = self.dataset.calib(cp.video_id)
        cam = kitti.lidar_to_cam_frame(velo, calib).astype(np.float32)
        mp = self.cfg.dataset.max_points
        n = min(len(cam), mp)
        pts = np.zeros((mp, 3), np.float32)
        pts[:n] = cam[:n]
        pv = np.zeros(mp, bool)
        pv[:n] = True
        return {
            "points": jnp.asarray(pts)[None],
            "points_valid": jnp.asarray(pv)[None],
            "image": jnp.asarray(sample["image"][slot])[None],
            "ground_plane": jnp.asarray(sample["ground_plane"])[None],
            "p2": jnp.asarray(sample["p2"])[None],
            "orig_image_shape":
                jnp.asarray(sample["orig_image_shape"])[None],
        }

    def predict_couples(self, params, idxs):
        results = []
        for idx in idxs:
            cp = self.dataset.couples[idx]
            sample = self._load(idx)
            if self._pred is None or self._pred_params is not params:
                self._pred = StreamingPredictor(self.model, params)
                self._pred_params = params
                self._last = None
            if self._last != (cp.video_id, cp.frame_a):
                # new video / non-contiguous couple: restart the stream
                self._pred.reset()
                self._pred.push_keyframe(
                    self._frame_own(cp, cp.frame_a, sample, 0),
                    fetch=False)
            oxts_a = kitti.read_oxts(self.dataset.oxts_dir,
                                     cp.video_id, cp.frame_a)
            oxts_b = kitti.read_oxts(self.dataset.oxts_dir,
                                     cp.video_id, cp.frame_b)
            trans, matrix, _ = kitti.ego_motion(oxts_a, oxts_b)
            a2, b2 = kitti.ego_bev_affine(self.dataset.calib(cp.video_id),
                                          trans, matrix)
            out = self._pred.push_keyframe(
                self._frame_own(cp, cp.frame_b, sample, 1),
                fetch=False, ego_to_prev=(a2, b2))
            self._last = (cp.video_id, cp.frame_b)
            out = {k: np.asarray(v) for k, v in out.items()
                   if k.startswith("final_")}
            thr = self.cfg.eval.kitti_score_threshold
            dets = []
            n_frames = out["final_boxes_3d"].shape[1]
            for f in (0, n_frames - 1):
                corr = (out["final_corr_offsets"][0]
                        if f == 0 and "final_corr_offsets" in out
                        else None)
                dets.append(decode_lib.outputs_to_detections(
                    out["final_boxes_3d"][0, f],
                    out["final_orientations"][0, f],
                    out["final_scores"][0, f],
                    out["final_cls_softmax"][0, f],
                    out["final_valid"][0, f],
                    corr_offsets=corr, score_threshold=thr))
            results.append({"sample": sample, "dets": dets,
                            "couple": cp})
        return results


ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="test")
step = trainer.ckpt.all_steps()[-1]


def arm(ev_cls, tag, batch_size):
    c = cfg_mod.cars_dt_tracking(data_stride=3)
    c.dataset = cfg.dataset
    c.train = cfg.train
    c.eval.batch_size = batch_size
    ev = ev_cls(c, model, ev_ds, ckpt_dir=ck,
                output_dir=tempfile.mkdtemp(prefix=f"warpab_{tag}_"))
    r = ev.run_checkpoint_once(step, interpolate=True)
    row = {"AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
           "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
           "MOTA_all_frames": r["mot"].get("overall", {}).get("MOTA"),
           "MOTP_all_frames": r["mot"].get("overall", {}).get("MOTP"),
           "IDS": r["mot"].get("overall", {}).get("IDS"),
           "FM": r["mot"].get("overall", {}).get("FM")}
    print(tag, row)
    return row


results = {
    "setup": f"stride-3 couples, ego 1.2 m/frame (3.6 m per couple), "
             f"2 videos x 13 frames, {STEPS} steps, one shared "
             f"checkpoint; MoI + ego recovery + MOT over all frames "
             f"both arms",
    "reencode": arm(Evaluator, "reencode", 4),
    "stream_warp": arm(StreamingWarpEvaluator, "stream_warp", 1),
}
os.makedirs("results_r04", exist_ok=True)
with open("results_r04/warp_ab.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote results_r04/warp_ab.json")
