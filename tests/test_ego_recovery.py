"""Ego-motion coordinate recovery through the tracking/MoI/eval output
path.

Parity targets: reference `recovery_predictions`/`recovery_coordinate`
(evaluator_utils.py:370,401) recover frame-B predictions into frame-B's
own coordinates before writing/scoring, and `track_through_ious`'s
`dets_for_ious` second stream (:642-646) associates in the PREVIOUS
keyframe's coordinates. At real KITTI platform speeds (~2 m/frame) an
unrecovered pipeline both mis-scores non-keyframes and fragments every
track; these tests pin the failure and the fix.
"""
import os
from types import SimpleNamespace

import numpy as np
import pytest

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import kitti, synthetic, tracking
from dodt_tpu.tracking import iou_tracker, moi

EGO_SPEED = 2.0          # m/frame: highway platform speed
TAU = 3                  # temporal stride (keyframes 6 m apart)
NUM_FRAMES = 7           # keyframes 0, 3, 6


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_ego"))
    synthetic.write_tracking_fixture(
        root, num_videos=1, num_frames=NUM_FRAMES, ego_speed=EGO_SPEED,
        num_cars=3, seed=5)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.data_stride = TAU
    cfg.dataset.video_train_ids = (0,)
    scene = synthetic.SyntheticScene(0, NUM_FRAMES, num_cars=3, seed=5,
                                     ego_speed=EGO_SPEED)
    return root, cfg, scene


@pytest.fixture(scope="module")
def evaluator(world, tmp_path_factory):
    """Evaluator with a dummy model: only the tracking/recovery side is
    exercised (no forward passes)."""
    from dodt_tpu.runtime.evaluator import Evaluator

    root, cfg, scene = world
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    model = SimpleNamespace(apply=lambda *a, **k: None)
    out = str(tmp_path_factory.mktemp("ego_eval"))
    return Evaluator(cfg, model, ds, os.path.join(out, "ckpt"), out)


def _perfect_keyframe_dets(scene, keyframes):
    """Per-keyframe det dicts in each frame's OWN coordinates with the
    exact corr offsets the DT model is trained to predict (frame-A
    coordinate motion to the next keyframe)."""
    frames = {}
    for ki, t in enumerate(keyframes):
        dets = []
        t2 = keyframes[ki + 1] if ki + 1 < len(keyframes) else None
        for cid, box in scene.camera_boxes_at(t):
            car = scene.cars[cid]
            if t2 is not None:
                offs = np.array([car["vx"] * (t2 - t),
                                 car["vz"] * (t2 - t), 0.0])
                span = t2 - t
            else:
                offs, span = np.zeros(3), 1
            dets.append({"box_3d": np.asarray(box, np.float64),
                         "score": 0.95, "class_idx": 0, "type": "Car",
                         "offsets": offs, "offsets_span": span,
                         "coexist": 1.0})
        frames[t] = dets
    return frames


def test_transform_boxes_3d_matches_scene_geometry(world):
    root, cfg, scene = world
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    calib = ds.calib(0)
    o0 = kitti.read_oxts(ds.oxts_dir, 0, 0)
    o3 = kitti.read_oxts(ds.oxts_dir, 0, 3)
    trans, matrix, dyaw = kitti.ego_motion(o0, o3)

    ids, boxes_own = zip(*scene.camera_boxes_at(3))
    boxes_own = np.stack(boxes_own).astype(np.float64)
    # frame-3 own -> frame-0 coordinates = world coords (ego starts at 0)
    in_frame0 = kitti.transform_boxes_3d(boxes_own, calib, trans,
                                         matrix, dyaw)
    world_boxes = dict(scene.boxes_at(3))
    expect = np.stack([world_boxes[i] for i in ids])
    np.testing.assert_allclose(in_frame0[:, :3], expect[:, :3], atol=2e-3)

    # inverse (= the reference's recovery_coordinate) round-trips
    rec = kitti.transform_boxes_3d(in_frame0, calib, trans, matrix,
                                   dyaw, inverse=True)
    np.testing.assert_allclose(rec, boxes_own, atol=1e-6)


def test_zero_ego_is_bit_identical(world):
    root, cfg, scene = world
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    calib = ds.calib(0)
    o0 = kitti.read_oxts(ds.oxts_dir, 0, 0)
    trans, matrix, dyaw = kitti.ego_motion(o0, o0)
    assert kitti.is_identity_ego(trans, matrix, dyaw)
    boxes = np.stack([b for _, b in scene.camera_boxes_at(2)])
    out = kitti.transform_boxes_3d(boxes, calib, trans, matrix, dyaw,
                                   inverse=True)
    # identity ego must not perturb boxes at all (keyframe txt files
    # stay bit-identical when the platform is stationary)
    assert np.array_equal(out, boxes.astype(np.float64))


def test_recover_dets_identity_passthrough(evaluator, world):
    root, cfg, scene = world
    calib = evaluator.dataset.calib(0)
    dets = [{"box_3d": np.array([1.0, 1.6, 20.0, 3.9, 1.6, 1.5, 0.1]),
             "score": 0.9, "offsets": None}]
    out = evaluator._recover_dets(dets, calib, 0, 4, 4)
    assert np.array_equal(out[0]["box_3d"], dets[0]["box_3d"])


def test_highway_ego_tracking_collapses_without_recovery(evaluator,
                                                        world):
    """At 2 m/frame ego speed and tau=3 (6 m between keyframes), greedy
    association in per-frame coordinates finds zero IoU overlap (car
    length ~4 m < 6 m apparent shift), fragmenting every track; the
    ego-aligned association recovers full-length tracks (reference
    dets_for_ious semantics)."""
    root, cfg, scene = world
    keyframes = list(range(0, NUM_FRAMES, TAU))
    frames = _perfect_keyframe_dets(scene, keyframes)
    img = {0: (synthetic._IMG_W, synthetic._IMG_H)}

    aligned = evaluator._run_tracking({0: frames}, img)
    mota_aligned = aligned["overall"]["MOTA"]

    # disable ego knowledge -> round-2 behavior (association in each
    # frame's own coordinates)
    frames2 = _perfect_keyframe_dets(scene, keyframes)
    orig = evaluator._ego
    evaluator._ego = lambda *a: None
    try:
        broken = evaluator._run_tracking({0: frames2}, img)
    finally:
        evaluator._ego = orig
    mota_broken = broken["overall"]["MOTA"]

    assert mota_aligned > 60.0, aligned["overall"]
    assert mota_broken < 10.0, broken["overall"]
    assert mota_aligned > mota_broken + 50.0


def test_slow_ego_matches_aligned(evaluator, world):
    """Sanity: with alignment on, a slow-ego scene and the highway
    scene produce equally healthy tracks (alignment fully absorbs the
    platform speed)."""
    root, cfg, scene = world
    keyframes = list(range(0, NUM_FRAMES, TAU))
    frames = _perfect_keyframe_dets(scene, keyframes)
    img = {0: (synthetic._IMG_W, synthetic._IMG_H)}
    res = evaluator._run_tracking({0: frames}, img)
    # every GT that stays in view is tracked: no misses at keyframes
    assert res["overall"]["MOTA"] > 60.0
    assert res["overall"]["IDS"] == 0


def test_moi_interpolated_dets_carry_per_frame_offsets():
    d0 = {"box_3d": np.array([0.0, 1.6, 10.0, 3.9, 1.6, 1.5, 0.0]),
          "score": 0.9, "offsets": np.array([0.0, 3.0, 0.0]),
          "coexist": 1.0}
    d1 = {"box_3d": np.array([0.0, 1.6, 13.0, 3.9, 1.6, 1.5, 0.0]),
          "score": 0.8, "offsets": None, "coexist": 1.0}
    frames = moi.interpolate_non_keyframes([d0], [d1], num_frames=4)
    mid = frames[1][0]
    assert mid["offsets_span"] == 1
    np.testing.assert_allclose(mid["offsets"], [0.0, 1.0, 0.0])


def test_tracker_scales_offsets_by_frame_gap():
    """A keyframe det whose offsets span tau=3 frames must propagate
    only 1/3 of the motion to an adjacent (interpolated) frame."""
    def det(z, offsets, span):
        return {"box_3d": np.array([0.0, 1.6, z, 3.9, 1.6, 1.5, 0.0]),
                "score": 0.95, "offsets": np.asarray(offsets, float),
                "offsets_span": span, "coexist": 1.0}

    # object moves +4 m z per keyframe gap of 3 frames; per-frame dets
    seq = [[det(10.0, [0, 4.0, 0], 3)],
           [det(10.0 + 4.0 / 3, [0, 4.0 / 3, 0], 1)],
           [det(10.0 + 8.0 / 3, [0, 4.0 / 3, 0], 1)],
           [det(14.0, [0, 4.0, 0], 3)]]
    tracks = iou_tracker.track_through_ious(
        seq, 0.85, 0.3, t_min=3, frame_gaps=[0, 1, 1, 1])
    assert len(tracks) == 1
    assert len(tracks[0]["trajectory"]) == 4
