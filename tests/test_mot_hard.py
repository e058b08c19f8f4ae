"""Hard MOT fixture: un-saturated CLEAR metrics with pinned nonzero
expectations (VERDICT r3 item 4).

The flagship fixtures saturate at MOTA 100 where tracker regressions are
invisible; this scenario (tracking/scenarios.py) pins IDS / FM / MT / ML
at nonzero values through the parity-tested scorer
(tests/test_mot_parity.py), and proves that a deliberately broken
association — predicted correlation offsets zeroed — measurably craters
MOTA and produces ID switches, per the reference's tracker semantics
(track_iou / track_iou_v2,
/root/reference/avod/core/tracking/dt_tracking_eval.py:204,271).
"""
import numpy as np

from dodt_tpu.tracking import iou_tracker, kalman, mot_eval
from dodt_tpu.tracking import scenarios
from dodt_tpu.tracking.scenarios import (hard_mot_scenario,
                                         tracks_to_pred_frames)

N = 32


def _score(dets, tracks):
    gt, _ = hard_mot_scenario(n_frames=N)
    return mot_eval.evaluate_tracking(gt,
                                      tracks_to_pred_frames(tracks, N))


def _run_iou(zero_offsets=False, ttl=4):
    gt, dets = hard_mot_scenario(n_frames=N, zero_offsets=zero_offsets)
    tracks = iou_tracker.track_through_ious(
        dets, high_threshold=0.85, iou_threshold=0.005, t_min=3,
        ttl=ttl)
    return mot_eval.evaluate_tracking(
        gt, tracks_to_pred_frames(tracks, N)), tracks


def test_hard_scenario_unsaturated_with_true_offsets():
    """With the model's (here: ground-truth) offsets the tracker handles
    crossing, fast motion, occlusion, birth/death and near-miss pairs —
    but the metrics are NOT at ceiling: the score gate must drop the
    low-score object (ML) and the occlusion gap costs FNs + one FM."""
    r, tracks = _run_iou()
    assert 85.0 < r["MOTA"] < 92.0          # un-saturated
    assert r["IDS"] == 0                    # crossing + fast pair held
    assert r["FM"] == 1                     # occlusion re-link
    assert r["FN"] == 35                    # 3 occluded + 32 low-score
    assert r["FP"] == 0
    assert r["ML"] == 10.0                  # 1 of 10 (low-score object)
    assert r["MT"] == 90.0
    assert len(tracks) == 9                 # low-score object gated out


def test_zeroed_offsets_crater_mota_and_ids():
    """Regression probe: zeroing the predicted offsets (broken
    association) must swap identities at the crossing (IDS) and lose the
    faster-than-a-box-length pair entirely (ML, FN surge)."""
    good, _ = _run_iou(zero_offsets=False)
    bad, _ = _run_iou(zero_offsets=True)
    assert bad["IDS"] >= 2                  # crossing pair swaps
    assert good["IDS"] == 0
    assert bad["MOTA"] < good["MOTA"] - 15.0   # craters, not a wiggle
    assert bad["ML"] >= 30.0                # fast pair + gated object
    assert bad["FN"] >= good["FN"] + 60     # fast pair unfollowable


def test_ttl_occlusion_ab():
    """track_iou (ttl=1) vs track_iou_v2 (ttl>1) on the k-frame
    occlusion gap whose tail is shorter than t_min: v2 bridges the gap
    (same track id resumes -> 1 fragmentation, tail kept), ttl=1 drops
    the tail (more FNs, no re-link)."""
    v2, tracks_v2 = _run_iou(ttl=4)
    v1, tracks_v1 = _run_iou(ttl=1)
    assert v2["FM"] == 1 and v1["FM"] == 0
    assert v1["FN"] == v2["FN"] + 2         # the 2-frame tail is lost
    assert v2["MOTA"] > v1["MOTA"]
    # the bridged track spans the gap in one identity
    spans = [(t["frames"][0], t["frames"][-1]) for t in tracks_v2]
    assert any(a < 27 and b > 29 for a, b in spans)


def test_ego_transform_roundtrip():
    poses = scenarios.ego_poses(8, speed=0.7, yaw_rate=0.03)
    boxes = np.array([[3.0, 1.6, 20.0, 3.9, 1.6, 1.5, 0.4],
                      [-5.0, 1.6, 11.0, 3.9, 1.6, 1.5, -1.0]])
    for pose in poses:
        back = scenarios.boxes_world_to_ego(
            scenarios.boxes_ego_to_world(boxes, pose), pose)
        np.testing.assert_allclose(back, boxes, atol=1e-9)


def test_ego_arm_separates_kf_failure_modes():
    """Moving-platform variant (VERDICT r4 weak #7): the same hard
    scenario on a turning platform separates 'ignores learned offsets'
    from 'ignores ego motion'. The ego-compensated KF (reference
    kf_tracking.py:281-305 semantics) must not crater relative to the
    uncompensated filter, and the IoU tracker riding box_aligned stays
    near its stationary-platform score."""
    # 2.2 m/frame at KITTI's 10 Hz is 79 km/h with a gentle turn —
    # per-frame ego displacement exceeds a car's footprint, so raw
    # (uncompensated) association starts cold every frame
    poses = scenarios.ego_poses(N, speed=2.2, yaw_rate=0.03)
    gt, dets = hard_mot_scenario(n_frames=N, poses=poses)
    ego = scenarios.make_ego_fn(poses)

    kf_comp = mot_eval.evaluate_tracking(gt, tracks_to_pred_frames(
        kalman.kf_pipeline(dets, ego_fn=ego), N))
    kf_raw = mot_eval.evaluate_tracking(gt, tracks_to_pred_frames(
        kalman.kf_pipeline(dets), N))
    assert kf_comp["MOTA"] > kf_raw["MOTA"] + 25.0   # no longer craters
    assert kf_comp["IDS"] < kf_raw["IDS"]
    assert kf_comp["MT"] >= 60.0 and kf_raw["MT"] <= 20.0

    # the aligned IoU tracker is ego-exact and stays on top
    iou_r = mot_eval.evaluate_tracking(gt, tracks_to_pred_frames(
        iou_tracker.track_through_ious(
            dets, high_threshold=0.85, iou_threshold=0.005, t_min=3,
            ttl=4), N))
    assert iou_r["IDS"] <= 1
    assert iou_r["MOTA"] > kf_comp["MOTA"]


def test_learned_coexist_beats_constant_on_birth_death():
    """End-to-end coexist A/B (VERDICT r4 item 3): on the birth/death
    scenario, the learned coexist head must beat the constant-1.0 arm
    (phantom extrapolation FPs) and the headless 0.5 arm (detector-miss
    FNs) through MoI + tracker + the parity-tested scorer."""
    rows = {}
    for mode in ("learned", "constant", "none"):
        gt, couples = scenarios.birth_death_scenario(
            n_frames=37, tau=6, coexist_mode=mode)
        rows[mode] = scenarios.run_moi_tracking(gt, couples, 37)
    assert rows["learned"]["MOTA"] > rows["constant"]["MOTA"]
    assert rows["learned"]["MOTA"] > rows["none"]["MOTA"]
    # the mechanism, not just the scalar: constant-1.0 extrapolates
    # through true deaths/births (FP), headless blanks through
    # detector misses (FN)
    assert rows["constant"]["FP"] >= rows["learned"]["FP"] + 5
    assert rows["none"]["FN"] >= rows["learned"]["FN"] + 5


def test_tracker_coexist_early_termination():
    """A track whose last det predicts 'will not exist next keyframe'
    (P(both) < 0.5) must finish at its first miss instead of lingering
    through the ttl window; dets without the head (coexist None / 0.5)
    keep full ttl semantics."""
    def mk(frame, x, coexist):
        return {"frame_id": frame,
                "box_3d": np.array([x, 1.6, 20.0, 3.9, 1.6, 1.5, 0.0]),
                "score": 0.9, "offsets": np.zeros(3),
                "offsets_span": 1, "coexist": coexist}

    # dying track: frames 0-2 then gone; a NEW object appears at the
    # same spot at frame 4 — with ttl=4 an undying track would grab it
    seq = [[mk(0, 0.0, 1.0)], [mk(1, 0.0, 1.0)], [mk(2, 0.0, 0.1)],
           [], [mk(4, 0.0, 1.0)], [mk(5, 0.0, 1.0)], [mk(6, 0.0, 1.0)]]
    tracks = iou_tracker.track_through_ious(
        seq, high_threshold=0.5, iou_threshold=0.005, t_min=2, ttl=4)
    assert len(tracks) == 2                     # no identity bridge
    assert tracks[0]["frames"] == [0, 1, 2]

    # same shape with neutral coexist: ttl=4 bridges the gap
    seq2 = [[mk(0, 0.0, 0.5)], [mk(1, 0.0, 0.5)], [mk(2, 0.0, 0.5)],
            [], [mk(4, 0.0, 0.5)], [mk(5, 0.0, 0.5)],
            [mk(6, 0.0, 0.5)]]
    tracks2 = iou_tracker.track_through_ious(
        seq2, high_threshold=0.5, iou_threshold=0.005, t_min=2, ttl=4)
    assert len(tracks2) == 1


def test_kalman_vs_offset_association():
    """The Kalman pipeline ignores the learned offsets: it survives the
    slow scenario content but cannot associate the faster-than-a-box
    pair from a cold constant-velocity start — the measured gap between
    kf_pipeline and the offset tracker is exactly the reference's case
    for the correlation head (README.md:196-205 S+T+M ablation)."""
    gt, dets = hard_mot_scenario(n_frames=N)
    kf = mot_eval.evaluate_tracking(
        gt, tracks_to_pred_frames(kalman.kf_pipeline(dets), N))
    offs, _ = _run_iou()
    assert offs["MOTA"] > kf["MOTA"] + 5.0
    assert kf["ML"] >= 20.0                 # fast pair effectively lost
