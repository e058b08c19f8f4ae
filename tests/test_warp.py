"""Ego-motion BEV feature warping (ops/warp.py) + streaming with ego
compensation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dodt_tpu.ops.warp import (bev_pixel_from_xz, transform_anchors_xz,
                               warp_bev_features)

EXT = np.array([[-8.0, 8.0], [0.0, 16.0]], np.float32)


def test_warp_identity():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    out = warp_bev_features(f, np.eye(2, dtype=np.float32),
                            np.zeros(2, np.float32), EXT)
    np.testing.assert_allclose(np.array(out), np.array(f), atol=1e-5)


def test_warp_translation_shifts_pixels():
    # a source sampled at x_src = x_dst + 0.5m shifts content LEFT by
    # one pixel at 0.5 m/px
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.rand(32, 32, 1).astype(np.float32))
    a2 = np.eye(2, dtype=np.float32)
    b2 = np.array([0.5, 0.0], np.float32)   # 16m/32px = 0.5 m per px
    out = np.array(warp_bev_features(f, a2, b2, EXT))[..., 0]
    want = np.array(f)[..., 0]
    np.testing.assert_allclose(out[:, :-1], want[:, 1:], atol=1e-5)
    # out-of-range column is zero-filled
    np.testing.assert_allclose(out[:, -1], 0.0, atol=1e-6)


def test_warp_rotation_oracle():
    # nearest-impulse check: rotate a single bright pixel by 90 degrees
    # around the BEV center and find it at the rotated location
    f = np.zeros((32, 32, 1), np.float32)
    f[8, 20, 0] = 1.0
    # metric coords of that pixel center
    x_src = (20 + 0.5) / 32 * 16 - 8
    z_src = 16 - (8 + 0.5) / 32 * 16
    c, s = 0.0, 1.0
    center = np.array([0.0, 8.0], np.float32)
    rot = np.array([[c, -s], [s, c]], np.float32)
    # dest -> src sampling affine: src = R^T (dst - center) + center
    a2 = rot.T
    b2 = center - rot.T @ center
    out = np.array(warp_bev_features(jnp.asarray(f), a2, b2, EXT))
    p_src = np.array([x_src, z_src]) - center
    p_dst = rot @ p_src + center
    row, col = bev_pixel_from_xz(p_dst[0], p_dst[1], EXT, 32, 32)
    assert out[int(round(row)), int(round(col)), 0] > 0.9


def test_warp_packed_matches_gather4():
    """The packed single-gather TPU form is the same bilinear resample:
    its only deviation from the four-gather f32 form is the bf16
    payload, so it must agree to bf16 resolution everywhere (and the
    zero-padded packing edges must not leak — exercised by a transform
    that samples the last row/col)."""
    rng = np.random.RandomState(7)
    f = jnp.asarray(rng.rand(40, 36, 16).astype(np.float32))
    th = np.radians(4.0)
    a2 = np.array([[np.cos(th), -np.sin(th)],
                   [np.sin(th), np.cos(th)]], np.float32)
    b2 = np.array([0.3, -0.9], np.float32)
    ref = np.array(warp_bev_features(f, a2, b2, EXT, method="gather4"))
    out = np.array(warp_bev_features(f, a2, b2, EXT, method="packed"))
    np.testing.assert_allclose(out, ref, atol=1.5e-2)
    # identity transform: fr = fc = 0 everywhere, so only the bf16
    # rounding of the payload remains (compared against gather4, which
    # shares the float-noise boundary zeroing of the inside mask)
    ident = np.eye(2, dtype=np.float32)
    zero = np.zeros(2, np.float32)
    ref_i = np.array(warp_bev_features(f, ident, zero, EXT,
                                       method="gather4"))
    out_i = np.array(warp_bev_features(f, ident, zero, EXT,
                                       method="packed"))
    np.testing.assert_allclose(out_i, ref_i, atol=8e-3)


def test_transform_anchors_translation_and_rotation():
    anchors = jnp.asarray([[1.0, 1.5, 4.0, 3.9, 1.5, 1.6]], jnp.float32)
    # pure translation
    out = np.array(transform_anchors_xz(
        anchors, np.eye(2, dtype=np.float32),
        np.array([2.0, -1.0], np.float32)))[0]
    np.testing.assert_allclose(out[[0, 2]], [3.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(out[[3, 5]], [3.9, 1.6], atol=1e-6)
    # 90-degree rotation swaps the footprint dims
    rot = np.array([[0.0, -1.0], [1.0, 0.0]], np.float32)
    out = np.array(transform_anchors_xz(anchors, rot,
                                        np.zeros(2, np.float32)))[0]
    np.testing.assert_allclose(out[[3, 5]], [1.6, 3.9], atol=1e-6)


def test_ego_bev_affine_matches_point_transform():
    from dodt_tpu.data import kitti, synthetic
    import tempfile
    root = tempfile.mkdtemp()
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=3,
                                     ego_speed=2.0)
    import os
    base = os.path.join(root, "training")
    calib = kitti.read_tracking_calibration(
        os.path.join(base, "calib"), 0)
    oxts_a = kitti.read_oxts(os.path.join(base, "oxts"), 0, 0)
    oxts_b = kitti.read_oxts(os.path.join(base, "oxts"), 0, 1)
    trans, matrix, _ = kitti.ego_motion(oxts_a, oxts_b)
    a2, b2 = kitti.ego_bev_affine(calib, trans, matrix)

    rng = np.random.RandomState(2)
    pts_cam = np.stack([rng.uniform(-5, 5, 16),
                        rng.uniform(-1, 1, 16),
                        rng.uniform(2, 30, 16)], 1)
    v = calib.rect_to_velo(pts_cam)
    v = kitti.transform_points_to_prev_frame(v, trans, matrix)
    want = calib.velo_to_rect(v)
    got_xz = pts_cam[:, [0, 2]] @ a2.T + b2
    np.testing.assert_allclose(got_xz, want[:, [0, 2]], atol=1e-4)


def test_streaming_with_ego_matches_aligned_pair(tmp_path):
    """Streaming with feature-warp ego compensation approximates the
    monolithic pair on ego-aligned point clouds (boxes within ~0.3 m)."""
    from dodt_tpu import config as cfg_mod
    from dodt_tpu.data import synthetic, tracking
    from dodt_tpu.models import dt_avod
    from dodt_tpu.runtime.predictor import StreamingPredictor
    from dodt_tpu.data import kitti
    import os

    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=3,
                                     ego_speed=1.0)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    cfg.dataset.video_train_ids = (0,)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg,
                              cluster_sizes=((3.9, 1.6, 1.52),))
    sample = ds.load_couple(0, augs=())
    batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
             if isinstance(v, np.ndarray)}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "pathdrop": rng}, batch,
        train=False, mode="val")
    ref = model.apply(variables, batch, train=False, mode="val")

    # streaming: frame A in own coords, frame B in OWN coords + ego
    # affine (instead of pre-aligned points)
    cp = ds.couples[0]
    calib = ds.calib(cp.video_id)
    oxts_a = kitti.read_oxts(ds.oxts_dir, cp.video_id, cp.frame_a)
    oxts_b = kitti.read_oxts(ds.oxts_dir, cp.video_id, cp.frame_b)
    trans, matrix, _ = kitti.ego_motion(oxts_a, oxts_b)
    a2, b2 = kitti.ego_bev_affine(calib, trans, matrix)

    def frame_own(frame):
        velo = kitti.read_lidar(
            os.path.join(ds.velo_dir, f"{cp.video_id:04d}"),
            f"{frame:06d}")[:, :3]
        cam = kitti.lidar_to_cam_frame(velo, calib).astype(np.float32)
        n = min(len(cam), cfg.dataset.max_points)
        pts = np.zeros((cfg.dataset.max_points, 3), np.float32)
        pts[:n] = cam[:n]
        pv = np.zeros(cfg.dataset.max_points, bool)
        pv[:n] = True
        return pts, pv

    pts_b, pv_b = frame_own(cp.frame_b)
    fa = {
        "points": batch["points"][:, 0],
        "points_valid": batch["points_valid"][:, 0],
        "image": batch["image"][:, 0],
        "ground_plane": batch["ground_plane"],
        "p2": batch["p2"],
        "orig_image_shape": batch["orig_image_shape"],
    }
    fb = dict(fa)
    fb["points"] = jnp.asarray(pts_b)[None]
    fb["points_valid"] = jnp.asarray(pv_b)[None]
    fb["image"] = batch["image"][:, 1]

    pred = StreamingPredictor(model, variables["params"])
    assert pred.push_keyframe(fa) is None
    out = pred.push_keyframe(fb, ego_to_prev=(a2, b2))

    ref_boxes = np.array(ref["final_boxes_3d"][0, 0])
    ref_valid = np.array(ref["final_valid"][0, 0])
    got_boxes = out["final_boxes_3d"][0, 0]
    got_valid = out["final_valid"][0, 0]
    # compare top-scoring surviving box centers loosely: the feature
    # warp is an approximation of point-level alignment
    if ref_valid.any() and got_valid.any():
        r = ref_boxes[ref_valid.argmax()]
        g = got_boxes[got_valid.argmax()]
        assert np.linalg.norm(r[[0, 2]] - g[[0, 2]]) < 1.5, (r, g)
