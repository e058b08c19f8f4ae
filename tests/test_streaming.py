"""Streaming predictor equivalence: encode_frame + pair_stage must
reproduce the monolithic __call__ on the same pair (eval mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod
from dodt_tpu.runtime.predictor import StreamingPredictor

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_stream"))
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=4,
                                     ego_speed=0.5)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 4096
    cfg.dataset.video_train_ids = (0,)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
    variables = init_fn({"params": rng, "dropout": rng, "pathdrop": rng},
                        batch, train=False, mode="val")
    return cfg, model, batch, variables


def frame_view(batch, i):
    return {
        "points": batch["points"][:, i],
        "points_valid": batch["points_valid"][:, i],
        "image": batch["image"][:, i],
        "ground_plane": batch["ground_plane"],
        "p2": batch["p2"],
        "orig_image_shape": batch["orig_image_shape"],
    }


def test_streaming_matches_monolithic(setup):
    cfg, model, batch, variables = setup
    apply_fn = jax.jit(model.apply, static_argnames=("train", "mode"))
    want = apply_fn(variables, batch, train=False, mode="val")

    pred = StreamingPredictor(model, variables["params"])
    out0 = pred.push_keyframe(frame_view(batch, 0))
    assert out0 is None
    out = pred.push_keyframe(frame_view(batch, 1))
    assert out is not None

    np.testing.assert_allclose(out["final_boxes_3d"],
                               np.array(want["final_boxes_3d"]),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(out["final_scores"],
                               np.array(want["final_scores"]),
                               atol=1e-4)
    np.testing.assert_allclose(out["final_corr_offsets"],
                               np.array(want["final_corr_offsets"]),
                               atol=1e-3)
    np.testing.assert_array_equal(out["final_valid"],
                                  np.array(want["final_valid"]))


def test_streaming_rolls_state(setup):
    cfg, model, batch, variables = setup
    pred = StreamingPredictor(model, variables["params"])
    pred.push_keyframe(frame_view(batch, 0))
    pred.push_keyframe(frame_view(batch, 1))
    out = pred.push_keyframe(frame_view(batch, 0))
    assert out is not None  # pair (1, 0) produced from cached state
    stats = pred.latency_stats()
    assert "encode_cold" in stats and "pair" in stats
