"""Model configuration variants: box representations, fusion methods
and types, plain (non-pyramid) extractors.

Each variant builds the full DT model on the synthetic fixture, runs a
forward + loss, and checks shapes/finiteness (the reference's model
test pattern, e.g. avod_model_test.py, parameterized over the config
surface instead of one config per file).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_variants"))
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=4,
                                     ego_speed=1.0)
    return root


def _cfg(root):
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    cfg.dataset.video_train_ids = (0,)
    return cfg


def _run(cfg, root):
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "pathdrop": rng}
    variables = model.init(rngs, batch, train=True, mode="train")
    out = model.apply(variables, batch, train=True, mode="train",
                      rngs={"dropout": rng, "pathdrop": rng})
    total, losses = dt_avod.compute_losses(cfg, out, batch, rng)
    assert np.isfinite(float(total)), losses
    assert np.isfinite(np.array(out["final_boxes_3d"])).all()
    return out, losses


@pytest.mark.parametrize("rep", ["box_3d", "box_4c", "box_4ca",
                                 "box_8c"])
def test_box_representations(data, rep):
    cfg = _cfg(data)
    cfg.model.avod.box_representation = rep
    out, losses = _run(cfg, data)
    from dodt_tpu.models.dt_avod import OFFSETS_SIZE, ANGLE_SIZE
    assert out["box_offsets"].shape[-1] == OFFSETS_SIZE[rep]
    if ANGLE_SIZE[rep]:
        assert out["angle_vectors"].shape[-1] == 2
    else:
        assert out["angle_vectors"] is None
    assert float(losses["avod_ang"]) == 0.0 or ANGLE_SIZE[rep]


@pytest.mark.parametrize("method,ftype", [("concat", "early"),
                                          ("max", "late"),
                                          ("mean", "deep")])
def test_fusion_variants(data, method, ftype):
    cfg = _cfg(data)
    cfg.model.rpn.fusion_method = "concat" if method == "concat" \
        else "mean"
    cfg.model.avod.fusion_method = method
    cfg.model.avod.fusion_type = ftype
    _run(cfg, data)


def test_plain_vgg(data):
    cfg = _cfg(data)
    cfg.model.bev_extractor.pyramid = False
    cfg.model.img_extractor.pyramid = False
    cfg.model.bev_extractor.conv4 = (2, 32)
    cfg.model.img_extractor.conv4 = (2, 32)
    _run(cfg, data)


def test_feature_fuse_semantics():
    a = jnp.ones((4, 3)) * 2.0
    b = jnp.ones((4, 3)) * 4.0
    mean = dt_avod.feature_fuse(a, b, 1.0, 1.0, "mean")
    np.testing.assert_allclose(np.array(mean), 3.0)
    # dropped image path: mean == bev
    mean_drop = dt_avod.feature_fuse(a, b, 1.0, 0.0, "mean")
    np.testing.assert_allclose(np.array(mean_drop), 2.0)
    cat = dt_avod.feature_fuse(a, b, 1.0, 1.0, "concat")
    assert cat.shape == (4, 6)
    mx = dt_avod.feature_fuse(a, b, 1.0, 1.0, "max")
    np.testing.assert_allclose(np.array(mx), 4.0)


def test_multiclass_people(data):
    cfg = _cfg(data)
    cfg.dataset.classes = ("Car", "Pedestrian")
    cfg.dataset.num_clusters = (1, 1)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(
        cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52), (0.8, 0.6, 1.73)))
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "pathdrop": rng},
        batch, train=False, mode="val")
    out = model.apply(variables, batch, train=False, mode="val")
    assert out["cls_logits"].shape[-1] == 3      # bkg + 2 classes
    assert out["final_cls_softmax"].shape[-1] == 3
    total, _ = dt_avod.compute_losses(cfg, out, batch, rng)
    assert np.isfinite(float(total))


def test_two_pass_rpn_train_and_eval(data):
    """fusion_top_k below the anchor count activates the two-pass RPN:
    train samples the mini-batch inside the forward (rpn_mb outputs),
    eval fuses image ROIs only for the candidates."""
    cfg = _cfg(data)
    cfg.model.rpn.fusion_top_k = 128
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "pathdrop": rng,
            "sampling": rng}
    variables = model.init(rngs, batch, train=True, mode="train")
    n_anchors = None
    out = model.apply(variables, batch, train=True, mode="train",
                      rngs={"dropout": rng, "pathdrop": rng,
                            "sampling": rng})
    assert "rpn_mb" in out
    s = cfg.dataset.mini_batch.rpn_mini_batch_size
    assert out["rpn_mb"]["objectness"].shape[2] == s
    assert out["top_anchors"].shape[2] == cfg.model.rpn.train_nms_size
    total, losses = dt_avod.compute_losses(cfg, out, batch, rng)
    assert np.isfinite(float(total)), losses
    assert float(losses["rpn_cls"]) > 0

    # eval mode: no mini-batch outputs, NMS over candidates only
    out_v = model.apply(variables, batch, train=False, mode="val")
    assert "rpn_mb" not in out_v
    assert out_v["top_anchors"].shape[2] == cfg.model.rpn.test_nms_size
    assert np.isfinite(np.array(out_v["final_boxes_3d"])).all()
