"""Detection quality smoke signal: the DT model must LEARN.

Trains the flagship paired-frame architecture (at unittest capacity,
CPU-feasible) on a fully-learnable synthetic fixture and asserts the
fast-converging learning signals measured on a TPU probe of this exact
config at 150 steps:

* window-averaged total loss drops sharply (13.1 -> ~7.5),
* RPN objectness loss more than halves (0.39 -> 0.11),
* correlation-offset loss collapses (6.2 -> 0.18),
* RPN proposal recall of the GT cars rises 0.25 -> 0.75.

The END-TO-END accuracy evidence (AP through the official-protocol
evaluator) is recorded in results_r02/fixture_ap.json by
benchmarks/train_fixture_ap.py: the FULL cars_dt_tracking model reaches
AP_3D moderate 81.7 and MOTA 59.3 within 600 steps on TPU. The tiny
test model's second-stage box regression converges too slowly for a
stable in-suite AP floor at 150 steps (its AP crosses 0 -> ~5 with high
seed variance), so this test pins the stage-wise signals instead.
"""
import numpy as np
import pytest

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_learn"))
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=8,
                                     ego_speed=0.3, num_cars=4,
                                     points_per_car=768)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-12.0, 12.0), (-3.0, 3.0), (0.0, 32.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    cfg.dataset.video_train_ids = (0,)
    cfg.dataset.mini_batch.rpn_mini_batch_size = 256
    cfg.dataset.mini_batch.avod_mini_batch_size = 256
    cfg.model.rpn.train_nms_size = 128
    cfg.model.rpn.test_nms_size = 64
    cfg.model.avod.nms_size = 16
    # fixture-scale schedule (LR sweep, round 2): 1e-3 learns ~3x
    # faster than the reference's 120k-step 1e-4 default
    cfg.train.optimizer.initial_lr = 1e-3
    return root, cfg


def _aligned_bev_iou(a, b):
    """Axis-aligned BEV IoU of two box_3d rows (recall proxy)."""
    ax1, az1 = a[0] - a[3] / 2, a[2] - a[4] / 2
    ax2, az2 = a[0] + a[3] / 2, a[2] + a[4] / 2
    bx1, bz1 = b[0] - b[3] / 2, b[2] - b[4] / 2
    bx2, bz2 = b[0] + b[3] / 2, b[2] + b[4] / 2
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iz = max(0.0, min(az2, bz2) - max(az1, bz1))
    inter = ix * iz
    union = ((ax2 - ax1) * (az2 - az1) +
             (bx2 - bx1) * (bz2 - bz1) - inter)
    return inter / max(union, 1e-9)


def _proposal_recall(model, params, ds, apply_fn):
    """Fraction of GT cars covered by an RPN top proposal at BEV
    IoU > 0.3 over a few couples."""
    import jax.numpy as jnp
    from dodt_tpu.ops import boxes as box_ops

    hits, total = 0, 0
    for idx in (0, 3, 6):
        s = ds.load_couple(idx, augs=())
        batch = {k: jnp.asarray(v)[None] for k, v in s.items()
                 if isinstance(v, np.ndarray)}
        out = apply_fn({"params": params}, batch, train=False,
                       mode="val")
        props = np.array(box_ops.anchors_to_box_3d(
            out["top_anchors"][0, 0]))
        props = props[np.array(out["top_valid"][0, 0])]
        for g in range(s["gt_valid"].shape[1]):
            if not s["gt_valid"][0][g]:
                continue
            total += 1
            gt = s["gt_boxes"][0][g]
            if any(_aligned_bev_iou(p, gt) > 0.3 for p in props):
                hits += 1
    return hits / max(total, 1)


def test_model_learns_all_stages(world, tmp_path):
    import jax
    from dodt_tpu.runtime.trainer import Trainer

    root, cfg = world
    steps = 150
    cfg.train.checkpoint_interval = steps

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    trainer = Trainer(cfg, model, ds, str(tmp_path / "ckpt"),
                      batch_size=1)
    state0 = trainer.init_or_restore()
    params0 = state0.params

    state, history = trainer.train(max_steps=steps, log_every=25)
    totals = [h["total"] for h in history]  # window-averaged
    assert np.isfinite(totals).all()
    # total loss drops sharply (TPU probe: 13.1 -> ~7.5)
    assert min(totals[1:]) < 0.75 * totals[0], totals
    # RPN objectness more than halves (0.39 -> 0.11)
    rpn_cls = [h["rpn_cls"] for h in history]
    assert min(rpn_cls[1:]) < 0.5 * rpn_cls[0], rpn_cls
    # correlation-offset loss collapses (6.2 -> 0.18)
    corr = [h["corr"] for h in history]
    assert min(corr[1:]) < 0.3 * corr[0], corr

    # RPN proposal recall of the GT cars rises (0.25 -> 0.75)
    apply_fn = jax.jit(model.apply, static_argnames=("train", "mode"))
    r0 = _proposal_recall(model, params0, ds, apply_fn)
    r1 = _proposal_recall(model, state.params, ds, apply_fn)
    assert r1 >= 0.5, (r0, r1)
    assert r1 >= r0 + 0.2, (r0, r1)


@pytest.mark.skipif("RUN_SLOW_TESTS" not in __import__("os").environ,
                    reason="nightly: set RUN_SLOW_TESTS=1 (600-step "
                           "CPU train, ~30 min on a 1-core box)")
def test_end_to_end_ap_improves(world, tmp_path):
    """Nightly end-to-end regression (ADVICE r2): trained AP_3D through
    the official-protocol evaluator must beat the untrained baseline
    and clear a floor — catches second-stage box-decode regressions
    that leave the stage-wise losses healthy."""
    from dodt_tpu.runtime.evaluator import Evaluator
    from dodt_tpu.runtime.trainer import Trainer

    root, cfg = world
    steps = 600
    cfg.train.checkpoint_interval = steps

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    trainer = Trainer(cfg, model, ds, str(tmp_path / "ckpt"),
                      batch_size=1)
    state0 = trainer.init_or_restore()
    trainer.ckpt.save(0, state0)
    trainer.train(max_steps=steps, log_every=100)

    ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    ev = Evaluator(cfg, model, ev_ds, str(tmp_path / "ckpt"),
                   str(tmp_path / "eval"))
    ap_untrained = ev.run_checkpoint_once(0)["ap"]["AP_3D"]["moderate"]
    ap_trained = ev.run_checkpoint_once(steps)["ap"]["AP_3D"]["moderate"]
    assert ap_trained > ap_untrained, (ap_untrained, ap_trained)
    assert ap_trained > 30.0, ap_trained
