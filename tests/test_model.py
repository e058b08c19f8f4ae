import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_model"))
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=4,
                                     ego_speed=1.0)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    cfg.dataset.video_train_ids = (0,)
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
    variables = init_fn(
        {"params": rng, "dropout": rng, "pathdrop": rng, "sampling": rng},
        batch, train=False, mode="val")
    apply_eval = jax.jit(model.apply, static_argnames=("train", "mode"))
    return cfg, model, batch, variables, apply_eval


def test_forward_shapes(setup):
    cfg, model, batch, variables, apply_eval = setup
    out = apply_eval(variables, batch, train=False, mode="val")
    b = batch["points"].shape[0]
    k = cfg.model.rpn.test_nms_size
    k2 = cfg.model.avod.nms_size
    assert out["top_anchors"].shape == (b, 2, k, 6)
    assert out["final_boxes_3d"].shape == (b, 2, k2, 7)
    assert out["final_scores"].shape == (b, 2, k2)
    assert out["corr_pred"].shape[0] == b
    assert out["final_corr_offsets"].shape == (b, k2, 3)
    assert np.isfinite(np.array(out["final_boxes_3d"])).all()


def test_anchor_validity_nontrivial(setup):
    cfg, model, batch, variables, apply_eval = setup
    out = apply_eval(variables, batch, train=False, mode="val")
    valid = np.array(out["anchor_valid"])
    frac = valid.mean()
    assert 0.001 < frac < 0.95, frac  # some anchors filtered, some kept


def test_losses_finite(setup):
    cfg, model, batch, variables, apply_eval = setup
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run(variables, batch, rng):
        out = model.apply(variables, batch, train=True, mode="train",
                          rngs={"dropout": rng, "pathdrop": rng})
        return dt_avod.compute_losses(cfg, out, batch, rng)

    total, losses = run(variables, batch, rng)
    for name, val in losses.items():
        v = float(val)
        assert np.isfinite(v), (name, v)
    assert float(total) > 0


def test_grads_flow(setup):
    cfg, model, batch, variables, apply_eval = setup
    rng = jax.random.PRNGKey(2)

    def loss_fn(params):
        out = model.apply({"params": params}, batch, train=True,
                          mode="train",
                          rngs={"dropout": rng, "pathdrop": rng})
        total, _ = dt_avod.compute_losses(cfg, out, batch, rng)
        return total

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.array(g)).all() for g in leaves)
    # some gradient reaches the towers and heads
    norms = {k: float(jnp.sqrt(sum(jnp.sum(x * x)
             for x in jax.tree_util.tree_leaves(v))))
             for k, v in grads.items()}
    assert norms["bev_vgg_pyr"] > 0
    assert norms["rpn_cls"] > 0
    assert norms["avod_fc"] > 0
