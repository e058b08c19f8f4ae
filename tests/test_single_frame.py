"""Single-frame AVOD path (detection dataset + num_frames=1 model)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import detection, synthetic
from dodt_tpu.models import dt_avod

CLUSTERS = ((3.9, 1.6, 1.52),)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_object"))
    synthetic.write_detection_fixture(root, num_frames=3)
    cfg = cfg_mod.unittest_pipeline()
    cfg.model.model_name = "avod_model"
    cfg.dataset.dataset_dir = root
    cfg.dataset.kitti_utils.area_extents = (
        (-16.0, 16.0), (-3.0, 3.0), (0.0, 48.0))
    cfg.dataset.kitti_utils.anchor_strides = (1.0, 1.0)
    cfg.dataset.max_points = 8192
    ds = detection.KittiDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS,
                              num_frames=1)
    batch = ds.next_batch(1, shuffle=False, augment=False)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    rng = jax.random.PRNGKey(0)
    init_fn = jax.jit(model.init, static_argnames=("train", "mode"))
    variables = init_fn({"params": rng, "dropout": rng, "pathdrop": rng},
                        batch, train=False, mode="val")
    return cfg, model, batch, variables


def test_single_frame_forward(setup):
    cfg, model, batch, variables = setup
    apply_fn = jax.jit(model.apply, static_argnames=("train", "mode"))
    out = apply_fn(variables, batch, train=False, mode="val")
    k2 = cfg.model.avod.nms_size
    assert out["final_boxes_3d"].shape == (1, 1, k2, 7)
    assert "corr_pred" not in out
    assert np.isfinite(np.array(out["final_boxes_3d"])).all()


def test_single_frame_loss(setup):
    cfg, model, batch, variables = setup
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run(variables, batch, rng):
        out = model.apply(variables, batch, train=True, mode="train",
                          rngs={"dropout": rng, "pathdrop": rng})
        return dt_avod.compute_losses(cfg, out, batch, rng)

    total, losses = run(variables, batch, rng)
    assert np.isfinite(float(total))
    assert float(losses["corr"]) == 0.0  # no corr loss without a pair
