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


def test_single_frame_evaluator(setup, tmp_path):
    """The Evaluator's single-frame branch (reference evaluator.py):
    per-sample KITTI txt + official-protocol AP, no tracking axis."""
    import os
    from dodt_tpu.runtime.trainer import CheckpointIO, create_train_state
    from dodt_tpu.runtime.evaluator import Evaluator
    from dodt_tpu.data import detection

    cfg, model, batch, variables = setup
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    ck = CheckpointIO(str(tmp_path / "ckpt"))
    ck.save(1, state._replace(step=np.int32(1)))

    ds = detection.KittiDataset(cfg.dataset, split="train")
    ev = Evaluator(cfg, model, ds, ckpt_dir=str(tmp_path / "ckpt"),
                   output_dir=str(tmp_path / "eval"))
    results = ev.run_checkpoint_once(1)
    assert set(results["ap"].keys()) == {"AP_2D", "AP_BEV", "AP_3D"}
    assert "mot" not in results
    pred_dir = str(tmp_path / "eval" / "predictions_1" / "data")
    assert sorted(os.listdir(pred_dir)) == \
        sorted(f"{n}.txt" for n in ds.sample_names)
