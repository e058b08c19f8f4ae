"""Runtime pieces: optimizer schedule, frozen subtrees, checkpoint
partial restore (staged transfer learning), reporting."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from dodt_tpu import config as cfg_mod
from dodt_tpu.runtime import trainer as trainer_lib
from dodt_tpu.eval import reporting


def test_lr_schedule():
    cfg = cfg_mod.unittest_pipeline()
    cfg.train.optimizer.initial_lr = 1e-4
    cfg.train.optimizer.decay_steps = 100
    cfg.train.optimizer.decay_factor = 0.5
    sched = trainer_lib.make_lr_schedule(cfg)
    assert abs(float(sched(0)) - 1e-4) < 1e-9
    assert abs(float(sched(100)) - 5e-5) < 1e-9
    assert abs(float(sched(150)) - 5e-5) < 1e-9  # staircase


def test_frozen_subtrees_zero_gradient():
    cfg = cfg_mod.unittest_pipeline()
    cfg.train.frozen_subtrees = ("encoder",)
    params = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    mask = trainer_lib.frozen_mask_from_subtrees(
        params, cfg.train.frozen_subtrees)
    assert mask["encoder"]["w"] is True
    assert mask["head"]["w"] is False
    tx = trainer_lib.make_optimizer(cfg, mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["head"]["w"]).max()) > 0.0


def test_checkpoint_partial_restore(tmp_path):
    ck_a = trainer_lib.CheckpointIO(str(tmp_path / "a"))
    params_a = {"bev_vgg_pyr": {"w": jnp.full(4, 7.0)},
                "rpn_cls": {"w": jnp.full(2, 3.0)}}
    state = trainer_lib.TrainState(step=jnp.int32(5), params=params_a,
                                   opt_state=None)
    ck_a.save(5, state)

    params_b = {"bev_vgg_pyr": {"w": jnp.zeros(4)},
                "rpn_cls": {"w": jnp.zeros(2)}}
    ck_b = trainer_lib.CheckpointIO(str(tmp_path / "b"))
    merged = ck_b.restore_subtrees(params_b, str(tmp_path / "a"),
                                   ("bev_vgg_pyr",))
    np.testing.assert_allclose(np.asarray(merged["bev_vgg_pyr"]["w"]),
                               7.0)
    np.testing.assert_allclose(np.asarray(merged["rpn_cls"]["w"]), 0.0)


def test_reporting(tmp_path):
    import json
    for step, m in ((2, 50.0), (4, 60.0), (6, 55.0)):
        res = {"step": step,
               "ap": {"AP_3D": {"easy": m + 5, "moderate": m,
                                "hard": m - 5},
                      "AP_BEV": {"easy": 1, "moderate": 1, "hard": 1},
                      "AP_2D": {"easy": 1, "moderate": 1, "hard": 1}},
               "mot": {"overall": {"MOTA": 70.0}}}
        with open(tmp_path / f"results_{step}.json", "w") as f:
            json.dump(res, f)
    results = reporting.load_results(str(tmp_path))
    assert [r["step"] for r in results] == [2, 4, 6]
    top = reporting.top_checkpoints(results, k=2)
    assert top[0]["step"] == 4
    table = reporting.format_table(results)
    assert "60.00" in table
    p = reporting.plot_ap(results, str(tmp_path / "ap.png"))
    import os
    assert os.path.getsize(p) > 500
