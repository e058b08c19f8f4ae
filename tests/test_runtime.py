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


def test_checkpoint_full_state_resume(tmp_path):
    """Resumed run must be step-for-step identical to an uninterrupted
    one: Adam moments, schedule step, and EMA shadows all survive."""
    cfg = cfg_mod.unittest_pipeline()
    cfg.train.optimizer.use_moving_average = True
    decay = cfg.train.optimizer.moving_average_decay
    tx = trainer_lib.make_optimizer(cfg)

    def fresh_state():
        params = {"head": {"w": jnp.arange(4.0), "b": jnp.ones(2)}}
        return trainer_lib.TrainState(
            step=jnp.int32(0), params=params,
            opt_state=tx.init(params), ema_params=params)

    grads = [{"head": {"w": jnp.full(4, g), "b": jnp.full(2, -g)}}
             for g in (1.0, 0.5, 2.0)]

    def one_step(state, g):
        updates, new_opt = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p,
            state.ema_params, new_params)
        return trainer_lib.TrainState(state.step + 1, new_params,
                                      new_opt, ema)

    # uninterrupted: 3 steps
    ref = fresh_state()
    for g in grads:
        ref = one_step(ref, g)

    # interrupted: 2 steps, save, restore into a fresh template, 1 step
    ck = trainer_lib.CheckpointIO(str(tmp_path / "ck"))
    state = fresh_state()
    for g in grads[:2]:
        state = one_step(state, g)
    ck.save(2, state)
    restored = ck.restore_state(fresh_state())
    assert int(restored.step) == 2
    resumed = one_step(restored, grads[2])

    for name, a, b in (("params", ref.params, resumed.params),
                       ("opt", ref.opt_state, resumed.opt_state),
                       ("ema", ref.ema_params, resumed.ema_params)):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=0, rtol=0, err_msg=name)


def test_checkpoint_prefer_ema(tmp_path):
    cfg = cfg_mod.unittest_pipeline()
    tx = trainer_lib.make_optimizer(cfg)
    params = {"head": {"w": jnp.zeros(3)}}
    ema = {"head": {"w": jnp.full(3, 9.0)}}
    state = trainer_lib.TrainState(step=jnp.int32(1), params=params,
                                   opt_state=tx.init(params),
                                   ema_params=ema)
    ck = trainer_lib.CheckpointIO(str(tmp_path / "ck"))
    ck.save(1, state)
    np.testing.assert_allclose(
        np.asarray(ck.restore_params(prefer_ema=True)["head"]["w"]), 9.0)
    np.testing.assert_allclose(
        np.asarray(ck.restore_params()["head"]["w"]), 0.0)


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
    # join with a train-metrics trail (latest loss at/before each step;
    # tolerate the truncated tail a killed run leaves)
    tm_path = tmp_path / "train_metrics.jsonl"
    with open(tm_path, "w") as f:
        f.write(json.dumps({"step": 1, "total": 9.0}) + "\n")
        f.write(json.dumps({"step": 4, "total": 3.0}) + "\n")
        f.write('{"step": 6, "tot')          # mid-write kill
    tm = reporting.load_train_metrics(str(tm_path))
    assert [r["step"] for r in tm] == [1, 4]
    joined = reporting.format_table(results, train_metrics=tm)
    assert "train_loss" in joined.splitlines()[0]
    assert "9.000" in joined and "3.000" in joined
    p = reporting.plot_ap(results, str(tmp_path / "ap.png"))
    import os
    assert os.path.getsize(p) > 500
