"""Eval-while-train concurrency (VERDICT r3 item 7).

The reference's documented deployment runs the trainer and the evaluator
as TWO concurrent processes sharing one device, coordinating only
through the checkpoint directory (/root/reference/README.md:416;
dt_evaluator.py:461-533 polls every eval_wait_interval seconds and skips
already-evaluated checkpoints). This test reproduces that deployment:
a real `python -m dodt_tpu.cli train` subprocess writes checkpoints
while the in-process Evaluator's `repeated_checkpoint_run` polls the
same directory — every checkpoint must be picked up exactly once, and at
least one must be scored while the trainer process is still alive (the
poller must see checkpoints written by the OTHER process, which requires
the orbax manager to re-list the directory rather than trust its
in-process cache).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod
from dodt_tpu.runtime.evaluator import Evaluator

CLUSTERS = ((3.9, 1.6, 1.52),)
LAST_STEP = 14


def test_evaluator_polls_live_trainer(tmp_path):
    root = str(tmp_path / "kitti")
    synthetic.write_tracking_fixture(root, num_videos=1, num_frames=6,
                                     ego_speed=0.3)
    cfg = cfg_mod.unittest_pipeline()
    cfg.dataset.dataset_dir = root
    cfg.dataset.video_train_ids = (0,)
    cfg.train.checkpoint_interval = 2
    cfg.train.max_iterations = LAST_STEP
    cfg.eval.eval_wait_interval = 1
    cfg_path = str(tmp_path / "cfg.json")
    cfg.save(cfg_path)
    ckpt_dir = str(tmp_path / "ckpt")

    ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    ev = Evaluator(cfg, model, ds, ckpt_dir=ckpt_dir,
                   output_dir=str(tmp_path / "eval"))
    # warm the eval jit BEFORE launching the trainer, so polling latency
    # after a checkpoint appears is seconds, not a compile
    rng = jax.random.PRNGKey(0)
    sample = ds.load_couple(0, augs=())
    init_batch = {k: jnp.asarray(np.stack([v] * cfg.eval.batch_size))
                  for k, v in sample.items()
                  if isinstance(v, np.ndarray)}
    warm_params = jax.jit(model.init, static_argnames=("train", "mode"))(
        {"params": rng, "dropout": rng, "pathdrop": rng}, init_batch,
        train=False, mode="val")["params"]
    ev.predict_couples(warm_params, [0])

    # the trainer is a REAL separate process through the CLI entry
    # point (reference run_tracking_training.py), single CPU device.
    # --platform cpu, not env: a site hook re-prepends the ambient
    # platform to JAX_PLATFORMS, so only jax.config sticks (conftest.py)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "dodt_tpu.cli", "--platform", "cpu",
         "train", "--config", cfg_path, "--ckpt_dir", ckpt_dir,
         "--max_steps", str(LAST_STEP)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    # spy on run_checkpoint_once to record whether the trainer process
    # was still alive when each checkpoint got scored
    scored_while_alive = []
    orig = ev.run_checkpoint_once

    def spy(step=None, **kw):
        scored_while_alive.append((step, proc.poll() is None))
        return orig(step, **kw)

    ev.run_checkpoint_once = spy
    try:
        results = ev.repeated_checkpoint_run(max_wait_rounds=600,
                                             stop_at_step=LAST_STEP)
    finally:
        out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out

    steps = [r["step"] for r in results]
    # every checkpoint picked up, none missed, none double-scored
    assert steps == list(range(2, LAST_STEP + 1, 2)), (steps, out)
    for r in results:
        assert "ap" in r and "mot" in r
    # genuine concurrency: at least one checkpoint was scored while the
    # trainer process was still running
    assert any(alive for _, alive in scored_while_alive), \
        scored_while_alive
