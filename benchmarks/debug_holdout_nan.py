"""Diagnose the NaN divergence in the holdout training config
(train_real_holdout_ap.py: clips 0+1, lr 1e-3 — every logged loss was
NaN by step 500, while the r2 run with clips 0+1+2 at the same lr
trained to AP 80). Logs every 25 steps, reports the first NaN step and
the per-term losses just before, then retries from the last healthy
checkpoint region with debug ideas.

Run: python benchmarks/debug_holdout_nan.py [steps]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402

FIXTURE = "/root/reference/avod/tests/datasets/Kitti/tracking"
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600

cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = FIXTURE
cfg.dataset.max_points = 32768
cfg.dataset.video_train_ids = (0, 1)
cfg.train.checkpoint_interval = 10 ** 9
cfg.train.optimizer.initial_lr = 1e-3

ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
print(f"{len(ds.couples)} train couples")
model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=((3.9, 1.6, 1.52),))
ck = tempfile.mkdtemp(prefix="nan_ck_")
trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=25)
for h in history:
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in h.items()})
