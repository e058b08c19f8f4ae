"""Repro attempt: holdout config with the OLD gather-VJP crop path
(monkeypatched back to method='gather' wherever the model asks for the
scatter-free 'auto_train'/'gather_mmbwd' form). If this NaNs where
debug_holdout_nan.py trained cleanly, the scatter-add backward of the
gather crops was the NaN source on real data, and gather_mmbwd is a
correctness fix, not just a perf one.

Run: python benchmarks/debug_holdout_nan_oldpath.py [steps]
"""
import functools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.ops import roi  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402


def crop_oldpath(image, boxes_norm, crop_size, method="auto"):
    if method in ("auto_train", "gather_mmbwd"):
        method = "auto"
    return roi.crop_and_resize(image, boxes_norm, crop_size,
                               method=method)


dt_avod.crop_and_resize = crop_oldpath

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
ck = tempfile.mkdtemp(prefix="nan_old_ck_")
trainer = Trainer(cfg, model, ds, ck, batch_size=1)
state, history = trainer.train(max_steps=STEPS, log_every=25)
for h in history:
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in h.items()})
