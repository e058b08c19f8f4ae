"""Host/device overlap evidence: train-step wall time with and without
the background prefetch thread (Trainer.train `prefetch` arg), on the
real TPU at production shapes with the real host pipeline (synthetic
KITTI fixture on disk -> KittiTrackingDataset -> BEV inputs).

Per-step times come from in-run history wall-clock deltas, skipping the
compile/restore steps, so checkpoint saves don't pollute the numbers.

Run: python benchmarks/profile_train_overlap.py
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod
from dodt_tpu.data import synthetic, tracking
from dodt_tpu.models import dt_avod
from dodt_tpu.runtime.trainer import Trainer

STEPS = 15

root = tempfile.mkdtemp(prefix="overlap_fixture_")
synthetic.write_tracking_fixture(root, num_videos=1, num_frames=14,
                                 ego_speed=0.5)
cfg = cfg_mod.cars_dt_tracking()
cfg.dataset.dataset_dir = root
cfg.dataset.max_points = 65536
cfg.dataset.video_train_ids = (0,)
ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
model = dt_avod.DtAvodNet(cfg=cfg,
                          cluster_sizes=((3.9, 1.6, 1.52),))

# host-pipeline cost alone
t0 = time.perf_counter()
for _ in range(4):
    ds.next_batch(1, augment=True)
host_ms = (time.perf_counter() - t0) / 4 * 1e3
print(f"host next_batch: {host_ms:.1f} ms")

ck = tempfile.mkdtemp(prefix="overlap_ck_")
trainer = Trainer(cfg, model, ds, ck, batch_size=1)
for i, prefetch in enumerate((0, 2)):
    _, history = trainer.train(max_steps=(i + 1) * STEPS, log_every=1,
                               prefetch=prefetch)
    deltas = np.diff([h["wall_s"] for h in history])[2:] * 1e3
    print(f"prefetch={prefetch}: median {np.median(deltas):.1f} ms/step"
          f" (mean {np.mean(deltas):.1f})")
