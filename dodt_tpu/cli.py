"""CLI entry points (reference avod/experiments/*).

  python -m dodt_tpu.cli train --config cfg.json --ckpt_dir out/ckpt
  python -m dodt_tpu.cli evaluate --config cfg.json --ckpt_dir out/ckpt
  python -m dodt_tpu.cli infer --config cfg.json --ckpt_dir out/ckpt

Mirrors run_tracking_training.py / run_tracking_evaluation.py /
run_tracking_inference.py; single-frame and stride variants are
selected by the config's model_name / data_stride.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _build(cfg_path, split):
    """Dataset+model selection by cfg.model.model_name (reference
    experiments/run_*.py family):
      avod_model           -> single-frame KittiDataset
      dt_avod_model        -> paired-frame KittiTrackingDataset
      stack_avod_model     -> N-frame KittiTrackingStackDataset
    """
    from dodt_tpu.config import PipelineConfig, cars_dt_tracking
    from dodt_tpu.data.clusters import get_clusters

    cfg = PipelineConfig.load(cfg_path) if cfg_path else cars_dt_tracking()
    name = cfg.model.model_name
    if name == "avod_model":
        from dodt_tpu.data.detection import KittiDataset
        from dodt_tpu.models.dt_avod import DtAvodNet
        ds = KittiDataset(cfg.dataset, split=split)
        # clusters computed from the single-frame dataset's own labels
        # (falls back to per-class size priors for unlabeled splits —
        # reference label_cluster_utils.get_clusters:146 serves
        # KittiDataset the same way)
        model = DtAvodNet(cfg=cfg, cluster_sizes=get_clusters(ds, cfg),
                          num_frames=1)
    elif name == "stack_avod_model":
        from dodt_tpu.data.stack import KittiTrackingStackDataset
        from dodt_tpu.models.stack import StackAvodNet
        ds = KittiTrackingStackDataset(cfg.dataset, split=split)
        model = StackAvodNet(cfg=cfg, cluster_sizes=get_clusters(ds, cfg))
    else:
        from dodt_tpu.data.tracking import KittiTrackingDataset
        from dodt_tpu.models.dt_avod import DtAvodNet
        ds = KittiTrackingDataset(cfg.dataset, split=split)
        model = DtAvodNet(cfg=cfg, cluster_sizes=get_clusters(ds, cfg))
    return cfg, ds, model


def cmd_train(args):
    from dodt_tpu.runtime.trainer import Trainer
    from dodt_tpu.parallel.mesh import make_mesh
    import jax

    cfg, ds, model = _build(args.config, "train")
    # --num_model M: tensor-parallel the wide FC trunks over an M-way
    # 'model' axis (remaining devices form the 'data' axis); params,
    # Adam moments and EMA shadows are laid out by shard_train_state
    mesh = (make_mesh(num_model=args.num_model)
            if len(jax.devices()) > 1 else None)
    trainer = Trainer(cfg, model, ds, args.ckpt_dir, mesh=mesh,
                      batch_size=args.batch_size)
    state, history = trainer.train(max_steps=args.max_steps)
    print(json.dumps(history[-5:], indent=2))
    if trainer.metrics.path:
        print(f"train metrics trail: {trainer.metrics.path}")


def cmd_evaluate(args):
    from dodt_tpu.runtime.evaluator import Evaluator

    cfg, ds, model = _build(args.config, args.split)
    ev = Evaluator(cfg, model, ds, args.ckpt_dir, args.output_dir)
    # MoI stride evaluation (reference DtEvaluatorStride): fill the
    # tau-1 non-keyframes per couple at save time. Setting it on the
    # Evaluator keeps the one-shot and --repeat polling paths under
    # the same protocol.
    ev.interpolate = args.interpolate or cfg.dataset.data_stride > 1
    if args.repeat:
        results = ev.repeated_checkpoint_run()
    else:
        results = [ev.run_checkpoint_once(args.step)]
    print(json.dumps(results[-1], indent=2, default=float))
    # joined train/eval health table when the trainer's metrics trail
    # exists next to the checkpoints
    from dodt_tpu.eval import reporting
    import os
    tm = reporting.load_train_metrics(
        os.path.join(args.ckpt_dir, "train_metrics.jsonl"))
    print(reporting.format_table(results, train_metrics=tm or None))


def cmd_infer(args):
    from dodt_tpu.runtime.evaluator import Evaluator
    from dodt_tpu.runtime.trainer import CheckpointIO

    cfg, ds, model = _build(args.config, args.split)
    ev = Evaluator(cfg, model, ds, args.ckpt_dir, args.output_dir)
    params = CheckpointIO(args.ckpt_dir).restore_params(args.step)
    import time
    times = []
    for idx in range(min(len(ds.couples), args.max_samples)):
        t0 = time.time()
        ev.predict_couple(params, idx)
        times.append(time.time() - t0)
    times = np.array(times[1:])  # drop compile
    print(json.dumps({
        "mean_s": float(times.mean()), "median_s": float(np.median(times)),
        "min_s": float(times.min()), "max_s": float(times.max()),
        "fps_pairs": float(1.0 / times.mean()),
    }))


def cmd_demo(args):
    """Qualitative demos (reference demos/kitti_bev_vis.py,
    demos/generate_anchors.py, demos/dataset/* statistics)."""
    import os
    import jax.numpy as jnp
    from dodt_tpu.ops.voxel import bev_maps_from_points
    from dodt_tpu.ops import boxes as box_ops
    from dodt_tpu.ops.anchors import tile_anchors_3d
    from dodt_tpu import viz

    cfg, ds, model = _build(args.config, args.split)
    os.makedirs(args.output_dir, exist_ok=True)
    ku = cfg.dataset.kitti_utils
    bg = ku.bev_generator
    sample = ds.load_couple(args.sample)

    maps = bev_maps_from_points(
        jnp.asarray(sample["points"][0]),
        jnp.asarray(sample["points_valid"][0]),
        jnp.asarray(sample["ground_plane"]),
        area_extents=np.asarray(ku.area_extents, np.float32),
        voxel_size=ku.voxel_size, height_lo=bg.height_lo,
        height_hi=bg.height_hi, num_slices=bg.num_slices)
    gt = sample["gt_boxes"][0][sample["gt_valid"][0]]
    bev_png = viz.draw_bev(np.asarray(maps.features), ku.area_extents,
                           gt_boxes=gt,
                           path=os.path.join(args.output_dir,
                                             "bev_sample.png"))

    # anchor grid demo: every 250th anchor footprint over the BEV
    anchors3d = np.asarray(tile_anchors_3d(
        np.asarray(ku.area_extents, np.float32),
        np.asarray([[3.9, 1.6, 1.52]], np.float32),
        ku.anchor_strides, sample["ground_plane"]))
    anchor_png = viz.draw_bev(
        np.asarray(maps.features), ku.area_extents,
        pred_boxes=anchors3d[::250],
        path=os.path.join(args.output_dir, "anchor_grid.png"))

    # dataset statistics (reference demos/dataset/{car_clustering,
    # data_histograms}.py): per-class counts + size means
    stats = {}
    seen = set()
    for cp in ds.couples:
        for frame in (cp.frame_a, cp.frame_b):
            if (cp.video_id, frame) in seen:
                continue
            seen.add((cp.video_id, frame))
            lab = ds.labels(cp.video_id, frame)
            for i, t in enumerate(lab.types):
                s = stats.setdefault(t, {"count": 0, "lwh_sum":
                                         np.zeros(3)})
                s["count"] += 1
                s["lwh_sum"] += lab.box_3d[i, 3:6]
    out_stats = {t: {"count": s["count"],
                     "mean_lwh": (s["lwh_sum"] / max(s["count"], 1)
                                  ).round(3).tolist()}
                 for t, s in stats.items()}
    with open(os.path.join(args.output_dir, "dataset_stats.json"),
              "w") as f:
        json.dump(out_stats, f, indent=2)
    print(json.dumps({"bev": bev_png, "anchors": anchor_png,
                      "stats": out_stats}, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser("dodt_tpu")
    # device selection (reference experiments use CUDA_VISIBLE_DEVICES,
    # e.g. run_stack_tracking_training.py:88): jax.config is the only
    # override that sticks in environments where a site hook re-prepends
    # platforms to JAX_PLATFORMS
    p.add_argument("--platform", default=None,
                   help="jax platform override, e.g. cpu / tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--config", default=None)
    t.add_argument("--ckpt_dir", required=True)
    t.add_argument("--batch_size", type=int, default=1)
    t.add_argument("--max_steps", type=int, default=None)
    t.add_argument("--num_model", type=int, default=1,
                   help="tensor-parallel width for the FC trunks "
                        "(devices are arranged data x model)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate")
    e.add_argument("--config", default=None)
    e.add_argument("--ckpt_dir", required=True)
    e.add_argument("--output_dir", default="eval_out")
    e.add_argument("--split", default="val")
    e.add_argument("--step", type=int, default=None)
    e.add_argument("--repeat", action="store_true")
    e.add_argument("--interpolate", action="store_true",
                   help="MoI-fill non-keyframes (auto when "
                        "data_stride > 1)")
    e.set_defaults(fn=cmd_evaluate)

    i = sub.add_parser("infer")
    i.add_argument("--config", default=None)
    i.add_argument("--ckpt_dir", required=True)
    i.add_argument("--output_dir", default="infer_out")
    i.add_argument("--split", default="val")
    i.add_argument("--step", type=int, default=None)
    i.add_argument("--max_samples", type=int, default=200)
    i.set_defaults(fn=cmd_infer)

    d = sub.add_parser("demo")
    d.add_argument("--config", default=None)
    d.add_argument("--output_dir", default="demo_out")
    d.add_argument("--split", default="train")
    d.add_argument("--sample", type=int, default=0)
    d.set_defaults(fn=cmd_demo)

    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
