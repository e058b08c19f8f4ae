"""Staged training flow executed end-to-end (VERDICT r2 item 6):
(1) pretrain the single-frame detector (`cars_single_frame`) on a
    synthetic detection fixture,
(2) restore the detector subtrees into the paired DT model with the
    backbone frozen (`cars_dt_tracking_staged`, the reference's
    trainer.py:64-183 flow as named subtrees) and train the correlation
    branch,
(3) train an identical DT model from scratch,
and record the convergence delta (loss + AP/MOT trajectories at
matched steps).

Results land in results_r04/staged_vs_scratch.json.
Run: python benchmarks/train_staged_vs_scratch.py [dt_steps] [pre_steps]
"""
import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu import config as cfg_mod  # noqa: E402
from dodt_tpu.data import detection, synthetic, tracking  # noqa: E402
from dodt_tpu.models import dt_avod  # noqa: E402
from dodt_tpu.runtime.trainer import Trainer  # noqa: E402
from dodt_tpu.runtime.evaluator import Evaluator  # noqa: E402

DT_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
PRE_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 600
EVAL_EVERY = DT_STEPS // 4
CLUSTERS = ((3.9, 1.6, 1.52),)

obj_root = tempfile.mkdtemp(prefix="staged_obj_")
trk_root = tempfile.mkdtemp(prefix="staged_trk_")
# The pretrain set is parameter-matched to the tracking fixture
# (same car density / point density; different seeds): the reference's
# staged flow pretrains on the same data distribution the DT stage
# sees — a mismatched pretrain caps the transferred (frozen) detector
# far below what the DT fixture supports.
DET_FIXTURE = dict(num_frames=8, num_scenes=3, num_cars=7,
                   points_per_car=512)
TRK_FIXTURE = dict(num_videos=2, num_frames=10, ego_speed=0.4,
                   num_cars=7, points_per_car=512)
synthetic.write_detection_fixture(obj_root, **DET_FIXTURE)
synthetic.write_tracking_fixture(trk_root, **TRK_FIXTURE)
# fingerprint of the (seed-deterministic) fixture parameters: separate
# invocations may only be merged into one results file when they saw
# identical data
FINGERPRINT = hashlib.sha256(json.dumps(
    {"det": DET_FIXTURE, "trk": TRK_FIXTURE, "dt_steps": DT_STEPS,
     "pre_steps": PRE_STEPS}, sort_keys=True).encode()).hexdigest()[:16]

SCRATCH_ONLY = "--scratch-only" in sys.argv

# ---- stage 1: single-frame pretrain
if not SCRATCH_ONLY:
    cfg1 = cfg_mod.cars_single_frame()
    cfg1.dataset.dataset_dir = obj_root
    cfg1.dataset.max_points = 32768
    cfg1.train.checkpoint_interval = PRE_STEPS
    cfg1.train.optimizer.initial_lr = 1e-3
    ds1 = detection.KittiDataset(cfg1.dataset, split="train")
    model1 = dt_avod.DtAvodNet(cfg=cfg1, cluster_sizes=CLUSTERS,
                               num_frames=1)
    pre_ck = tempfile.mkdtemp(prefix="staged_pre_")
    t1 = Trainer(cfg1, model1, ds1, pre_ck, batch_size=1)
    _, pre_hist = t1.train(max_steps=PRE_STEPS,
                           log_every=PRE_STEPS // 4)
    print("pretrain done:", [(h["step"], round(h["total"], 3))
                             for h in pre_hist])


def run_dt(tag, cfg_fn, steps=None):
    cfg = cfg_fn()
    cfg.dataset.dataset_dir = trk_root
    cfg.dataset.max_points = 32768
    cfg.dataset.video_train_ids = (0, 1)
    cfg.train.checkpoint_interval = EVAL_EVERY
    cfg.train.optimizer.initial_lr = 1e-3
    ds = tracking.KittiTrackingDataset(cfg.dataset, split="train")
    model = dt_avod.DtAvodNet(cfg=cfg, cluster_sizes=CLUSTERS)
    ck = tempfile.mkdtemp(prefix=f"staged_{tag}_")
    tr = Trainer(cfg, model, ds, ck, batch_size=1)
    _, hist = tr.train(max_steps=steps or DT_STEPS,
                       log_every=EVAL_EVERY)
    ev_ds = tracking.KittiTrackingDataset(cfg.dataset, split="trainval")
    ev = Evaluator(cfg, model, ev_ds, ckpt_dir=ck,
                   output_dir=tempfile.mkdtemp(prefix=f"ev_{tag}_"))
    traj = []
    for step in tr.ckpt.all_steps():
        r = ev.run_checkpoint_once(step)
        traj.append({
            "step": step,
            "AP_3D_moderate": r["ap"]["AP_3D"]["moderate"],
            "AP_BEV_moderate": r["ap"]["AP_BEV"]["moderate"],
            "MOTA": r["mot"].get("overall", {}).get("MOTA")})
        print(tag, traj[-1])
    return {"loss_history": hist, "ap_trajectory": traj}, ck


OUT = "results_r04/staged_vs_scratch.json"
results = {}
if os.path.exists(OUT) and (SCRATCH_ONLY or
                            "--reuse-scratch" in sys.argv):
    # merge with the recorded run — but only if the fixture fingerprint
    # matches, i.e. the separate invocations saw identical data
    with open(OUT) as f:
        prev = json.load(f)
    if prev.get("fingerprint") != FINGERPRINT:
        raise SystemExit(
            f"refusing to merge: recorded fingerprint "
            f"{prev.get('fingerprint')} != current {FINGERPRINT} "
            f"(different fixture parameters or step budgets)")
    keep = ("pretrain", "staged", "staged_finetune") if SCRATCH_ONLY \
        else ("scratch",)
    results.update({k: prev[k] for k in keep if k in prev})

if not SCRATCH_ONLY:
    results["pretrain"] = {"steps": PRE_STEPS,
                           "loss_history": pre_hist}
    results["staged"], staged_ck = run_dt(
        "staged", lambda: cfg_mod.cars_dt_tracking_staged(pre_ck))
    # stage 3: joint finetune — FULL-state restore from the staged
    # checkpoint (params + global step + Adam moments), nothing frozen
    # (reference re-launch with use_pretrained_model=False,
    # trainer.py:77-82 + :156-157). Training resumes at step DT_STEPS,
    # so the budget is 2*DT_STEPS for DT_STEPS finetune steps.
    results["staged_finetune"], _ = run_dt(
        "finetune", lambda: cfg_mod.cars_dt_tracking_finetune(staged_ck),
        steps=2 * DT_STEPS)
if "scratch" not in results:
    results["scratch"], _ = run_dt(
        "scratch", cfg_mod.cars_dt_tracking)

ARM_DESC = {
    "pretrain": f"single-frame pretrain {PRE_STEPS} steps on a synthetic"
                " detection fixture parameter-matched to the tracking"
                " fixture",
    "staged": "DT staged: detector subtrees restored + frozen, corr"
              f" branch trains {DT_STEPS} steps",
    "staged_finetune": "joint finetune: FULL-state restore (step + Adam"
                       f" moments carried), nothing frozen, {DT_STEPS}"
                       " more steps",
    "scratch": f"DT from scratch, {DT_STEPS} steps",
}
results["setup"] = "; ".join(ARM_DESC[k] for k in ARM_DESC
                             if k in results)
results["fingerprint"] = FINGERPRINT
os.makedirs("results_r04", exist_ok=True)
with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print(f"wrote {OUT}")
