"""Learned-coexist A/B through the MoI + tracking pipeline
(VERDICT r4 item 3): on a birth/death-heavy keyframe scenario, compare

  learned  — each keyframe det carries the TRUE P(exists at the other
             keyframe) (a perfect coexist head, the stack model's
             final_coexist contract),
  constant — every det claims coexist 1.0 (the pre-r5 live path, where
             the head's output never reached the tracker),
  none     — 0.5 (a model without the head, e.g. dt_avod).

The learned arm suppresses phantom extrapolation past true deaths /
before true births (FP cut) while keeping extrapolation through
detector misses (which "none" loses as FN). Scored by the
parity-tested CLEAR-MOT evaluator.

Writes results_r05/coexist_ab.json.
Run: python benchmarks/coexist_ab.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dodt_tpu.tracking import scenarios  # noqa: E402

KEEP = ("MOTA", "MOTP", "MT", "ML", "IDS", "FM", "TP", "FP", "FN",
        "recall", "precision", "n_tracks")

results = {
    "scenario": "11 objects over keyframe stride tau: 4 persistent "
                "movers, 3 mid-gap deaths, 3 mid-gap births, 1 "
                "persistent mover with 2 keyframe detector misses; "
                "dets only at keyframes, MoI fills the gaps, IoU "
                "tracker + CLEAR-MOT over every frame "
                "(tracking/scenarios.birth_death_scenario, seed 1)",
}
for tau, n in ((4, 33), (6, 37)):
    table = {}
    for mode in ("learned", "constant", "none"):
        gt, couples = scenarios.birth_death_scenario(
            n_frames=n, tau=tau, coexist_mode=mode)
        r = scenarios.run_moi_tracking(gt, couples, n)
        table[mode] = {k: round(float(r[k]), 2) for k in KEEP}
    results[f"tau{tau}"] = table

os.makedirs("results_r05", exist_ok=True)
with open("results_r05/coexist_ab.json", "w") as f:
    json.dump(results, f, indent=2)
for k, v in results.items():
    print(k, v if isinstance(v, str) else "")
    if isinstance(v, dict):
        for mode, row in v.items():
            print("  ", mode, row)
print("wrote results_r05/coexist_ab.json")
