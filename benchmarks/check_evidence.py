#!/usr/bin/env python
"""Evidence checker: every artifact-backed table in README.md (and any
other doc carrying autogen markers) is REGENERATED from its source JSON
and compared — prose can no longer drift from the artifacts (VERDICT r3
item 8: the round-3 README quoted staged numbers its own artifact
contradicted).

Tables live between markers:

    <!-- autogen:NAME -->
    | ... rendered table ... |
    <!-- /autogen:NAME -->

Run `python benchmarks/check_evidence.py` to verify (exit 1 + diff on
mismatch), `--fix` to rewrite the docs in place. tests/test_evidence.py
runs the verify mode in the suite.
"""
import difflib
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "results_r05/roofline_bwd.md"]


def _load(rel):
    with open(os.path.join(ROOT, rel)) as f:
        return json.load(f)


def _f(v, nd=1):
    return f"{float(v):.{nd}f}"


# ------------------------------------------------------------ renderers

def render_fixture():
    t = _load("results_r03/fixture_ap.json")["ap_trajectory"]
    rows = ["| step | AP_3D mod | AP_BEV mod | MOTA |", "|---|---|---|---|"]
    for r in t:
        rows.append(f"| {r['step']} | {_f(r['AP_3D_moderate'])} | "
                    f"{_f(r['AP_BEV_moderate'])} | {_f(r['MOTA'])} |")
    return "\n".join(rows)


def render_tau3():
    t = _load("results_r03/fixture_tau3_ap.json")["ap_trajectory"]
    rows = ["| step | AP_3D mod (keyframes) | MOTA (all frames) | MOTP |",
            "|---|---|---|---|"]
    for r in t:
        rows.append(f"| {r['step']} | {_f(r['AP_3D_moderate'])} | "
                    f"{_f(r['MOTA_all_frames'])} | "
                    f"{_f(r['MOTP_all_frames'])} |")
    return "\n".join(rows)


def render_family():
    single = _load("results_r03/single_frame_ap.json")["ap_trajectory"][-1]
    couple = _load("results_r03/fixture_ap.json")["ap_trajectory"][-1]
    stack = _load("results_r03/stack_ap.json")["ap_trajectory"][-1]
    rows = ["| family | mode | AP_3D mod | MOTA |", "|---|---|---|---|"]
    rows.append(f"| single-frame (`DtAvodNet(num_frames=1)`) | detection "
                f"only | {_f(single['AP_3D_moderate'])} "
                f"@{single['step']} | — |")
    rows.append(f"| couple (τ=1 pairs) | detect + track | "
                f"{_f(couple['AP_3D_moderate'])} @{couple['step']} | "
                f"{_f(couple['MOTA'])} |")
    rows.append(f"| stack (3 integrated frames, stride 2) | detect + "
                f"track | {_f(stack['AP_3D_moderate'])} @{stack['step']} "
                f"| {_f(stack['MOTA'])} |")
    return "\n".join(rows)


def _staged_path():
    r04 = "results_r04/staged_vs_scratch.json"
    return r04 if os.path.exists(os.path.join(ROOT, r04)) \
        else "results_r03/staged_vs_scratch.json"


def render_staged():
    d = _load(_staged_path())
    names = {"staged": "staged (detector restored + frozen, corr trains)",
             "staged_finetune":
                 "staged → joint finetune (nothing frozen)",
             "scratch": "from scratch"}
    rows = ["| arm | AP_3D mod (first eval) | (last eval) | "
            "MOTA (last eval) |", "|---|---|---|---|"]
    for arm in ("staged", "staged_finetune", "scratch"):
        if arm not in d:
            continue
        t = d[arm]["ap_trajectory"]
        first, last = t[0], t[-1]
        rows.append(
            f"| {names[arm]} | {_f(first['AP_3D_moderate'])} "
            f"@{first['step']} | {_f(last['AP_3D_moderate'])} "
            f"@{last['step']} | {_f(last['MOTA'])} |")
    return "\n".join(rows)


def render_people():
    t = _load("results_r03/people_ap.json")["ap_trajectory"]
    rows = ["| step | Pedestrian AP_3D mod | Cyclist AP_3D mod |",
            "|---|---|---|"]
    for r in t:
        rows.append(f"| {r['step']} | "
                    f"{_f(r['Pedestrian']['AP_3D_moderate'])} | "
                    f"{_f(r['Cyclist']['AP_3D_moderate'])} |")
    return "\n".join(rows)


def render_real_fixture():
    t = _load("results_r02/real_fixture_ap.json")["ap_trajectory"]
    rows = ["| step | AP_3D mod | AP_BEV mod | AP_3D@0.5 | MOTA |",
            "|---|---|---|---|---|"]
    for r in t:
        if r["step"] % 2400 and r["step"] not in (6000, 10800, 13200):
            continue  # keep the table readable; artifact has every step
        rows.append(f"| {r['step']} | {_f(r['AP_3D_moderate'])} | "
                    f"{_f(r['AP_BEV_moderate'])} | "
                    f"{_f(r['AP_3D_05_moderate'])} | {_f(r['MOTA'])} |")
    return "\n".join(rows)


def render_holdout():
    d = _load("results_r03/real_holdout_ap.json")
    train = {r["step"]: r for r in d["train_trajectory"]}
    rows = ["| step | train AP_3D | train MOTA | holdout AP_BEV | "
            "holdout AP_3D@0.5 | holdout recall@0.5 | val loss |",
            "|---|---|---|---|---|---|---|"]
    for r in d["holdout_trajectory"]:
        if r["step"] % 3000 and r["step"] != 10500:
            continue
        tr = train[r["step"]]
        rows.append(
            f"| {r['step']} | {_f(tr['AP_3D_moderate'])} | "
            f"{_f(tr['MOTA'])} | {_f(r['AP_BEV_moderate'])} | "
            f"{_f(r['AP_3D_05_moderate'])} | "
            f"{_f(r['proposal_recall_05'], 2)} | "
            f"{_f(r['val_loss'], 2)} |")
    return "\n".join(rows)


def render_mot_hard():
    d = _load("results_r05/mot_hard.json")
    rows = ["| arm | MOTA | MOTP | MT | ML | IDS | FM | FN |",
            "|---|---|---|---|---|---|---|---|"]
    names = {
        "iou_offsets_ttl4": "IoU tracker, model offsets, ttl=4 (v2)",
        "iou_offsets_ttl1": "IoU tracker, model offsets, ttl=1",
        "iou_zero_offsets_ttl4": "IoU tracker, offsets ZEROED (broken)",
        "kalman": "Kalman pipeline (ignores offsets)",
    }
    for k, label in names.items():
        r = d[k]
        rows.append(f"| {label} | {_f(r['MOTA'])} | {_f(r['MOTP'])} | "
                    f"{_f(r['MT'])} | {_f(r['ML'])} | {int(r['IDS'])} | "
                    f"{int(r['FM'])} | {int(r['FN'])} |")
    return "\n".join(rows)


def render_mot_ego():
    d = _load("results_r05/mot_hard.json")
    rows = ["| arm (moving platform) | MOTA | MT | IDS | FM | FN |",
            "|---|---|---|---|---|---|"]
    names = {
        "ego_iou_offsets_aligned": "IoU tracker, ego-aligned + offsets",
        "ego_kalman_compensated": "Kalman, ego-compensated association",
        "ego_kalman_uncompensated": "Kalman, raw boxes (r4 behavior)",
    }
    for k, label in names.items():
        r = d[k]
        rows.append(f"| {label} | {_f(r['MOTA'])} | {_f(r['MT'])} | "
                    f"{int(r['IDS'])} | {int(r['FM'])} | "
                    f"{int(r['FN'])} |")
    return "\n".join(rows)


def render_coexist():
    d = _load("results_r05/coexist_ab.json")
    rows = ["| τ | coexist arm | MOTA | IDS | FP | FN |",
            "|---|---|---|---|---|---|"]
    names = {"learned": "learned head (live path)",
             "constant": "constant 1.0 (pre-r5 behavior)",
             "none": "no MoI gap fill"}
    for tau in ("tau4", "tau6"):
        for arm, label in names.items():
            r = d[tau][arm]
            rows.append(f"| {tau[3:]} | {label} | {_f(r['MOTA'])} | "
                        f"{int(r['IDS'])} | {int(r['FP'])} | "
                        f"{int(r['FN'])} |")
    return "\n".join(rows)


def render_transfer():
    d = _load("results_r05/real_transfer_ap.json")
    zs = d["zero_shot_holdout"]
    rows = ["| phase | step | holdout AP_BEV | AP_3D@0.5 | "
            "recall@0.5 | MOTA |", "|---|---|---|---|---|---|"]
    rows.append(f"| zero-shot (synthetic only) | {zs['step']} | "
                f"{_f(zs['AP_BEV_moderate'])} | "
                f"{_f(zs['AP_3D_05_moderate'])} | "
                f"{_f(zs['proposal_recall_05'], 2)} | {_f(zs['MOTA'])} |")
    for r in d.get("holdout_trajectory", []):
        rec = (_f(r["proposal_recall_05"], 2)
               if "proposal_recall_05" in r else "—")
        mota = _f(r["MOTA"]) if r.get("MOTA") is not None else "—"
        rows.append(f"| finetune | {r['step']} | "
                    f"{_f(r['AP_BEV_moderate'])} | "
                    f"{_f(r['AP_3D_05_moderate'])} | {rec} | {mota} |")
    return "\n".join(rows)


def render_bwd_stages():
    d = _load("results_r05/train_bwd_stages.json")
    stages = [("towers", "towers (bev+img VGG, fwd+bwd)"),
              ("rpn_heads", "RPN heads (dense ROIs, two-pass fuse, "
                            "mini-batch)"),
              ("second_stage", "second stage (crops + FC trunks + corr)"),
              ("full_loss", "full loss (sampling + targets + losses)")]
    bs = [k for k in ("B1", "B2", "B4", "B8") if k in d]
    rows = ["| stage | " + " | ".join(f"B={k[1:]}" for k in bs) + " |",
            "|---|" + "---|" * len(bs)]
    for key, label in stages:
        vals = []
        for b in bs:
            v = next(r["marginal_per_couple_ms"] for r in d[b]
                     if r["stage"] == key)
            vals.append("≈0" if key == "full_loss" and abs(v) < 2
                        else _f(v))
        rows.append(f"| {label} | " + " | ".join(vals) + " |")
    return "\n".join(rows)


def render_second_stage_arms():
    d = _load("results_r05/second_stage_bwd.json")
    names = {
        "mm_c512_B4": "matmul-form VJP, chunk 512 (shipped default)",
        "mm_nochunk_B4": "matmul-form VJP, unchunked",
        "mm_c128_remat_B4": "matmul-form VJP, chunk 128 + remat",
        "gather_B4": "plain gather VJP (serializing scatter-add)",
    }
    rows = ["| arm (full train step, B=4) | device ms/step | couples/s |",
            "|---|---|---|"]
    for k, label in names.items():
        if k not in d:
            continue
        r = d[k]
        rows.append(f"| {label} | {_f(r['device_ms_per_step'])} | "
                    f"{_f(r['couples_per_s'], 2)} |")
    return "\n".join(rows)


def render_train_batched():
    d = _load("results_r05/train_batched.json")["batches"]
    rows = ["| B | remat ms/step | remat couples/s | store ms/step | "
            "store couples/s |", "|---|---|---|---|---|"]
    for b in (1, 2, 4, 8):
        cells = []
        for tag in ("remat", "store"):
            r = d.get(f"{tag}_B{b}")
            if r is None:
                cells += ["—", "—"]
            elif "error" in r:
                cells += [r["error"], "—"]
            else:
                cells += [_f(r["device_ms_per_step"]),
                          _f(r["couples_per_s"], 2)]
        rows.append(f"| {b} | " + " | ".join(cells) + " |")
    return "\n".join(rows)


RENDERERS = {
    "fixture": render_fixture,
    "tau3": render_tau3,
    "family": render_family,
    "staged": render_staged,
    "people": render_people,
    "real_fixture": render_real_fixture,
    "holdout": render_holdout,
    "mot_hard": render_mot_hard,
    "mot_ego": render_mot_ego,
    "coexist": render_coexist,
    "transfer": render_transfer,
    "bwd_stages": render_bwd_stages,
    "second_stage_arms": render_second_stage_arms,
    "train_batched": render_train_batched,
}

_BLOCK = re.compile(
    r"(<!-- autogen:(\w+) -->\n)(.*?)(\n<!-- /autogen:\2 -->)",
    re.DOTALL)


def process(doc_path, fix=False):
    with open(doc_path) as f:
        text = f.read()
    problems = []

    def sub(m):
        name = m.group(2)
        if name not in RENDERERS:
            problems.append(f"{doc_path}: unknown autogen table '{name}'")
            return m.group(0)
        rendered = RENDERERS[name]()
        if m.group(3) != rendered:
            diff = "\n".join(difflib.unified_diff(
                m.group(3).splitlines(), rendered.splitlines(),
                "doc", "artifact", lineterm=""))
            problems.append(
                f"{doc_path}: table '{name}' drifted from its "
                f"artifact:\n{diff}")
        return m.group(1) + rendered + m.group(4)

    new_text = _BLOCK.sub(sub, text)
    if fix and new_text != text:
        with open(doc_path, "w") as f:
            f.write(new_text)
        return [f"{doc_path}: fixed"]
    return problems if not fix else []


def main(argv):
    fix = "--fix" in argv
    all_problems = []
    for doc in DOCS:
        path = os.path.join(ROOT, doc)
        if os.path.exists(path):
            all_problems += process(path, fix=fix)
    for p in all_problems:
        print(p)
    if not all_problems:
        print("evidence check: all tables match their artifacts")
    return 1 if (all_problems and not fix) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
