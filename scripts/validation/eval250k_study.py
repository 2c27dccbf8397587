#!/usr/bin/env python
"""250k-draw eval re-measurement + --workers contention study (VERDICT r3
items 4 + 8).

Re-runs ``scripts/evaluation/eval.py`` over an existing protocol fit output
(77 meshes under ``--root``) at the reference's default fidelity
(``num_samps=250000``, reference ``scripts/evaluation/eval.py:111``) for each
``--workers`` setting, with ``--resample`` so every run pays the full
render-sample + cache cost (fair A/B; caches would otherwise make run 2
free).  At 250k draws the NN backend crosses onto the TPU
(``nphm_tpu/evaluation/nn.py``: 250k x 250k = 6.25e10 pair ops > 5e9), so
workers > 1 overlaps host rasterization/KDTree work of one scan with the
relay round-trips of another — the contention VERDICT item 8 asks to
measure on this one-core host.

The run preserves any existing ``evaluation/`` directory (the 25k protocol
metrics) by stashing it first and restoring it afterwards; the final 250k
metrics land in ``evaluation_250k/`` next to it, and the aggregate CSVs are
recorded in the output JSON.

Usage:
  python scripts/validation/eval250k_study.py --root /tmp/proto_r04 \
      --workers 1 2 4 --out /tmp/eval250k_study.json
"""

import argparse
import csv
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _aggregate(result_dir):
    """Run gather.py and pull the averaged row of both total CSVs."""
    out = {}
    for csv_name, tag in (
        ("total_merics.csv", "full"),
        ("total_metrics_face.csv", "face"),
    ):
        path = os.path.join(result_dir, "evaluation", csv_name)
        with open(path) as f:
            rows = list(csv.reader(f))
        header, total = rows[0], rows[1]
        for name, val in zip(header, total):
            key = name.strip().lower().replace(" ", "_")
            if key in ("chamfer_l1", "chamfer_l2", "normals_consistency",
                       "f_score_05", "f_score_10"):
                out[f"{tag}_{key}"] = round(float(val), 5)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="protocol_e2e root holding dataset + fit outputs")
    ap.add_argument("--exp_tag", default="protocol")
    ap.add_argument("--num_samps", type=int, default=250000)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--out", default="/tmp/eval250k_study.json")
    args = ap.parse_args()

    from nphm_tpu.data.dummy import dummy_env

    env = dict(os.environ)
    env.update(dummy_env(args.root))
    result_dir = os.path.join(
        args.root, "fitting", "forward_proto", args.exp_tag
    )
    eval_dir = os.path.join(result_dir, "evaluation")
    stash = eval_dir + ".stash"
    stashed = False
    if os.path.isdir(eval_dir):
        if os.path.isdir(stash):  # stale stash from an aborted run
            shutil.rmtree(eval_dir)
        else:
            os.rename(eval_dir, stash)
            stashed = True

    n_meshes = len([f for f in os.listdir(result_dir) if f.endswith(".ply")])
    study = {
        "num_samps": args.num_samps,
        "n_meshes": n_meshes,
        "host_cores": os.cpu_count(),
        "runs": [],
    }
    try:
        for w in args.workers:
            if os.path.isdir(eval_dir):
                shutil.rmtree(eval_dir)
            t0 = time.time()
            subprocess.run(
                [sys.executable, "scripts/evaluation/eval.py",
                 "--result_dir", result_dir,
                 "--num_samps", str(args.num_samps),
                 "--workers", str(w), "--resample"],
                env=env, cwd=REPO, check=True, timeout=14400,
            )
            wall = time.time() - t0
            run = {
                "workers": w,
                "wall_s": round(wall, 1),
                "s_per_scan": round(wall / max(1, n_meshes), 2),
            }
            study["runs"].append(run)
            print(json.dumps(run), flush=True)

        subprocess.run(
            [sys.executable, "scripts/evaluation/gather.py",
             "--result_dir", result_dir],
            env=env, cwd=REPO, check=True,
        )
        study["aggregate"] = _aggregate(result_dir)
    finally:
        # keep the 250k metrics, restore the stashed 25k evaluation dir
        if os.path.isdir(eval_dir):
            dst = eval_dir + "_250k"
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(eval_dir, dst)
        if stashed:
            os.rename(stash, eval_dir)
        with open(args.out, "w") as f:
            json.dump(study, f, indent=2)
    print("STUDY " + json.dumps(study), flush=True)


if __name__ == "__main__":
    main()
