#!/usr/bin/env python
"""Full-protocol dress rehearsal at production dims (VERDICT r2 item 1).

The reference's actual deliverable is the 23-subject evaluation protocol:
fit single-view point clouds of every test subject
(``scripts/fitting/fitting_pointclouds.py:228-287``), extract + deform
meshes, evaluate with render-based sampling
(``scripts/evaluation/eval.py:98-339``), and aggregate per-subject and
total CSVs (``gather.py:82-90``).  This harness runs that ENTIRE chain —
every stage a real subprocess through the public CLIs, at production model
dims, over the full 23-identity test split on a synthetic dummy dataset —
and prints ONE JSON line: per-phase wall-clock + the aggregate metrics
from ``total_merics.csv``.

Pipeline (all through the public CLI surface):
  1. generate a dummy dataset tree: train + eval subjects for training,
     ALL 23 ``env_paths.subjects_test`` identities with ``--n_expressions``
     posed expressions + single-view observations for fitting/eval
     (subjects whose expressions are all curated away by
     ``invalid_expressions_test`` are skipped, like the real protocol);
  2. quick-train stage 1 (``train.py -local``, production NPHM dims) and
     stage 2 (``train_corresp.py -mode compress``) on the dummy data;
  3. ``fitting_pointclouds.py -batch_subjects N`` — the vmapped
     crash-resilient group fit, warm Broyden, production fit settings;
  4. ``eval.py`` + ``gather.py`` to the two CSVs.

Usage:  python scripts/validation/protocol_e2e.py [--fit_steps 1000]
            [--resolution 256] [--batch_subjects 8] [--num_samps 50000]
            [--train_epochs 151] [--def_epochs 151] [--n_expressions 6]
            [--root DIR] [--tiny] [--nonrigid] [--family nphm|npm]

``--family npm`` runs the same protocol for the reference's second
published model family (README.md:199-209): ``npm.yaml`` global DeepSDF
identity trained via ``train.py`` WITHOUT ``-local``, an npm-mode
DeepSDF(512+200 -> 3) offsets field via ``train_corresp.py -mode npm``
(reference scripts/training/train_corresp.py:71-78), and joint fitting
with a ``local_shape: false`` config (configs/fitting_npm.yaml shape).

Quality context: the models are QUICK-trained (hundreds of steps, not the
reference's 30001 epochs), so absolute Chamfer is not comparable to
BASELINE.md; the point of this harness is that the protocol RUNS end to
end at production dims with sane aggregate numbers and honest wall-clocks.
``scripts/validation/synthetic_e2e.py`` is the quality-calibrated
counterpart on closed-form geometry.
"""

import argparse
import csv
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _run(args, env, timeout=7200):
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"CLI failed: {' '.join(args)}\nSTDOUT:\n{proc.stdout[-4000:]}"
            f"\nSTDERR:\n{proc.stderr[-4000:]}"
        )
    return proc.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default=None,
                    help="keep the tree here (default: temp dir)")
    ap.add_argument("--n_train_subjects", type=int, default=16)
    # 4 expressions/subject keeps the (single-core-host) eval phase ~20 min
    # while exceeding the >=3-posed-expressions protocol bar; the real
    # dataset's 7-24 expressions only scale the same loops
    ap.add_argument("--n_expressions", type=int, default=4)
    ap.add_argument("--train_epochs", type=int, default=151)
    ap.add_argument("--def_epochs", type=int, default=151)
    ap.add_argument("--fit_steps", type=int, default=1000)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--batch_subjects", type=int, default=8)
    ap.add_argument("--num_samps", type=int, default=50000)
    ap.add_argument("--cpu", action="store_true",
                    help="force subprocesses onto CPU (CI smoke)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims + few steps (CI smoke)")
    ap.add_argument("--fit_subjects", type=int, default=0,
                    help="fit only the first N test subjects (0 = all 23): "
                         "bounded-cost diagnosis runs")
    ap.add_argument("--skip_eval", action="store_true",
                    help="stop after the fit phase (no eval.py/gather.py): "
                         "fit-phase diagnosis runs")
    ap.add_argument("--nonrigid", action="store_true",
                    help="non-rigid smooth-bump expression warps instead of "
                         "translations: exercises the deformation field and "
                         "the Broyden posed->canonical search on spatially-"
                         "varying warps at protocol scale")
    ap.add_argument("--reuse_root", action="store_true",
                    help="skip dataset generation and training when --root "
                         "already holds them (same-checkpoint fit/eval A/Bs)")
    ap.add_argument("--exp_tag", type=str, default="protocol",
                    help="fitting output tag (variant runs under one root "
                         "get distinct result dirs)")
    ap.add_argument("--fit_args", type=str, default="",
                    help="extra args appended verbatim to the fitting CLI, "
                         "e.g. '-ift_jacobian broyden -broyden_frac_exit "
                         "0.002' (Broyden variant A/Bs)")
    ap.add_argument("--family", choices=("nphm", "npm"), default="nphm",
                    help="model family: the flagship NPHM local ensemble, or "
                         "the NPM global DeepSDF baseline (reference "
                         "README.md:199-209 publishes both) — npm selects "
                         "configs/npm*.yaml, train.py without -local, "
                         "train_corresp.py -mode npm, and a "
                         "local_shape:false fitting config")
    args = ap.parse_args()

    from nphm_tpu import env_paths
    from nphm_tpu.data.dummy import dummy_env, generate_dummy_data

    out = {"production_dims": not args.tiny}
    t_all = time.time()

    keep = args.root is not None
    root = args.root or tempfile.mkdtemp(prefix="protocol_e2e_")
    os.makedirs(root, exist_ok=True)

    # --- phase 1: dataset -------------------------------------------------
    t0 = time.time()
    train_subjects = [1000 + i for i in range(args.n_train_subjects)]
    eval_subjects = list(env_paths.subjects_eval[:2])
    test_subjects = list(env_paths.subjects_test)
    all_subjects = train_subjects + eval_subjects + test_subjects
    reuse = args.reuse_root and os.path.isdir(os.path.join(root, "dataset"))
    if reuse:
        print(f"Reusing dataset + checkpoints under {root}")
    else:
        generate_dummy_data(
            root, subjects=tuple(all_subjects),
            n_expressions=args.n_expressions,
            n_supervision=100000 if not args.tiny else 20000,
            expression_mode="nonrigid" if args.nonrigid else "translate",
        )
    out["expression_mode"] = "nonrigid" if args.nonrigid else "translate"
    env = dict(os.environ)
    env.update(dummy_env(root))
    if args.cpu:
        env["PYTHONPATH"] = (
            os.path.join(REPO, "tests", "_cpu_site")
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        env["JAX_PLATFORMS"] = "cpu"
    out["n_test_subjects"] = len(test_subjects)
    out["dataset_s"] = round(time.time() - t0, 1)

    # --- phase 2: two-stage training (public CLIs, production configs) ---
    def load_cfg(name):
        with open(os.path.join(REPO, "configs", name)) as f:
            return yaml.safe_load(f)

    nphm = args.family == "nphm"
    out["family"] = args.family
    id_cfg = load_cfg("nphm.yaml" if nphm else "npm.yaml")
    def_cfg = load_cfg("nphm_def.yaml" if nphm else "npm_def.yaml")
    bs = min(args.n_train_subjects, 32)
    epochs, def_epochs = args.train_epochs, args.def_epochs
    if args.tiny:
        if nphm:
            # nloc stays 39: the dummy assets ship 39 mean anchors
            id_cfg["decoder"].update(
                decoder_lat_dim_glob=8, decoder_lat_dim_loc=4,
                decoder_hidden_dim=16,
            )
            def_cfg["ex_decoder"].update(
                decoder_hidden_dim=32, decoder_lat_dim_expr=8,
                decoder_lat_dim_id=8,
            )
            def_cfg["id_decoder"] = dict(id_cfg["decoder"], pos_mlp_dim=16)
        else:
            id_cfg["decoder"].update(
                decoder_lat_dim=16, decoder_hidden_dim=32, decoder_nlayers=4,
            )
            def_cfg["ex_decoder"].update(
                decoder_lat_dim=8, decoder_hidden_dim=32, decoder_nlayers=4,
            )
            def_cfg["id_decoder"] = dict(
                decoder_lat_dim=16, decoder_hidden_dim=32,
            )
        epochs, def_epochs = 3, 3
    recon_res = 64 if args.tiny else 128  # log_recs cost, not the protocol's
    id_cfg["training"].update(
        batch_size=bs, nepochs=epochs, ckpt_interval=max(epochs - 1, 1),
        lr=0.002, lr_lat=0.005, recon_resolution=recon_res,
    )
    def_cfg["training"].update(
        batch_size=bs, nepochs=def_epochs,
        ckpt_interval=max(def_epochs - 1, 1),
        lr=0.001, lr_lat=0.005, recon_resolution=recon_res,
        shape_exp_name="proto_id", shape_ckpt=max(epochs - 1, 1),
    )
    cfg_dir = os.path.join(root, "cfg")
    os.makedirs(cfg_dir, exist_ok=True)
    id_cfg_path = os.path.join(cfg_dir, "proto_id.yaml")
    def_cfg_path = os.path.join(cfg_dir, "proto_def.yaml")
    with open(id_cfg_path, "w") as f:
        yaml.safe_dump(id_cfg, f)
    with open(def_cfg_path, "w") as f:
        yaml.safe_dump(def_cfg, f)

    if not reuse:
        t0 = time.time()
        _run(["scripts/training/train.py", "-exp_name", "proto_id",
              "-cfg_file", id_cfg_path] + (["-local"] if nphm else []), env)
        out["train_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        _run(["scripts/training/train_corresp.py", "-exp_name", "proto_def",
              "-cfg_file", def_cfg_path,
              "-mode", "compress" if nphm else "npm"], env)
        out["def_train_s"] = round(time.time() - t0, 1)

    # --- phase 3: the 23-subject batched fit + extraction + deformation --
    fit_cfg = {
        "exp_name_shape": "proto_id",
        # on --reuse_root, autodiscover the latest checkpoint (the reused
        # tree's epoch count need not match this invocation's --train_epochs)
        "checkpoint_shape": None if reuse else max(epochs - 1, 1),
        "mode": "compress" if nphm else "npm",
        "local_shape": nphm, "local_expr": False,
        "exp_name_expr": "proto_def",
        "checkpoint_expr": None if reuse else max(def_epochs - 1, 1),
    }
    fit_cfg_path = os.path.join(cfg_dir, "proto_fit.yaml")
    with open(fit_cfg_path, "w") as f:
        yaml.safe_dump(fit_cfg, f)
    fit_args = [
        "scripts/fitting/fitting_pointclouds.py", "-cfg_file", fit_cfg_path,
        "-exp_name", "proto", "-exp_tag", args.exp_tag,
        "-batch_subjects", str(args.batch_subjects),
        "-n_steps", str(args.fit_steps),
        "-resolution", str(args.resolution),
    ] + (args.fit_args.split() if args.fit_args else [])
    if args.fit_subjects:
        fit_args += ["-subjects"] + [
            str(s) for s in test_subjects[: args.fit_subjects]
        ]
    t0 = time.time()
    fit_out = _run(fit_args, env)
    out["fit_extract_s"] = round(time.time() - t0, 1)
    # decomposed fit-phase timings (fit vs extract vs deform+export, plus
    # mean executed Broyden iterations) printed by the fitting CLI
    for line in fit_out.splitlines():
        if line.startswith("FIT_PHASE_TIMINGS "):
            for k, v in json.loads(line.split(" ", 1)[1]).items():
                out[f"fit_phase_{k}"] = v
    result_dir = os.path.join(
        root, "fitting", "forward_proto", args.exp_tag
    )
    fitted = [f for f in os.listdir(result_dir) if f.endswith(".ply")]
    out["n_fitted_meshes"] = len(fitted)
    # empty predictions (SDF with no zero crossing in the box) are scored
    # via eval.py's far-sentinel path and poison the aggregate chamfer —
    # count them so the artifact is self-describing (vertex count is in
    # the PLY header; no full parse needed)
    n_empty = 0
    for f in fitted:
        with open(os.path.join(result_dir, f), "rb") as fh:
            head = fh.read(512).decode("latin1", "ignore")
        m = re.search(r"element vertex (\d+)", head)
        if m and int(m.group(1)) == 0:
            n_empty += 1
    out["n_empty_meshes"] = n_empty
    out["n_subjects_fit"] = len(
        {f.split("_")[0] for f in fitted}
    )
    out["crashes"] = fit_out.count("fit failed")

    # --- phase 4: evaluation + gather ------------------------------------
    if args.skip_eval:
        out["total_s"] = round(time.time() - t_all, 1)
        out["root"] = root if keep else "(temp, removed)"
        if not keep:
            import shutil

            shutil.rmtree(root, ignore_errors=True)
        print(json.dumps(out))
        return
    t0 = time.time()
    _run(["scripts/evaluation/eval.py", "--result_dir", result_dir,
          "--num_samps", str(args.num_samps)], env, timeout=14400)
    out["eval_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    _run(["scripts/evaluation/gather.py", "--result_dir", result_dir], env)
    out["gather_s"] = round(time.time() - t0, 1)

    # --- aggregate numbers from the protocol CSVs -------------------------
    # gather.py writes header=metric keys + ONE averaged row (the
    # reference's total_merics.csv (sic) layout)
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

    out["total_s"] = round(time.time() - t_all, 1)
    out["root"] = root if keep else "(temp, removed)"
    if not keep:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
