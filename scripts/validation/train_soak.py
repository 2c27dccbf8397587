#!/usr/bin/env python
"""Long-horizon stage-1 training soak past the LR-decay gates (VERDICT r3
item 5).

The reference trains stage 1 for 30001 epochs
(``/root/reference/scripts/training/train.py:109-111``) with step-decay LRs
recomputed per epoch — the latent decay gated on ``epoch > 1000``
(``src/NPHM/models/training.py:100-108``) — always-resume from the latest
checkpoint (``:144``) and ``val_min=EPOCH`` marker files (``:166-173``).
All of that is implemented and unit-tested here, but no recorded run had
ever crossed the first decay event.  This harness runs the REAL train CLI
at production dims (stock ``configs/nphm.yaml``: decay interval 5000,
factor 0.5) on a synthetic dataset to ``--epochs`` (default 5200):

  1. launches ``scripts/training/train.py -local`` as a subprocess on the
     real TPU over a generated production-scale dummy dataset,
  2. SIGKILLs it mid-run (default: once the metrics stream passes epoch
     2600) and relaunches the identical command — exercising the
     snapshot-or-reload config path and latest-checkpoint autoresume under
     a genuine crash (no atexit, no flushes),
  3. parses ``metrics.jsonl`` to assert:
       - the resume restarted from the last checkpoint epoch, not 0,
       - lr and lr_lat hold their base values through epoch 4999 and BOTH
         halve exactly at 5000 (interval 5000 passes the >1000 gate),
       - the ``val_min=`` marker advanced beyond the pre-kill best,
       - the train loss improved (mean of epochs 200-300 vs the last 100),
  4. emits one JSON line with per-epoch wall-time stats and the implied
     30001-epoch cost.

Run it ALONE (one host core: a concurrent pytest silently multiplies every
number — .claude/skills/verify/SKILL.md).
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def read_metrics(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn write from the SIGKILL
    return recs


def launch(cmd, env, log_path):
    log = open(log_path, "a")
    return subprocess.Popen(
        cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/soak_r04")
    ap.add_argument("--epochs", type=int, default=5200)
    ap.add_argument("--kill_at", type=int, default=2600)
    ap.add_argument("--n_train_subjects", type=int, default=16)
    ap.add_argument("--ckpt_interval", type=int, default=250)
    ap.add_argument("--out", type=str, default="SOAK_r04.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the train subprocess onto CPU (plumbing "
                         "smoke; the LR-gate asserts need --epochs > 5000)")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink decoder dims (plumbing smoke only — the "
                         "real soak runs stock nphm.yaml dims)")
    ap.add_argument("--recon_res", type=int, default=128,
                    help="log_recs reconstruction resolution (drop for CPU "
                         "smokes: res-128 extraction on the one host core "
                         "takes minutes per checkpoint epoch)")
    args = ap.parse_args()

    from nphm_tpu import env_paths
    from nphm_tpu.data.dummy import dummy_env, generate_dummy_data

    out = {"epochs": args.epochs, "kill_at": args.kill_at}
    root = args.root
    os.makedirs(root, exist_ok=True)

    t0 = time.time()
    train_subjects = [1000 + i for i in range(args.n_train_subjects)]
    eval_subjects = list(env_paths.subjects_eval[:2])
    if not os.path.isdir(os.path.join(root, "dataset")):
        generate_dummy_data(
            root, subjects=tuple(train_subjects + eval_subjects),
            n_expressions=2, n_supervision=100000,
        )
    out["dataset_s"] = round(time.time() - t0, 1)

    with open(os.path.join(REPO, "configs", "nphm.yaml")) as f:
        cfg = yaml.safe_load(f)
    # stock decoder dims + stock LR/decay (the soak's whole point);
    # batch_size to the dataset size, ckpt_interval down so the mid-run
    # kill has a fresh checkpoint to resume from
    cfg["training"].update(
        batch_size=min(args.n_train_subjects, 32),
        nepochs=args.epochs,
        ckpt_interval=args.ckpt_interval,
        recon_resolution=args.recon_res,
    )
    if args.tiny:
        cfg["decoder"].update(
            decoder_lat_dim_glob=8, decoder_lat_dim_loc=4,
            decoder_hidden_dim=16,
        )
    base_lr = cfg["training"]["lr"]
    base_lr_lat = cfg["training"]["lr_lat"]
    cfg_dir = os.path.join(root, "cfg")
    os.makedirs(cfg_dir, exist_ok=True)
    cfg_path = os.path.join(cfg_dir, "soak_id.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env.update(dummy_env(root))
    if args.cpu:
        env["PYTHONPATH"] = (
            os.path.join(REPO, "tests", "_cpu_site")
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        env["JAX_PLATFORMS"] = "cpu"
    exp_dir = os.path.join(root, "experiments", "soak_id")
    metrics_path = os.path.join(exp_dir, "metrics.jsonl")
    log_path = os.path.join(root, "soak_train.log")
    cmd = [sys.executable, "scripts/training/train.py",
           "-exp_name", "soak_id", "-cfg_file", cfg_path, "-local"]

    # ---- run 1: train until the kill point, then SIGKILL ------------------
    t0 = time.time()
    proc = launch(cmd, env, log_path)
    killed_at = None
    while proc.poll() is None:
        time.sleep(10)
        recs = read_metrics(metrics_path)
        if recs and recs[-1].get("step", 0) >= args.kill_at:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed_at = recs[-1]["step"]
            break
    if killed_at is None:
        raise RuntimeError(
            f"run 1 exited (rc={proc.returncode}) before epoch "
            f"{args.kill_at}; see {log_path}"
        )
    out["run1_s"] = round(time.time() - t0, 1)
    out["killed_at_epoch"] = int(killed_at)
    n_pre = len(read_metrics(metrics_path))
    from nphm_tpu.training import checkpoints as ckpt
    vm_pre = ckpt.read_val_min(exp_dir)
    out["val_min_pre_kill"] = None if vm_pre is None else int(vm_pre[0])

    # ---- run 2: identical command; must autoresume ------------------------
    t0 = time.time()
    proc = launch(cmd, env, log_path)
    rc = proc.wait()
    out["run2_s"] = round(time.time() - t0, 1)
    if rc != 0:
        raise RuntimeError(f"run 2 failed rc={rc}; see {log_path}")

    recs = read_metrics(metrics_path)
    by_step = {}
    for r in recs:
        by_step[r["step"]] = r  # later wins: post-resume re-logged epochs
    steps = sorted(by_step)
    out["last_epoch"] = steps[-1]
    assert steps[-1] == args.epochs - 1, (steps[-1], args.epochs)

    # resume point: the first step logged in run 2 must be the latest
    # pre-kill checkpoint epoch (load_checkpoint returns the saved epoch
    # and train_model re-runs it), not 0
    run2_first = min((r["step"] for r in recs[n_pre:]), default=None)
    out["resume_from_epoch"] = int(run2_first)
    expected_resume = (killed_at // args.ckpt_interval) * args.ckpt_interval
    assert run2_first == expected_resume > 0, (run2_first, expected_resume)

    # ---- LR gates ----------------------------------------------------------
    def lr_at(step, key):
        return by_step[step][key]

    def _assert_lr(e, key, expect):
        # the trainer logs LRs through float32 optimizer state, so exact
        # f64 equality is one rounding step off (0.0005 logs as
        # 0.00050000002374...): compare at f32 resolution
        got = lr_at(e, key)
        assert abs(got - expect) <= 1e-6 * expect, (e, key, got, expect)

    if args.epochs > 5000:
        for e in (999, 1000, 1001, 2500, 4999):
            _assert_lr(e, "lr", base_lr)
            _assert_lr(e, "lr_lat", base_lr_lat)
        for e in range(5000, min(args.epochs, 5200)):
            _assert_lr(e, "lr", base_lr * 0.5)
            _assert_lr(e, "lr_lat", base_lr_lat * 0.5)
        out["lr_gate_ok"] = True
        out["lr_at_4999"] = lr_at(4999, "lr")
        out["lr_at_5000"] = lr_at(5000, "lr")
        out["lr_lat_at_5000"] = lr_at(5000, "lr_lat")

    # ---- val_min advanced ---------------------------------------------------
    vm_post = ckpt.read_val_min(exp_dir)
    out["val_min_post"] = int(vm_post[0])
    assert vm_post[0] >= (vm_pre[0] if vm_pre else 0)

    # ---- loss trend + timing ------------------------------------------------
    early = [by_step[e]["loss"] for e in range(200, 300) if e in by_step]
    late = [by_step[e]["loss"] for e in steps[-100:]]
    if early:  # smoke runs never reach epoch 200
        out["loss_epoch_200_300"] = round(float(np.mean(early)), 5)
        out["loss_last_100"] = round(float(np.mean(late)), 5)
        assert np.mean(late) < np.mean(early), "loss did not improve"

    ts = [by_step[e]["t"] for e in steps]
    gaps = np.diff(ts)
    # drop checkpoint epochs (save + log_recs extraction) and the resume
    # boundary from the steady estimate; report them separately
    steady = [
        g for e, g in zip(steps[1:], gaps)
        if e % args.ckpt_interval not in (0, 1) and abs(g) < 60
    ]
    out["epoch_s_median"] = round(float(np.median(steady)), 3)
    out["epoch_s_p90"] = round(float(np.percentile(steady, 90)), 3)
    ck = [g for e, g in zip(steps[1:], gaps) if e % args.ckpt_interval == 1]
    if ck:
        out["ckpt_epoch_s_median"] = round(float(np.median(ck)), 3)
    out["extrapolated_30001_epochs_h"] = round(
        float(np.median(steady)) * 30001 / 3600, 2
    )
    out["total_s"] = round(out["run1_s"] + out["run2_s"], 1)
    line = json.dumps(out)
    print(line)
    with open(os.path.join(REPO, args.out), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
