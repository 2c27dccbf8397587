#!/usr/bin/env python
"""A/B the vmapped batched-fit subject count at production dims on the
real TPU: is the protocol's ``batch_subjects`` default (8) still the
measured winner, or does S=16 amortize the per-step fixed work further?

Context: the compiled program's HBM temp is ~linear in S (0.47/0.98/1.47
GB at S=2/4/8 on a 16 GB chip — `fit_joint_batch` docstring), so S=16
(~2.9 GB) is well inside capacity; the open question is throughput.  The
r02 S=8 worker crash was transient, but S=16 doubles the per-invocation
device time, so a crash here is itself a result (the protocol must then
keep 8).

Method (verify-skill discipline): all variants share ONE process (relay
variance is between-run, not within-run); each variant fits a FIXED
prefix of one seeded subject pool (20 obs x 2500 pts per subject, 1000
steps, the default fused-kernel stack), so the subjects S=8 fits are
exactly the first 8 of the S=16 set.  Each variant runs twice — the
first call pays the compile, the second is the steady measurement.
Prints one JSON line per variant with the steady wall, subject-steps/s,
and mean final loss (the shared-prefix subjects make losses comparable
in distribution; vmapped padding/rng differ per S, so exact equality is
not expected).  A crashed variant poisons the in-process backend:
``recover_backend`` runs between specs, and if it fails the remaining
specs are recorded as skipped rather than measured against a dead
runtime.

Reference being scaled: the serial per-subject protocol loop at
/root/reference/scripts/fitting/fitting_pointclouds.py:241-287.

Run it ALONE (one host core).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402

from nphm_tpu.fitting import FittingConfig, fit_joint_batch  # noqa: E402
from nphm_tpu.models import (  # noqa: E402
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
)

rng = np.random.default_rng(0)
cfg_m = NPHMConfig()
anchors = (rng.normal(size=(cfg_m.n_loc, 3)) * 0.3).astype(np.float32)
decoder = make_nphm_decoder(cfg_m, anchors)
params = decoder.init(jax.random.PRNGKey(0))
expr = make_deformation_decoder(DeformationConfig())
p_expr = expr.init(jax.random.PRNGKey(2))

N_STEPS = 1000
N_OBS, N_PTS = 20, 2500
# args: subject counts, each optionally "S:seg" to segment the scan into
# seg-step device invocations (steps_per_call) — an UNSEGMENTED S=16
# 1000-step invocation crashed the TPU worker (measured 2026-08-20), the
# same over-long-invocation class as the unsegmented S=8 NPM fit
SPECS = []
for a in sys.argv[1:] or ["8", "16"]:
    s, _, seg = a.partition(":")
    SPECS.append((int(s), int(seg) if seg else 0))


# one seeded pool; every variant fits a prefix of it
_pool_rng = np.random.default_rng(12345)
POOL = [
    [
        _pool_rng.normal(size=(N_PTS, 3)).astype(np.float32) * 0.3
        for _ in range(N_OBS)
    ]
    for _ in range(max(s for s, _ in SPECS))
]

backend_dead = False
for S, seg in SPECS:
    if backend_dead:
        print(json.dumps({"S": S, "steps_per_call": seg or "auto",
                          "skipped": "backend dead after earlier crash"}),
              flush=True)
        continue
    cfg = FittingConfig(
        n_steps=N_STEPS, log_every=100000, steps_per_call=seg or -1
    )
    subjects = POOL[:S]
    try:
        # call 1: compile + run; call 2: steady
        fit_joint_batch(
            decoder, params, expr, p_expr, subjects, cfg=cfg, verbose=False
        )
        t0 = time.perf_counter()
        _, _, _, hist = fit_joint_batch(
            decoder, params, expr, p_expr, subjects, cfg=cfg, verbose=False
        )
        wall = time.perf_counter() - t0
        loss = float(np.mean(np.asarray(hist["loss"])[-50:, :]))
        print(
            json.dumps(
                {
                    "S": S,
                    "steps_per_call": seg or "auto",
                    "steady_wall_s": round(wall, 2),
                    "subject_steps_per_s": round(S * N_STEPS / wall, 1),
                    "s_per_subject": round(wall / S, 2),
                    "mean_final_loss": round(loss, 6),
                }
            ),
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — a crash at this S is a result
        print(
            json.dumps({
                "S": S, "steps_per_call": seg or "auto",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }),
            flush=True,
        )
        # a worker crash poisons the in-process backend; re-init it (or
        # mark the rest skipped) so later specs measure a live runtime
        from nphm_tpu.ops.fallback import backend_crash_error, recover_backend

        if backend_crash_error(e):
            backend_dead = not recover_backend()
