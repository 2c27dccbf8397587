#!/usr/bin/env python
"""A/B the joint-fit Broyden options at production dims on the real TPU
(VERDICT r3 item 3 — act on the PROTOCOL_r03_diag.json finding that the
Broyden early exit never fires and the exact-IFT JVPs are ~65% of the
4.7 ms fit step).

Stage 1 (this script, random-init triage): all variants share ONE process
(relay variance is between-run, not within-run —
.claude/skills/verify/SKILL.md) and one synthetic observation set at
production dims (20 obs x 2500 pts, 1000 steps).  Prints one JSON line per
variant: steady-state wall, final loss / n_valid (mean of last 50 steps),
mean executed Broyden iterations.

Stage 2 (protocol gate, run separately): the surviving variants re-run at
protocol scale via  protocol_e2e.py --reuse_root --exp_tag vX
--fit_args '-ift_jacobian broyden ...'  and are accepted only at matched
aggregate Chamfer + n_valid.

Reference hot loop being optimized:
/root/reference/src/NPHM/models/fitting.py:98-133 (IFT correction + loss)
and iterative_root_finding.py:42-69 (the Broyden inner loop).

Run it ALONE (one host core).  Usage: fit_ab.py [variant ...]
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

from nphm_tpu.fitting import FittingConfig, fit_joint  # noqa: E402
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
obs = [rng.normal(size=(2500, 3)).astype(np.float32) * 0.3 for _ in range(20)]

N_STEPS = 1000
VARIANTS = {
    "v0_baseline": dict(warm_jacobian_store=False),
    "v1_jstore": dict(warm_jacobian_store=True),
    "v2_jstore_w4": dict(warm_jacobian_store=True, broyden_warm_steps=4),
    "v3_jstore_w3": dict(warm_jacobian_store=True, broyden_warm_steps=3),
    "v4_jstore_frac": dict(warm_jacobian_store=True, broyden_frac_exit=0.001),
    "v5_frac_only": dict(warm_jacobian_store=False, broyden_frac_exit=0.001),
    "v6_jstore_ift": dict(warm_jacobian_store=True, ift_jacobian="broyden"),
    "v7_all": dict(warm_jacobian_store=True, broyden_frac_exit=0.001,
                   ift_jacobian="broyden"),
    # r04 follow-up: the protocol gate flipped defaults to w3+ift_broyden
    # (v3+v6); probe one notch lower on the warm budget.  MEASURED DEAD
    # END (2026-08-19, same-process run): w2 4.501 s steady vs w3 4.628 s
    # (+2.7%) but n_valid_last50 drops 4565 vs 4724 (-3.4% converged
    # correspondences, biters pinned at the 2-iter budget) — the quality
    # loss at stage 1 disqualifies it from a protocol gate.
    "v8_w2_ift": dict(warm_jacobian_store=True, broyden_warm_steps=2,
                      ift_jacobian="broyden"),
    "v9_w3_ift": dict(warm_jacobian_store=True, broyden_warm_steps=3,
                      ift_jacobian="broyden"),
    # r04: the fused Broyden-search Pallas kernel (ops/pallas_search.py)
    # vs the XLA search, both at the r04 default numerics (w3 + jstore +
    # secant-J IFT).  Same roots up to cvg_thresh — this A/B is about
    # wall-clock and any threshold-level n_valid drift.
    "v10_search_xla": dict(fused_search="off"),
    "v11_search_fused": dict(fused_search="on"),
}

names = sys.argv[1:] or list(VARIANTS)
for name in names:
    kw = VARIANTS[name]
    fc = FittingConfig(n_steps=N_STEPS, log_every=10**9, **kw)
    t0 = time.perf_counter()
    fit_joint(decoder, params, expr, p_expr, obs, cfg=fc, verbose=False)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _, _, hist = fit_joint(
        decoder, params, expr, p_expr, obs, cfg=fc, verbose=False
    )
    steady = time.perf_counter() - t0
    print(json.dumps({
        "variant": name,
        "steady_s": round(steady, 3),
        "it_per_s": round(N_STEPS / steady, 1),
        "first_call_s": round(warm_s, 1),
        "loss_last50": round(float(np.mean(hist["loss"][-50:])), 6),
        "n_valid_last50": round(float(np.mean(hist["n_valid"][-50:])), 1),
        "biters_mean": round(float(np.mean(hist["broyden_iters"])), 3),
    }), flush=True)
