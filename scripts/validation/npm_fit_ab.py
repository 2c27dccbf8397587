#!/usr/bin/env python
"""A/B the NPM-family batched joint fit at production dims on the real TPU.

Two VERDICT r4 follow-ups, measured in ONE process (relay variance is
between-run, not within-run — .claude/skills/verify/SKILL.md):

1. **Segment size** (weak #6): the NPM family's S=8 1000-step fit runs as
   ``FittingConfig.steps_per_call`` device invocations because an
   UNSEGMENTED scan crashed the TPU worker twice at protocol scale (r04).
   The 125-step default was chosen for crash safety; each segment costs a
   host round-trip + dispatch.  This A/B measures 125 / 250 / 500 so the
   default is justified by numbers, not caution.
2. **Fused search** (stretch #8): commit 1a86204 made ``deformation_npm``
   kernel-eligible for the fused Broyden-search kernel
   (ops/pallas_search.py).  A/B ``fused_search`` on vs off on the same rig.

The fit itself follows the protocol recipe (scripts/validation/
protocol_e2e.py --family npm): global DeepSDF identity (npm.yaml: 512
latent, 8x1024 trunk), npm-mode deformation DeepSDF(512+200 -> 3, 8x1024;
configs/npm_def.yaml carries the reference's EFFECTIVE dims — its -mode npm
branch hardcodes them, reference scripts/training/train_corresp.py:71-78),
random-init weights (fit cost is architecture-bound, not weight-bound),
S=8 subjects x 20 obs x 2500 points, 1000 steps.

Reference hot loop: /root/reference/src/NPHM/models/fitting.py:14-178 with
the DeepSDF trunk of /root/reference/src/NPHM/models/deepSDF.py:6-89.

Run it ALONE (one host core).  Usage: npm_fit_ab.py [variant ...]
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

from nphm_tpu.config import build_expression_decoder  # noqa: E402
from nphm_tpu.fitting import FittingConfig, fit_joint_batch  # noqa: E402
from nphm_tpu.models import DeepSDFConfig, make_npm_decoder  # noqa: E402

S = 8
N_OBS = 20
N_PTS = 2500
N_STEPS = 1000

id_cfg = DeepSDFConfig(lat_dim=512, hidden_dim=1024, n_layers=8)
decoder = make_npm_decoder(id_cfg)
params = decoder.init(jax.random.PRNGKey(0))
expr = build_expression_decoder(
    {
        "id_decoder": {"decoder_lat_dim": 512},
        "ex_decoder": {"decoder_lat_dim": 200, "decoder_hidden_dim": 1024,
                       "decoder_nlayers": 8},
    },
    "npm",
)
p_expr = expr.init(jax.random.PRNGKey(2))

rng = np.random.default_rng(0)
subjects_obs = [
    [rng.normal(size=(N_PTS, 3)).astype(np.float32) * 0.3 for _ in range(N_OBS)]
    for _ in range(S)
]

VARIANTS = {
    "seg125": dict(steps_per_call=125),
    "seg250": dict(steps_per_call=250),
    "seg500": dict(steps_per_call=500),
    # the r04 default ("auto" resolves to 125 for non-NPHM decoders on TPU)
    # plus the fused-search axis at the winning segment size
    "seg125_search_off": dict(steps_per_call=125, fused_search="off"),
}

names = sys.argv[1:] or list(VARIANTS)
for name in names:
    kw = VARIANTS[name]
    fc = FittingConfig(n_steps=N_STEPS, log_every=10**9, **kw)
    t0 = time.perf_counter()
    fit_joint_batch(
        decoder, params, expr, p_expr, subjects_obs, cfg=fc, verbose=False
    )
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _, _, hist = fit_joint_batch(
        decoder, params, expr, p_expr, subjects_obs, cfg=fc, verbose=False
    )
    steady = time.perf_counter() - t0
    print(json.dumps({
        "variant": name,
        "steady_s": round(steady, 3),
        "subject_it_per_s": round(S * N_STEPS / steady, 1),
        "first_call_s": round(warm_s, 1),
        "loss_last50": round(float(np.mean(hist["loss"][-50:])), 6),
        "biters_mean": round(float(np.mean(hist["broyden_iters"])), 3),
    }), flush=True)
