#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the primary metric.

Primary metric: dense SDF queries/sec/chip on the NPHM flagship model
(the 39-anchor local-MLP ensemble, full production dims) evaluated over a
res-256 extraction grid — hot loop #2 of SURVEY.md section 3 and the first
driver metric in BASELINE.json.

The reference publishes no throughput numbers; the baseline convention here
derives from the driver's north star ("res-256 extraction + full point-cloud
fit < 30 s on one v5e chip"): a reference rate of 16.7M queries / 30 s
= 0.557M q/s.  vs_baseline = measured rate / 0.557M.

Extra fields (same line): res-256 extraction wall time including marching
cubes, streamed/sparse extraction legs, the fused training-kernel step, an
NPM sampling leg, the virtual-mesh multichip equivalence check, fitting
iterations/sec, and the full 23-identity evaluation-protocol rehearsal
(scripts/validation/protocol_e2e.py — the heaviest leg, ~25-40 min).  All
legs run by default; skip individually with
BENCH_NO_{TRAIN,SPARSE,R400,NPM,MULTI,FIT,PALLAS,PROTO}=1.

NOTE: timings force a device->host transfer per measurement because
block_until_ready does not reliably synchronize through the axon relay.
"""

import json
import os
import time

import numpy as np

import jax

from nphm_tpu.models import NPHMConfig, make_nphm_decoder
from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
from nphm_tpu.ops.grid import create_grid_points_from_bounds
from nphm_tpu.ops.marching import mesh_from_logits
from nphm_tpu.reconstruction.extract import make_sdf_evaluator

RES = 256
GRID_MIN = (-0.55, -0.5, -0.95)
GRID_MAX = (0.55, 0.75, 0.4)
BASELINE_QPS = 16.7e6 / 30.0  # north-star implied rate


def _mean_anchors():
    for path in (
        os.path.join(os.environ.get("NPHM_ASSETS", ""), "anchors_39.npy"),
        "/root/reference/assets/anchors_39.npy",
    ):
        if path and os.path.exists(path):
            return np.load(path).astype(np.float32)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(39, 3))
    return (0.4 * d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


_MULTICHIP_CODE = """
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh
from nphm_tpu.models import NPHMConfig, make_nphm_decoder
from nphm_tpu.ops.pallas_ensemble import DEFAULT_TILE, nphm_grid_sdf_pallas

cfg = NPHMConfig(lat_dim_glob=8, lat_dim_loc=4, n_loc=7, n_symm_pairs=3,
                 hidden_dim=16, n_layers=4, pos_mlp_dim=16)
rng = np.random.default_rng(0)
dec = make_nphm_decoder(cfg, (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32))
params = dec.init(jax.random.PRNGKey(0))
lat = jax.random.normal(jax.random.PRNGKey(1), (cfg.lat_dim,)) * 0.1
mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
res = 32
devs = jax.devices("cpu")[:8]
mesh = Mesh(np.asarray(devs), ("data",))
out_sh = nphm_grid_sdf_pallas(params, cfg, lat, mini, maxi, res,
                              device_mesh=mesh, interpret=True)
out_1 = nphm_grid_sdf_pallas(params, cfg, lat, mini, maxi, res, interpret=True)
err = float(np.abs(np.asarray(out_sh) - np.asarray(out_1)).max())
print(json.dumps({
    "devices": len(devs),
    "bricks_per_device": res**3 // DEFAULT_TILE // len(devs),
    "max_abs_err_vs_single": err,
    "ok": bool(err < 1e-5),
}))
"""


def _bench_multichip():
    """Sharded-extraction equivalence on a virtual 8-device CPU mesh
    (subprocess: this process owns the TPU backend).  One JSON sub-object
    per round so the sharding path is exercised in every round artifact
    (VERDICT r1 item 9), not only in the driver's dryrun."""
    import subprocess
    import sys

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    env.pop("JAX_PLATFORM_NAME", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _MULTICHIP_CODE],
            env=env, capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [
            ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
        ]
        if proc.returncode == 0 and lines:
            return json.loads(lines[-1])
        return {"ok": False, "rc": proc.returncode,
                "err": proc.stderr.strip()[-200:]}
    except Exception as e:  # noqa: BLE001 — bench must still print its line
        return {"ok": False, "err": repr(e)[:200]}


def _bench_train_step(B: int = 32, n_scan: int = 10, n_extra_calls: int = 0):
    """Identity train step (B x 1693 production batch) via the fused kernel.

    The batch is real ellipsoid-SDF supervision (synthetic dataset at the
    production point counts), so continuing the run yields a model with a
    compact, eikonal-respecting surface — which the sparse-extraction leg
    reuses.  Returns (seconds/step, achieved TFLOP/s counting the fused
    fwd+bwd member-MLP math, decoder, trained params, trained latent row).
    n_extra_calls: additional reuses of the SAME compiled n_scan-step
    program (cheap) to deepen training for the sparse leg.
    """
    import optax

    from nphm_tpu.data.synthetic import SyntheticIdentityDataset
    from nphm_tpu.ops.pallas_train import (
        _fields_flops,
        apply_nphm_train_pallas,
    )
    from nphm_tpu.training.latents import (
        clip_global_norm, renorm_rows, row_adam_init, row_adam_update,
    )
    from nphm_tpu.training.losses import identity_sdf_loss

    cfg = NPHMConfig()
    decoder = make_nphm_decoder(cfg, _mean_anchors())
    params = decoder.init(jax.random.PRNGKey(0))
    nf, nn, nfa = 750, 50, 93
    ds = SyntheticIdentityDataset(
        n_subjects=B, n_face=nf, n_non_face=nn * 5, batch_size=B,
        n_anchors=cfg.n_loc, seed=0,
    )
    batch = next(iter(ds.batch_iter(seed=0, shuffle=False)))
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    batch["idx"] = jax.numpy.arange(B, dtype=jax.numpy.int32)
    table = jax.random.normal(jax.random.PRNGKey(1), (64, cfg.lat_dim)) * (
        0.1 / np.sqrt(cfg.lat_dim)
    )
    lat_state = row_adam_init(table)
    opt = optax.adamw(5e-4, weight_decay=0.01)
    opt_state = opt.init(params)
    lambdas = {
        "lat_reg": 0.01, "surf_sdf": 2.0, "normals": 0.3, "space_sdf": 0.01,
        "grad": 0.1, "anchors": 7.5, "symm_dist": 0.01, "middle_dist": 0.0,
    }

    def fields_fn(p, pts, lat):
        return apply_nphm_train_pallas(p, cfg, pts, lat)

    def loss_fn(p, t):
        idx = batch["idx"].reshape(-1)
        terms = identity_sdf_loss(
            decoder, p, batch, t[idx], training=True, fields_fn=fields_fn
        )
        return sum(lambdas[k] * terms[k] for k in terms)

    def step(carry, _):
        p, os_, t, ls = carry
        idx = batch["idx"].reshape(-1)
        t = renorm_rows(t, idx, 1.0)
        loss, (gp, gt) = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, t)
        gp, _ = clip_global_norm(gp, 0.1)
        updates, os_ = opt.update(gp, os_, p)
        p = optax.apply_updates(p, updates)
        t, ls = row_adam_update(t, gt, ls, idx, 5e-4)
        return (p, os_, t, ls), loss

    @jax.jit
    def run(p, os_, t, ls):
        carry, losses = jax.lax.scan(step, (p, os_, t, ls), None, length=n_scan)
        return carry, losses.sum()

    state = (params, opt_state, table, lat_state)
    state, _ = run(*state)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, s = run(*state)
        float(s)
        times.append(time.perf_counter() - t0)
    t_step = min(times) / n_scan
    for _ in range(n_extra_calls):  # deepen training, same executable
        state, _ = run(*state)
    tile = 512
    npp = nf + nn + nfa + nf + nn  # points per row
    m = B * (-(-npp // tile) * tile)
    flops = _fields_flops(cfg, m, 8.0)
    params, _, table, _ = state
    return t_step, flops / t_step / 1e12, decoder, params, table[0]


_T_START = time.time()
# Wall-clock budget for OPTIONAL legs (primary metric always runs): first
# Pallas/fit compiles through the relay cost minutes each, and a full run
# is ~30 min.  Legs starting past the deadline are skipped and say so.
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 2400))


def _guard(extra, name, fn, optional=False):
    """Run one bench leg fail-soft.

    The driver consumes bench's single JSON line; a relay hiccup or worker
    crash in one leg must cost that leg's fields, not the whole artifact.
    Failures are recorded as ``<leg>_error`` fields; optional legs starting
    past the time budget are recorded as skipped.
    """
    if optional and time.time() - _T_START > _DEADLINE_S:
        extra[f"{name}_skipped"] = "time budget"
        return False
    try:
        fn()
        return True
    except Exception as e:  # noqa: BLE001 — leg failures are data, not fatal
        extra[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        return False


def _backend_or_bail(timeout_s: float = 600.0):
    """Resolve the JAX backend with a watchdog.

    When the axon TPU relay is unreachable, ``jax.devices()`` blocks forever
    inside backend initialization (observed: >10 min with zero output) — a
    hang here would leave the round with NO bench artifact at all.  Probe in
    a daemon thread; on timeout emit an honest fail-soft JSON line and exit.
    """
    import threading

    result = {}

    def probe():
        result["backend"] = jax.default_backend()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "backend" not in result:
        print(json.dumps({
            "metric": "sdf_queries_per_sec",
            "value": 0,
            "unit": "queries/s",
            "vs_baseline": 0,
            "error": f"TPU relay unreachable: jax backend init still "
                     f"blocked after {timeout_s:.0f}s; no device available "
                     f"to benchmark",
        }))
        raise SystemExit(0)
    return result["backend"]


def main():
    _backend_or_bail(float(os.environ.get("BENCH_BACKEND_TIMEOUT", 600)))
    cfg = NPHMConfig()
    decoder = make_nphm_decoder(cfg, _mean_anchors())
    params = decoder.init(jax.random.PRNGKey(0))
    lat = (jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1)

    n_queries = RES**3
    want_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("BENCH_NO_PALLAS") != "1"
    )
    extra = {}
    # Host-side context for the marching/IO numbers: r01-r03 ran on a
    # multi-core host (res256 MC ~1.1-1.3 s); the r04+ container has ONE
    # core, which alone tripled the threaded marching pass (VERDICT r4
    # weak #5 attribution) until the r05 single-core straddle-mask rewrite.
    extra["host_cores"] = os.cpu_count()
    st = {}  # cross-leg products

    def eval_pallas():
        # Fused Pallas ensemble kernel over an on-device brick-ordered grid.
        # Device compute is timed through a scalar reduction: the axon relay
        # moves bulk device->host data at low, unstable bandwidth, which
        # would otherwise swamp the chip time it is supposed to measure.
        from nphm_tpu.ops.pallas_ensemble import nphm_grid_sdf_pallas
        from nphm_tpu.reconstruction.extract import pallas_grid_logits

        def probe(p, l):
            return nphm_grid_sdf_pallas(
                p, cfg, l, GRID_MIN, GRID_MAX, RES
            ).sum()

        probe = jax.jit(probe)
        float(probe(params, lat[0]))  # warm up / compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(probe(params, lat[0]))
            times.append(time.perf_counter() - t0)
        st["t_eval"] = min(times)

        t0 = time.perf_counter()
        st["logits"] = pallas_grid_logits(
            decoder, params, lat, GRID_MIN, GRID_MAX, RES,
            transfer_dtype=np.float16,  # relay link is transfer-limited
        )
        extra["relay_transfer_s"] = round(
            max(time.perf_counter() - t0 - st["t_eval"], 0.0), 3
        )
        extra["path"] = "pallas"

    def eval_xla():
        chunk = int(os.environ.get("BENCH_CHUNK", 1 << 17))
        evaluator = make_sdf_evaluator(decoder, chunk_size=chunk)
        grid_points = create_grid_points_from_bounds(GRID_MIN, GRID_MAX, RES)
        run = lambda: evaluator(  # noqa: E731
            {"params": params, "lat": lat}, grid_points
        )[:, 0]
        st["logits"] = run()  # warm up / compile
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            st["logits"] = run()
            times.append(time.perf_counter() - t0)
        st["t_eval"] = min(times)
        extra["path"] = "xla"

    use_pallas = want_pallas and _guard(extra, "pallas_eval", eval_pallas)
    if not use_pallas:
        _guard(extra, "xla_eval", eval_xla)

    def leg_mc():
        t0 = time.perf_counter()
        mesh = mesh_from_logits(st["logits"], GRID_MIN, GRID_MAX, RES)
        t_mc = time.perf_counter() - t0
        extra["res256_eval_s"] = round(st["t_eval"], 3)
        extra["res256_mc_s"] = round(t_mc, 3)
        extra["res256_total_s"] = round(st["t_eval"] + t_mc, 3)
        extra["mesh_verts"] = int(len(mesh.vertices))

    if "t_eval" in st:
        _guard(extra, "mc", leg_mc)

    def leg_stream():
        # Overlapped pipeline (eval || transfer || marching tets), the
        # production extraction path (VERDICT r1 item 4).  End-to-end wall
        # time INCLUDING the mesh, f16 transfer.
        from nphm_tpu.reconstruction.extract import extract_mesh_streamed

        extract_mesh_streamed(  # warm (one compile for all slabs)
            decoder, params, lat, GRID_MIN, GRID_MAX, RES,
            transfer_dtype=np.float16,
        )
        t0 = time.perf_counter()
        mesh_s = extract_mesh_streamed(
            decoder, params, lat, GRID_MIN, GRID_MAX, RES,
            transfer_dtype=np.float16,
        )
        extra["res256_stream_e2e_s"] = round(time.perf_counter() - t0, 3)
        extra["stream_verts"] = int(len(mesh_s.vertices))
        if os.environ.get("BENCH_NO_R400") != "1":
            t0 = time.perf_counter()
            mesh_400 = extract_mesh_streamed(
                decoder, params, lat, GRID_MIN, GRID_MAX, 400,
                n_slabs=10, transfer_dtype=np.float16,
            )
            extra["res400_stream_e2e_s"] = round(time.perf_counter() - t0, 3)
            extra["res400_verts"] = int(len(mesh_400.vertices))

    if use_pallas:
        _guard(extra, "stream", leg_stream, optional=True)

    def leg_train():
        # hot loop #1: the identity train step (fwd + eikonal double backprop
        # + both optimizer updates) through the fused Pallas training kernel
        # (ops/pallas_train.py).  Round-1 XLA baseline: 323 ms/step at this
        # batch; the fused kernel target is <=160 ms (VERDICT r1 item 2).
        # n_extra_calls deepens training to ~300 steps (same executable) so
        # the sparse-extraction leg below sees a realistic compact surface.
        t_step, tflops, tdec, tparams, tlat = _bench_train_step(
            n_extra_calls=26
        )
        extra["train_step_s"] = round(t_step, 4)
        extra["train_tflops"] = round(tflops, 2)
        st["trained"] = (tdec, tparams, tlat)

    if use_pallas and os.environ.get("BENCH_NO_TRAIN") != "1":
        _guard(extra, "train", leg_train, optional=True)

    def leg_sparse():
        # sparse two-pass extraction on the trained model: coarse
        # Lipschitz-margin selection + per-block fine eval + straddling-
        # blocks-only transfer (reconstruction/sparse.py).  Random-init
        # fields are a worst case (surface fills the box), so this leg
        # measures on the 300-step-trained ellipsoid model.
        from nphm_tpu.reconstruction.extract import extract_mesh_streamed
        from nphm_tpu.reconstruction.sparse import extract_mesh_sparse

        tdec, tparams, tlat = st["trained"]
        # lip="auto": the library's own sound setting (probe * 2 margin).
        # The r04 bench capped the probe at 5.0 while the in-run probe read
        # >= 5.44, so every run warned that the coarse pass may have
        # dropped surface blocks (VERDICT r4 weak #4) — the timing then
        # measured a configuration the library itself flags as unsound.
        for res in (256, 400):
            if res == 400 and os.environ.get("BENCH_NO_R400") == "1":
                continue
            stats = {}
            kw = dict(lip="auto", transfer_dtype=np.float16, stats=stats)
            extract_mesh_sparse(
                tdec, tparams, tlat, GRID_MIN, GRID_MAX, res, **kw
            )  # warm/compile
            t0 = time.perf_counter()
            mesh_sp = extract_mesh_sparse(
                tdec, tparams, tlat, GRID_MIN, GRID_MAX, res, **kw
            )
            extra[f"sparse{res}_e2e_s"] = round(time.perf_counter() - t0, 3)
            extra[f"sparse{res}_verts"] = int(len(mesh_sp.vertices))
            extra[f"sparse{res}_blocks"] = (
                f"{stats['n_transferred']}/{stats['n_candidates']}"
                f"/{stats['n_blocks']}"
            )
            extra[f"sparse{res}_lip_auto"] = round(stats["lip_auto"], 2)
        # soundness check IN the artifact: the sparse mesh of this trained
        # field must reproduce the dense-streamed mesh's vertex count
        # (tests/test_sparse_extract.py pins three-path bit-exactness on
        # CPU; this pins it on hardware, same field, same f16 transfer).
        # tile=1024 matches the sparse fine pass's one-block kernel tiles:
        # member culling truncates blend weights per TILE bounding box, so
        # only matched tilings are bit-comparable (tile=2048 differs at ~82
        # of 421k vertices by <=8e-5 — the documented n_loc*cull_eps
        # truncation bound, r05 hardware probe).
        mesh_ref = extract_mesh_streamed(
            tdec, tparams, tlat, GRID_MIN, GRID_MAX, 256,
            transfer_dtype=np.float16, tile=1024,
        )
        extra["sparse256_ref_verts"] = int(len(mesh_ref.vertices))
        extra["sparse256_matches_dense"] = bool(
            extra["sparse256_verts"] == len(mesh_ref.vertices)
        )

    if os.environ.get("BENCH_NO_SPARSE") != "1":
        if "trained" in st:
            _guard(extra, "sparse", leg_sparse, optional=True)
        else:
            extra["sparse_skipped"] = "train leg unavailable"

    def leg_npm():
        # model family #1 (BASELINE.json configs): NPM global-latent DeepSDF
        # random-head sampling at res 128 through the chunked XLA evaluator
        # (measured faster than the layer-streamed kernel for this trunk)
        from nphm_tpu.models import DeepSDFConfig, make_npm_decoder

        npm = make_npm_decoder(
            DeepSDFConfig(
                lat_dim=512, hidden_dim=1024, n_layers=8, radius_init=0.5
            )
        )
        p_npm = npm.init(jax.random.PRNGKey(3))
        lat_npm = jax.random.normal(jax.random.PRNGKey(4), (1, 512)) * 0.01
        ev = make_sdf_evaluator(npm)
        grid128 = create_grid_points_from_bounds(GRID_MIN, GRID_MAX, 128)
        ev({"params": p_npm, "lat": lat_npm}, grid128)  # warm
        t0 = time.perf_counter()
        lg = ev({"params": p_npm, "lat": lat_npm}, grid128)[:, 0]
        # the geometric-init field is near-constant in the box; extract at
        # the median iso so marching does representative work
        mesh_npm = mesh_from_logits(
            lg - np.median(lg), GRID_MIN, GRID_MAX, 128
        )
        extra["npm_res128_sample_s"] = round(time.perf_counter() - t0, 3)
        extra["npm_verts"] = int(len(mesh_npm.vertices))
        # workload proxy, not a capability claim: a random-init NPM field is
        # near-constant in the box, so iso-0 yields an empty mesh — the
        # median iso makes marching do representative work (VERDICT r4 #7)
        extra["npm_iso"] = "median(random-init field), not the reference iso-0"

    if use_pallas and os.environ.get("BENCH_NO_NPM") != "1":
        _guard(extra, "npm", leg_npm, optional=True)

    def leg_multichip():
        extra["multichip"] = _bench_multichip()

    if os.environ.get("BENCH_NO_MULTI") != "1":
        _guard(extra, "multichip", leg_multichip, optional=True)

    def leg_fit():
        # driver metric #3 (BASELINE.json): fitting iterations/sec through
        # the production joint-fit engine (Broyden correspondences + IFT
        # gradients + two Adam updates, ONE compiled lax.scan; warm-started
        # correspondence store)
        from nphm_tpu.fitting import FittingConfig, fit_joint
        from nphm_tpu.models import DeformationConfig, make_deformation_decoder

        dcfg = DeformationConfig()
        expr = make_deformation_decoder(dcfg)
        p_expr = expr.init(jax.random.PRNGKey(2))
        rng = np.random.default_rng(0)
        obs = [
            rng.normal(size=(2500, 3)).astype(np.float32) * 0.3
            for _ in range(20)
        ]
        # 1000 = the reference protocol's step count.  Two rates are
        # reported so the artifact is self-describing (VERDICT r3 item 7):
        #   fit_iters_per_s        — overhead-INCLUSIVE (n_fit / wall of one
        #                            call: counts ~0.5 s relay/obs-transfer/
        #                            output-materialization per call)
        #   fit_iters_per_s_steady — marginal rate from two call sizes,
        #                            (n_big - n_small) / (t_big - t_small):
        #                            the per-step cost with the fixed
        #                            per-call overhead differenced away;
        #                            this is the number README/CLAUDE.md
        #                            headline (214 it/s class)
        #   fit_call_overhead_s    — the implied fixed per-call cost
        n_fit = int(os.environ.get("BENCH_FIT_STEPS", 1000))
        n_small = max(50, n_fit // 5)
        fc = FittingConfig(n_steps=n_fit, log_every=100000)
        fc_small = FittingConfig(n_steps=n_small, log_every=100000)
        # warm both compiled step counts
        fit_joint(decoder, params, expr, p_expr, obs, cfg=fc, verbose=False)
        fit_joint(
            decoder, params, expr, p_expr, obs, cfg=fc_small, verbose=False
        )

        def _timed(c):
            t0 = time.perf_counter()
            fit_joint(decoder, params, expr, p_expr, obs, cfg=c, verbose=False)
            return time.perf_counter() - t0

        # min-of-3: relay jitter only ever ADDS wall time, so the min of
        # repeated warm calls is the better point estimate (same-day r05
        # steady measurements spread 225.8-239.9 on single-shot timings —
        # pure between-call relay variance at identical programs; the
        # steady differencing amplifies per-call overhead noise by
        # n_fit/(n_fit - n_small))
        reps = max(1, int(os.environ.get("BENCH_FIT_REPS", 3)))
        t_big = min(_timed(fc) for _ in range(reps))
        t_small = min(_timed(fc_small) for _ in range(reps))
        extra["fit_iters_per_s"] = round(n_fit / t_big, 2)
        if n_fit > n_small and t_big > t_small:
            per_step = (t_big - t_small) / (n_fit - n_small)
            extra["fit_iters_per_s_steady"] = round(1.0 / per_step, 2)
            extra["fit_call_overhead_s"] = round(
                max(0.0, t_small - n_small * per_step), 3
            )

    if os.environ.get("BENCH_NO_FIT") != "1":
        _guard(extra, "fit", leg_fit, optional=True)

    def emit():
        qps = n_queries / st["t_eval"] if "t_eval" in st else 0.0
        print(
            json.dumps(
                {
                    "metric": "nphm_sdf_queries_per_sec_per_chip",
                    "value": round(qps, 1),
                    "unit": "queries/s",
                    "vs_baseline": round(qps / BASELINE_QPS, 3),
                    **extra,
                }
            ),
            flush=True,
        )

    # the protocol leg below is the heaviest (~25-40 min); emit the line NOW
    # so a harness timeout mid-protocol still leaves a complete artifact —
    # the driver consumes the LAST printed line
    emit()

    def leg_protocol(proto_timeout):
        # VERDICT r2 item 1: the reference's ACTUAL deliverable — the full
        # 23-identity fit -> extract -> deform -> eval -> gather protocol,
        # end to end through the public CLIs at production model dims
        # (scripts/validation/protocol_e2e.py), as a subprocess.  Records
        # phase wall-clocks + the aggregate metrics from total_merics.csv.
        import subprocess
        import sys

        proc = subprocess.run(
            [sys.executable, "scripts/validation/protocol_e2e.py",
             "--fit_steps", os.environ.get("BENCH_PROTO_FIT_STEPS", "1000"),
             "--num_samps", os.environ.get("BENCH_PROTO_NUM_SAMPS", "25000"),
             "--batch_subjects", "8", "--resolution", "256"],
            capture_output=True, text=True, timeout=proto_timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [
            ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
        ]
        if proc.returncode == 0 and lines:
            extra["protocol"] = json.loads(lines[-1])
        else:
            extra["protocol"] = {
                "ok": False, "rc": proc.returncode,
                "err": (proc.stderr or proc.stdout).strip()[-300:],
            }

    if use_pallas and os.environ.get("BENCH_NO_PROTO") != "1":
        # Budget-gated so bench EXITS CLEANLY inside the driver's wall
        # clock (r04 was the project's first rc=124: a mid-protocol kill
        # leaves the pre-emitted line but drops the protocol results and
        # flags the round).  The protocol only starts if enough of the
        # hard budget remains, and its subprocess timeout is clamped to
        # the remainder; a skip is recorded honestly.  Default 2400 s: the
        # driver's external timeout is unknown but killed r04 somewhere
        # past ~40 min, and a relay-slow protocol measured 1922 s
        # (2026-08-20) vs 917 s warm — better an honest clamp/skip here
        # than an rc=124 from outside (the full protocol is recorded in
        # BENCH_r05_builder.json either way).
        hard = float(os.environ.get("BENCH_HARD_BUDGET_S", 2400))
        remaining = hard - (time.time() - _T_START)
        if remaining > float(os.environ.get("BENCH_PROTO_MIN_S", 900)):
            proto_timeout = min(
                float(os.environ.get("BENCH_PROTO_TIMEOUT", 5400)),
                remaining - 120,
            )
            _guard(extra, "protocol", lambda: leg_protocol(proto_timeout))
        else:
            extra["protocol_skipped"] = (
                f"only {remaining:.0f}s of {hard:.0f}s budget left"
            )
        emit()  # re-emit with the protocol results merged


if __name__ == "__main__":
    main()
