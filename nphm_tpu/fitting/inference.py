"""Latent-code fitting engines (the inference path of the framework).

Behavioral spec: reference ``src/NPHM/models/fitting.py``:
- ``fit_joint`` == ``inference_iterative_root_finding_joint`` (:14-177):
  jointly optimize one identity code and per-observation expression codes
  against |SDF| at Broyden-found canonical correspondences, with
  implicit-function-theorem gradients through the root, step-scheduled loss
  clamping, and hand-tuned lr/lambda division schedules.
- ``fit_identity`` == ``inference_identity_space`` (:180-285): the same
  without the deformation/root-finding stage.

TPU-first: schedules are precomputed on the host into step-indexed arrays, and
the entire optimization (sampling -> root finding -> losses -> two Adam
updates) compiles to ONE jit containing a ``lax.scan`` over steps — no
per-step dispatch, no recompilation.  Observation clouds of ragged sizes are
padded once; subsampling draws indices below each cloud's true length.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nphm_tpu.fitting.broyden import ift_correction, search
from nphm_tpu.ops.fallback import kernel_compile_error
from nphm_tpu.utils.math import safe_l2norm, sq_norm


def default_joint_lambdas() -> Dict[str, float]:
    """Hand-tuned loss weights of the reference fitting script
    (fitting_pointclouds.py:253-259)."""
    return {
        "surface": 2.0,
        "reg_expr": 0.01,
        "reg_global": 0.25,
        "reg_unobserved": 10.0,
        "reg_loc": 0.05,
        "symm_dist": 5.0,
    }


def default_joint_schedule() -> Dict[str, Dict[int, float]]:
    """Step-indexed divisors (fitting_pointclouds.py:261-266)."""
    return {
        "lr": {200: 2, 400: 2, 600: 2, 800: 2},
        "symm_dist": {200: 10, 500: 9999},
        "reg_global": {200: 3, 600: 10},
        "reg_loc": {500: 3, 600: 10},
        "reg_expr": {600: 10},
    }


@dataclasses.dataclass(frozen=True)
class FittingConfig:
    n_steps: int = 1000
    step_scale: float = 1.0
    lr: float = 0.01
    lr_scale: float = 1.0
    n_obs_per_batch: int = 5
    n_points_per_obs: int = 1000
    clamp_schedule: Sequence = ((0, 0.1), (250, 0.05), (500, 0.0075))
    unobserved_anchors: Sequence[int] = (30, 31, 39)
    broyden_max_steps: int = 15
    broyden_cvg: float = 1e-6
    broyden_dvg: float = 0.2
    training_mode_shape: bool = True  # reference fits with decoder_shape.train()
    log_every: int = 50
    seed: int = 0
    # XLA matmul precision inside the fit loop.  "default" (f32-equivalent,
    # 3-pass bf16) matches the reference's true-f32 torch matmuls;
    # "bfloat16" (single pass) converges to the same clamped-|sdf| floor but
    # buys only ~4% end-to-end (measured 9.7->9.3 s per 1000-step 20-obs fit
    # on a v5e): the loop is latency-bound on the 15-iteration sequential
    # Broyden search, not matmul-bound.
    matmul_precision: str = "default"
    # Route the NPHM shape-decoder eval at the Broyden roots through the
    # fused Pallas training kernel (ops/pallas_train.py) with member
    # culling: valid roots lie inside the anchor region where culling is
    # exact to ~cull_eps, and invalid/far roots are masked out of the loss
    # by valid_ids before any gradient flows.  "auto" = on for NPHM
    # decoders on a real TPU backend; the XLA path is the parity reference.
    fused_shape_fields: str = "auto"
    # Warm-start the Broyden root-find from the roots found for the SAME
    # observation points at an earlier fit step (a per-point store carried
    # through the scan).  The reference re-inits from x_posed every step
    # (iterative_root_finding.py:108); the latents move slowly between
    # steps, so warm-started points re-converge in a couple of iterations
    # and the sequential 15-iteration search (the fit loop's largest cost)
    # exits early.  Converged roots are identical up to broyden_cvg; this
    # changes only the iteration count, not the fixed point.
    warm_start_corresp: bool = True
    # Per-step Broyden iteration budget once the store is warm (step > 0).
    # Un-converged points keep their best iterate in the store, so unused
    # iterations are effectively deferred to the next visit of that point
    # rather than lost.  Measured (v5e, production dims, 20 obs x 2500 pts,
    # 1000 steps, random-init nets): cold-15 10.5 s, warm-8 7.1 s, warm-5
    # 6.7 s (1.56x) at the same loss floor and valid-correspondence count.
    # The isolated warm-3 run hinted at ~-1% n_valid, but the decisive test —
    # the full 77-mesh production protocol A/B (r04, PROTOCOL_r04.json) —
    # shows warm-3 at matched quality (Chamfer-L1 1.25798 vs 1.25677 base,
    # F@5 0.7317 vs 0.7324; the spread across ALL six A/B variants is
    # ±0.1%) and 37.8-39.0 s steady per 1000-step S=8 group vs 40.9 s at
    # warm-5 (35.0-36.4 s combined with ift_jacobian="broyden").  Default 3
    # on that protocol gate.
    broyden_warm_steps: int = 3
    # Initialize Broyden's inverse Jacobian at I instead of the autograd
    # Jacobian when warm-starting: g(x) = x + delta(x) - obs has J ~= I for
    # the smallish deformation fields this model family learns, and the
    # rank-1 updates recover the rest — skipping three JVP warp evals per
    # step.  Only applies when warm_start_corresp is on.  Measured (same rig
    # as above): 6.6 s fresh-J vs 6.4 s identity-J (and 6.2 s at
    # broyden_warm_steps=4) with matched n_valid — a ~4-7% option.  Default
    # off: the autograd init is the reference-faithful choice and safer for
    # strongly deformed expressions.
    warm_identity_jacobian: bool = False
    # Carry each point's Broyden-REFINED inverse Jacobian across fit steps in
    # the warm store (alongside its root): the search resumes from last
    # visit's J^-1 instead of re-paying the 3-JVP autograd Jacobian init
    # every step (~0.8 ms of a ~4.7 ms step at production dims).  Diverged
    # points reset to identity; the cold store init is identity, which the
    # full 15-iteration first-step budget absorbs (the identity-init variant
    # was already measured to match n_valid).  Only applies when
    # warm_start_corresp is on; overrides warm_identity_jacobian.
    # Validated at protocol scale (r04 A/B, 77 production-dims meshes):
    # store ON Chamfer-L1 1.25798 vs store OFF 1.25841 (noise) with the
    # store ~5-25% faster in steady group walls — the carried-store variant
    # is both reference-quality-matched and the faster default.
    warm_jacobian_store: bool = True
    # Stop a Broyden search once at most this fraction of its points is
    # still active.  0.0 = the reference's exact any(active) semantics.
    # Production diagnosis (PROTOCOL_r03_diag): ONE straggler among 5000
    # points holds the early exit open for the whole budget every step, so
    # each fit step pays whole-batch iterations for a vanishing tail;
    # stragglers cut off early simply fail the cvg validity test exactly as
    # they would after exhausting the budget, and the warm store lets them
    # resume next visit.  MEASURED DEAD END at protocol scale (r04 A/B):
    # with the warm budget already at 3-5 iterations, frac_exit=0.001 never
    # fires (mean executed iterations stays 5.00 — >0.1% of points are
    # still active at budget exhaustion every step) and steady walls are
    # unchanged.  Kept for the cold-start path where the 15-iteration
    # budget gives it room, but it is a no-op in production fits.
    broyden_frac_exit: float = 0.0
    # Inverse Jacobian used in the implicit-function-theorem gradient
    # attachment at the found roots (reference fitting.py:98-107).  "exact"
    # (reference-faithful) re-derives it with three JVPs + a 3x3 inverse
    # every step; "broyden" reuses the search's refined secant J^-1 — an
    # APPROXIMATE IFT gradient that skips those JVPs.  Protocol-scale A/B
    # (r04, 77 production-dims meshes): "broyden" matches quality exactly
    # (Chamfer-L1 1.25649 vs 1.25677 exact; combined with warm_steps=3 it
    # is 1.25797) and the combination is the fastest measured variant
    # (35.0-36.4 s steady per 1000-step S=8 group vs 40.9 s base, ~13%).
    # Default "broyden" on that gate; pass "exact" for the
    # reference-faithful gradient.
    ift_jacobian: str = "broyden"
    # Route the warm Broyden correspondence search through the fused Pallas
    # kernel (ops/pallas_search.py): the whole search — residual init + all
    # rank-1 iterations — runs as ONE kernel with trunk weights/activations
    # VMEM-resident and per-point state in lane-major registers, with a
    # per-tile early exit (a strict refinement of the reference's global
    # any(active), iterative_root_finding.py:39 — only whole-tile no-op
    # iterations are skipped).  Applies only to warm-started searches with
    # an explicit inverse-Jacobian init (warm store or identity): the
    # autograd-Jacobian cold init stays on the XLA path, as does any
    # config the kernel does not cover (interpolate-mode conditioning,
    # frac_exit, multi_corresp).  "auto" = on for kernel-eligible
    # deformation decoders on a real TPU backend; "on" forces it
    # (interpret mode off-TPU, for tests); "off" = the XLA parity path.
    fused_search: str = "auto"
    # Upper bound on the fit steps executed per DEVICE INVOCATION.  The
    # joint fit compiles to one lax.scan over all steps; for the NPHM
    # family that is a ~40 s program at S=8, but the NPM family's global
    # 8x1024 DeepSDF nets make the same scan a multi-MINUTE uninterrupted
    # execution, which has crashed the TPU worker through the axon relay
    # twice at protocol scale (r04: "TPU worker process crashed or
    # restarted" mid-fit, both --family npm attempts).  Segmenting the scan
    # re-enters the host every `steps_per_call` steps: identical trajectory
    # (the RNG folds the GLOBAL step index and the carry — latents, Adam
    # state, warm stores — threads through unchanged, tested), bounded
    # per-invocation device time, and a crash loses one segment's group
    # instead of poisoning a 1000-step program.  The per-segment cost is a
    # host sync only — observations and carries stay device-resident — and
    # it is MEASURED free at production scale (r05 NPMFIT_AB_r05.json,
    # S=8 x 1000-step NPM fits, same process: seg125 65.05 s steady,
    # seg250 65.34 s, seg500 64.77 s — ±0.5% = noise; the r04 VERDICT's
    # hypothesized ~4.6 s overhead misattributed the per-CALL obs-upload/
    # result-pull cost to segments).  -1 = auto: off for NPHM-kind shape
    # decoders (measured safe unsegmented), 125 steps — the maximum crash
    # insurance, since it costs nothing — for everything else on a real
    # TPU backend.  0 = force off.  Pick a divisor of total_steps or the
    # remainder segment compiles a second (shorter) program.
    steps_per_call: int = -1

    @property
    def total_steps(self) -> int:
        return int(self.n_steps * self.step_scale)


def _scheduled_array(
    base: float, events: Dict[int, float], total: int, step_scale: float
) -> np.ndarray:
    """Value per step under the reference's cumulative-division semantics."""
    out = np.zeros(total, np.float32)
    cur = base
    for j in range(total):
        if int(j / step_scale) in events:
            cur = cur / events[int(j / step_scale)]
        out[j] = cur
    return out


def _clamp_array(schedule, total: int, step_scale: float) -> np.ndarray:
    """|sdf| clamp threshold per step (reference fitting.py:125-133: the base
    threshold applies always; tighter ones kick in strictly after their step)."""
    out = np.zeros(total, np.float32)
    for j in range(total):
        thresh = None
        for after, value in schedule:
            if after == 0 or j > int(after * step_scale):
                thresh = value
        out[j] = thresh
    return out


def _pad_observations(all_obs: List[np.ndarray]):
    lens = np.asarray([len(o) for o in all_obs], np.int32)
    max_n = int(lens.max())
    padded = np.zeros((len(all_obs), max_n, 3), np.float32)
    for i, o in enumerate(all_obs):
        padded[i, : len(o)] = np.asarray(o, np.float32)[:, :3]
    return jnp.asarray(padded), jnp.asarray(lens)


def _masked_mean(values, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


# Per-step history terms, packed into ONE [T, K] device array before the
# host pull: each separate device->host transfer pays the relay's ~26 ms
# round-trip floor, so a dict of ~10 scalar-series arrays costs more to
# fetch than the fit steps it describes.
_JOINT_HIST_KEYS = (
    "loss", "n_valid", "reg_expr", "reg_global", "reg_loc",
    "reg_unobserved", "surface", "symm_dist", "broyden_iters",
)
_ID_HIST_KEYS = (
    "loss", "reg_global", "reg_loc", "reg_unobserved", "surface",
    "symm_dist",
)


def _shape_regularizers(decoder, lat_shape, unobserved):
    """Latent regularizers for the ensemble decoder's structured code
    (reference fitting.py:140-160)."""
    terms = {}
    if decoder.lat_dim_glob is not None:
        g, l = decoder.lat_dim_glob, decoder.lat_dim_loc
        terms["reg_loc"] = jnp.mean(sq_norm(lat_shape[..., g:]))
        terms["reg_global"] = jnp.mean(sq_norm(lat_shape[..., :g]))
        reg_unobserved = 0.0
        for idx in unobserved:
            sl = lat_shape[..., g + idx * l : g + (idx + 1) * l]
            reg_unobserved += jnp.mean(sq_norm(sl))
        terms["reg_unobserved"] = reg_unobserved
        n_symm = decoder.n_symm_pairs
        loc = lat_shape[..., g : g + 2 * n_symm * l].reshape(
            lat_shape.shape[0], 2 * n_symm, l
        )
        terms["symm_dist"] = jnp.mean(safe_l2norm(loc[:, ::2] - loc[:, 1::2]))
    else:
        terms["reg_loc"] = jnp.zeros(())
        terms["reg_global"] = jnp.mean(sq_norm(lat_shape))
        terms["reg_unobserved"] = jnp.zeros(())
        terms["symm_dist"] = jnp.zeros(())
    return terms



def _shape_fields_fn(decoder_shape, cfg: FittingConfig, mesh=None):
    """None, or a fused-kernel SDF evaluator for the fit losses.

    Returns ``fields(params_shape, pts [B,N,3], lat [B,D]) -> sdf [B,N,1]``
    backed by ``apply_nphm_fit_pallas`` (training-mode semantics — the
    reference fits with ``decoder_shape.train()`` — loss-specialized:
    forward F + first-order VJP w.r.t. lat/pts only, per-tile member
    culling at eval-grade cull_eps; valid because the fit's decoder params
    are frozen).  ``fused_shape_fields="train"`` selects the full training
    kernel (``apply_nphm_train_pallas``, ~8x the FLOPs — kept for A/B).

    The "auto" gate uses the platform the fit actually runs on: the MESH's
    devices when one is given, else the default backend (which sees "tpu"
    even in CPU-forced tests — see the verify skill notes)."""
    plat = _platform(mesh)
    mode = cfg.fused_shape_fields
    if mode == "auto":
        use = getattr(decoder_shape, "kind", None) == "nphm" and plat == "tpu"
    else:
        use = bool(mode) and mode != "off"
    if not use or getattr(decoder_shape, "kind", None) != "nphm":
        return None
    if mode == "train":
        from nphm_tpu.ops.pallas_train import apply_nphm_train_pallas

        def fields(params_shape, pts, lat_b):
            sdf, _grads, _anchors = apply_nphm_train_pallas(
                params_shape, decoder_shape.cfg, pts, lat_b,
                cull_eps=1e-10, sort=True, interpret=plat != "tpu",
            )
            return sdf

        return fields
    from nphm_tpu.ops.pallas_train import apply_nphm_fit_pallas

    def fields(params_shape, pts, lat_b):
        sdf, _anchors = apply_nphm_fit_pallas(
            params_shape, decoder_shape.cfg, pts, lat_b,
            cull_eps=1e-10, sort=True, interpret=plat != "tpu",
        )
        return sdf

    return fields


def _use_fused_search(decoder_expr, cfg: FittingConfig, mesh=None) -> bool:
    """Gate for the fused Broyden-search kernel (ops/pallas_search.py).

    Kernel-eligible only when the warm path provides an explicit
    inverse-Jacobian init (warm store or identity — the autograd cold init
    is XLA-only), the exact-``any(active)`` exit semantics apply
    (``frac_exit == 0``; the kernel's per-tile exit refines exactly that),
    and the decoder's conditioning is row-constant.  The "auto" platform
    gate mirrors ``_shape_fields_fn``."""
    mode = cfg.fused_search
    if mode == "off" or not mode:
        return False
    if not cfg.warm_start_corresp or cfg.broyden_frac_exit > 0:
        return False
    if not (cfg.warm_jacobian_store or cfg.warm_identity_jacobian):
        return False
    from nphm_tpu.ops.pallas_search import (
        search_fusable,
        search_vmem_estimate,
    )

    if not search_fusable(decoder_expr):
        return False
    if mode == "auto":
        plat = _platform(mesh)
        # Oversized trunks cannot hold their weights VMEM-resident: the NPM
        # family's 8x1024 offsets net (estimate 48 MB; Mosaic's real scoped
        # need runs ~1.6x the estimate — the 8x512 NPHM trunk estimates
        # 15 MB and measures ~24 MB) fails the compile at production dims
        # (r05 npm_fit_ab.py: every NPM fit fell back), so "auto" skips the
        # doomed build.  32 MB = 2x the known-good NPHM estimate, safely
        # under the 64 MB vmem_limit_bytes after the ~1.6x scale-up; "on"
        # still forces a try (the staged fallback catches failures).
        if search_vmem_estimate(decoder_expr) > (32 << 20):
            return False
        return plat == "tpu"
    return True


# Memoized kernel-downgrade outcomes: (tag, decoders, mesh, cfg) -> the
# flag overrides that made the program build.  A kernel-compile failure is
# a deterministic property of (kernel, shapes, config), so rediscovering it
# per fit call just repays a doomed trace/compile — the r04 driver bench
# paid FOUR rediscoveries (eight program builds) and timed out.
_KERNEL_FALLBACK_CACHE: Dict = {}


def _platform(mesh=None) -> str:
    """The platform a fit actually runs on: the MESH's devices when one is
    given, else the default backend (which sees "tpu" even in CPU-forced
    tests — see the verify skill notes).  The single source for every gate
    and cache key in this module, so "what platform is this fit" can never
    drift between them."""
    if mesh is not None:
        return mesh.devices.flat[0].platform
    return jax.default_backend()


def _mesh_key(mesh):
    """Hashable mesh identity for the fallback cache.

    Kernel lowering depends on the per-device shard shapes (mesh axis
    sizes) and the platform, not merely mesh-vs-no-mesh: an 8-device
    downgrade must not leak onto single-device fits of the same decoders,
    and vice versa.  (The padded DATA dims complete the shard shapes;
    callers pass those via ``shapes``.)
    """
    if mesh is None:
        return None
    return tuple(mesh.shape.items()), _platform(mesh)


def _run_with_xla_fallback(make_run, cfg, decoder_shape, driver, tag, mesh=None,
                           decoder_expr=None, shapes=None):
    """Execute a cached fit runner, materializing every output.

    ``driver(run_fn)`` performs the actual call(s) — one invocation for the
    single-scan program, a segment loop under ``cfg.steps_per_call``.

    If the fused-kernel variant fails to COMPILE (tiny architectures hit a
    Mosaic "only constant accumulators supported" error — see
    .claude/skills/verify/SKILL.md), rebuild on a DOWNGRADED path and
    retry, walking a ladder of flag combinations ordered by retained
    throughput: search off (fit kernel kept), then fields off with the
    search kernel RESTORED (the two lower independently — a fields failure
    must not take the healthy search kernel down with it), then both off.
    The r04 all-or-nothing fallback threw away ~40% fit throughput when
    only the search kernel failed.  (When BOTH kernels are doomed the
    fields-off-search-restored rung is one extra doomed build vs blaming
    them together — accepted: it is what buys back the healthy search
    kernel in the fields-only case, failures are memoized per process, and
    Mosaic lowering errors surface during lowering, not after a full
    compile.)  The winning rung is memoized per (tag, decoders, mesh,
    padded data shapes, cfg) — ``shapes`` must carry the padded dims that
    shape the traced program (subject/obs/point pads), since a downgrade
    discovered at one batch size must not leak onto another.  Only
    kernel-compile signatures
    (ops/fallback.py) trigger the fallback: a genuine runtime failure
    (OOM, worker crash, NaN guard) must surface immediately rather than be
    replayed — more slowly — on XLA, and must reach
    ``fit_joint_batch_resilient``'s bisection untouched.  Returns
    (materialized outputs, elapsed seconds of the successful run).
    """
    key = (tag, decoder_shape, decoder_expr, _mesh_key(mesh), shapes, cfg)
    search_on = decoder_expr is not None and _use_fused_search(
        decoder_expr, cfg, mesh
    )
    fields_on = _shape_fields_fn(decoder_shape, cfg, mesh) is not None
    ladder = [()]
    if search_on:
        ladder.append((("fused_search", "off"),))
    if fields_on:
        ladder.append((("fused_shape_fields", "off"),))
    if search_on and fields_on:
        ladder.append((("fused_search", "off"), ("fused_shape_fields", "off")))
    cached = _KERNEL_FALLBACK_CACHE.get(key)
    rung = ladder.index(cached) if cached in ladder else 0
    while True:
        overrides = dict(ladder[rung])
        run_cfg = dataclasses.replace(cfg, **overrides) if overrides else cfg
        t0 = time.time()
        try:
            out = driver(make_run(run_cfg))
            out = jax.tree_util.tree_map(np.asarray, out), time.time() - t0
            if rung:
                _KERNEL_FALLBACK_CACHE[key] = ladder[rung]
            return out
        except Exception as e:  # noqa: BLE001 — the relay wraps compile errors
            if not kernel_compile_error(e):
                raise
            rung += 1
            if rung >= len(ladder):
                raise  # pure-XLA program failed: nothing left to downgrade
            print(
                f"[{tag}] fused-kernel fit program failed "
                f"({type(e).__name__}); retrying with {dict(ladder[rung])}"
            )


def _fit_segments(cfg: FittingConfig, decoder_shape, total: int, mesh=None,
                  subjects_per_device: int = 1):
    """Resolve ``steps_per_call`` into a list of (step_offset, length).

    -1 (auto) keeps the NPHM family on its measured-safe single-scan
    program UP TO 8 vmapped subjects per device and segments everything
    else — the NPM family's global DeepSDF fit at any size, and NPHM
    batches past 8 subjects/device — into 125-step device invocations on
    a real TPU backend.  The NPHM S-gate is measured, not cautious: an
    UNSEGMENTED 1000-step S=16 NPHM invocation reliably crashes the TPU
    worker and the crash poisons the in-process backend permanently,
    while segmentation itself costs nothing (37.84 vs 37.15 s at S=8
    seg125; BATCHSIZE_AB_r05.json + RESILIENT_PROBE_r05.json).  CPU runs
    are never segmented by auto (no relay, no crash surface, and tests
    cover the explicit setting).  Gates on the platform the fit actually
    runs on (``_platform``: the mesh's devices when one is given).
    """
    seg = cfg.steps_per_call
    if seg < 0:
        is_nphm = getattr(decoder_shape, "kind", None) == "nphm"
        safe_unsegmented = is_nphm and subjects_per_device <= 8
        seg = (
            125
            if not safe_unsegmented and _platform(mesh) == "tpu"
            else 0
        )
    if seg <= 0 or seg >= total:
        return [(0, total)]
    return [(off, min(seg, total - off)) for off in range(0, total, seg)]


def _coerce_cfg(cfg: FittingConfig) -> FittingConfig:
    """Make cfg hashable (tuple-ize sequence fields) for the runner cache."""
    return dataclasses.replace(
        cfg,
        clamp_schedule=tuple(tuple(x) for x in cfg.clamp_schedule),
        unobserved_anchors=tuple(cfg.unobserved_anchors),
    )


def _make_joint_loss(decoder_shape, decoder_expr, cfg: FittingConfig,
                     lam_keys, fused_fields, fused_search=False,
                     search_interpret=False):
    """The ONE joint-fit loss body, shared by the single-subject and batched
    runners (reference fitting.py:98-162: anchors -> Broyden search -> IFT
    correction -> clamped |sdf| + regularizers).

    Returns ``loss_fn(lat_s, lat_e, params_shape, params_expr, padded,
    lam_row, clamp_j, sel, idx, xc0, jinv0, broyden_steps) -> (loss, aux)``
    with ``aux = {**terms, "n_valid", "xc_opt", "j_inv"}``.  Callers that
    only consume a subset of ``aux`` (the batched runner keeps just loss +
    xc_opt) pay nothing extra: unused aux outputs are dead-code-eliminated
    by XLA.
    """
    nb = cfg.n_obs_per_batch
    use_anchors = decoder_shape.lat_dim_glob is not None
    warm = cfg.warm_start_corresp

    def loss_fn(lat_s, lat_e, params_shape, params_expr, padded,
                lam_row, clamp_j, sel, idx, xc0, jinv0, broyden_steps):
        _, anchors = decoder_shape.apply(
            params_shape,
            jnp.zeros((1, 1, 3)),
            lat_s,
            training=cfg.training_mode_shape,
        )
        obs = jnp.take_along_axis(padded[sel], idx[..., None], axis=1)
        cond = jnp.concatenate(
            [jnp.broadcast_to(lat_s, (nb, lat_s.shape[-1])), lat_e[sel]], axis=-1
        )
        anchors_b = (
            jnp.broadcast_to(anchors, (nb,) + anchors.shape[1:])
            if use_anchors and anchors is not None
            else None
        )
        if fused_search:
            from nphm_tpu.ops.pallas_search import search_pallas

            jinv_k = (
                jnp.broadcast_to(jnp.eye(3, dtype=obs.dtype),
                                 obs.shape[:-1] + (3, 3))
                if jinv0 is None
                else jinv0
            )
            xc_opt, result = search_pallas(
                decoder_expr, params_expr, obs, cond, anchors_b,
                max_steps=broyden_steps,
                cvg_thresh=cfg.broyden_cvg,
                dvg_thresh=cfg.broyden_dvg,
                xc_init=obs if xc0 is None else xc0,
                j_inv_init=jinv_k,
                interpret=search_interpret,
            )
        else:
            xc_opt, result = search(
                decoder_expr, params_expr, obs, cond, anchors_b,
                max_steps=broyden_steps,
                cvg_thresh=cfg.broyden_cvg,
                dvg_thresh=cfg.broyden_dvg,
                xc_init=xc0,
                identity_j_init=warm and cfg.warm_identity_jacobian,
                j_inv_init=jinv0,
                frac_exit=cfg.broyden_frac_exit,
            )
        xc = ift_correction(
            decoder_expr, params_expr, xc_opt, cond, anchors_b,
            j_inv=result["j_inv"] if cfg.ift_jacobian == "broyden" else None,
        )
        lat_b = jnp.broadcast_to(lat_s, (nb, lat_s.shape[-1]))
        if fused_fields is not None:
            sdf = fused_fields(params_shape, xc, lat_b)
        else:
            sdf, _ = decoder_shape.apply(
                params_shape, xc, lat_b, training=cfg.training_mode_shape
            )
        l = jnp.abs(sdf[..., 0])
        mask = jnp.logical_and(result["valid_ids"], l < clamp_j).astype(l.dtype)
        terms = {"surface": _masked_mean(l, mask)}
        terms["reg_expr"] = jnp.mean(sq_norm(lat_e[sel]))
        terms.update(
            _shape_regularizers(decoder_shape, lat_s, cfg.unobserved_anchors)
        )
        loss = 0.0
        for i, k in enumerate(lam_keys):
            loss = loss + lam_row[i] * terms[k]
        aux = dict(terms)
        aux["n_valid"] = jnp.sum(result["valid_ids"].astype(jnp.float32))
        # executed (not budgeted) Broyden iterations this step: the search
        # while_loop exits early once every point converges/diverges, so its
        # cost is data-dependent — spatially-varying warps run closer to the
        # budget than rigid ones
        aux["broyden_iters"] = result["iters"].astype(jnp.float32)
        aux["xc_opt"] = xc_opt
        aux["j_inv"] = result["j_inv"]
        return loss, aux

    return loss_fn


@functools.lru_cache(maxsize=64)
def _joint_runner(decoder_shape, decoder_expr, cfg: FittingConfig, lam_keys):
    """Build-and-cache the compiled joint-fit program.

    Everything data-like (schedules, observations, latents, params) is an
    ARGUMENT of the jitted function; only decoders/config/loss-key order are
    closed over.  Repeat fits (e.g. the 23-subject eval protocol, or every
    re-invocation in a long session) therefore reuse one executable instead
    of re-tracing and re-compiling a ~20 s scan per call.
    """
    nb, npp = cfg.n_obs_per_batch, cfg.n_points_per_obs
    adam = optax.scale_by_adam()
    fused_fields = _shape_fields_fn(decoder_shape, cfg)
    warm = cfg.warm_start_corresp
    loss_fn = _make_joint_loss(
        decoder_shape, decoder_expr, cfg, lam_keys, fused_fields,
        fused_search=_use_fused_search(decoder_expr, cfg),
        search_interpret=jax.default_backend() != "tpu",
    )
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    warm_j = warm and cfg.warm_jacobian_store

    def run(lat_shape, lat_expr, os_state, oe_state, params_shape, params_expr,
            padded, lens, n_obs, base_key, lr_arr, lam_mat, clamp_arr,
            store0, storej0, step_offset):
        def step(carry, t):
            lat_s, lat_e, os_state, oe_state, store, store_j = carry
            # RNG and cold-start checks use the GLOBAL step index so a
            # segmented fit (steps_per_call) replays the exact trajectory
            # of the single-scan program; schedules arrive pre-sliced and
            # are indexed by the local position t.
            j = t + step_offset
            rng = jax.random.fold_in(base_key, j)
            k1, k2 = jax.random.split(rng)
            sel = jax.random.randint(k1, (nb,), 0, n_obs)
            idx = jax.random.randint(k2, (nb, npp), 0, lens[sel][:, None])
            if warm:
                xc0 = jnp.take_along_axis(store[sel], idx[..., None], axis=1)
                bsteps = jnp.where(
                    j == 0, cfg.broyden_max_steps, cfg.broyden_warm_steps
                )
            else:
                xc0, bsteps = None, cfg.broyden_max_steps
            jinv0 = (
                jnp.take_along_axis(
                    store_j[sel], idx[:, :, None, None], axis=1
                )
                if warm_j
                else None
            )
            (loss, aux), (g_s, g_e) = grad_fn(
                lat_s, lat_e, params_shape, params_expr, padded,
                lam_mat[:, t], clamp_arr[t], sel, idx, xc0, jinv0, bsteps,
            )
            xc_opt = aux.pop("xc_opt")
            j_inv = aux.pop("j_inv")
            if warm:
                store = store.at[sel[:, None], idx].set(xc_opt)
            if warm_j:
                store_j = store_j.at[sel[:, None], idx].set(j_inv)
            lr = lr_arr[t]
            upd_s, os_state = adam.update(g_s, os_state, lat_s)
            lat_s = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, lat_s, upd_s
            )
            upd_e, oe_state = adam.update(g_e, oe_state, lat_e)
            lat_e = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, lat_e, upd_e
            )
            aux["loss"] = loss
            hist = jnp.stack([aux[k] for k in _JOINT_HIST_KEYS])
            return (lat_s, lat_e, os_state, oe_state, store, store_j), hist

        with jax.default_matmul_precision(cfg.matmul_precision):
            carry, history = jax.lax.scan(
                step,
                (lat_shape, lat_expr, os_state, oe_state, store0, storej0),
                jnp.arange(lr_arr.shape[0]),
            )
        return carry, history

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _joint_batch_runner(decoder_shape, decoder_expr, cfg: FittingConfig,
                        lam_keys, mesh=None):
    """Compiled multi-subject (vmapped) joint-fit program, cached like
    ``_joint_runner``.

    With ``mesh``, the subjects axis is sharded across the device mesh via
    ``shard_map`` — subjects are independent, so each device runs its whole
    block (scan, Broyden while_loops, optional Pallas kernel) locally with
    zero collectives, and per-subject trajectories are bit-comparable to the
    single-device program (the RNG folds the GLOBAL subject index, passed in
    as ``subj_idx``)."""
    nb, npp = cfg.n_obs_per_batch, cfg.n_points_per_obs
    adam = optax.scale_by_adam()
    fused_fields = _shape_fields_fn(decoder_shape, cfg, mesh)
    warm = cfg.warm_start_corresp
    plat = _platform(mesh)
    loss_fn = _make_joint_loss(
        decoder_shape, decoder_expr, cfg, lam_keys, fused_fields,
        fused_search=_use_fused_search(decoder_expr, cfg, mesh),
        search_interpret=plat != "tpu",
    )
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    warm_j = warm and cfg.warm_jacobian_store

    def scan_block(lat_shape, lat_expr, os_state, oe_state, padded, lens,
                   n_obs, subj_idx, params_shape, params_expr, base_key,
                   lr_arr, lam_mat, clamp_arr, store0, storej0, step_offset):
        """Fit a block of subjects: the whole batch, or one device's shard
        when running under ``shard_map``."""

        def step(carry, t):
            lat_s, lat_e, os_state, oe_state, store, store_j = carry
            # global step index: segmented runs replay the single-scan
            # trajectory exactly (RNG + cold-start gates see j, schedules
            # arrive pre-sliced and use the local position t)
            j = t + step_offset
            rngs = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.fold_in(base_key, j), s)
            )(subj_idx)
            lr = lr_arr[t]
            bsteps = (
                jnp.where(j == 0, cfg.broyden_max_steps, cfg.broyden_warm_steps)
                if warm
                else cfg.broyden_max_steps
            )

            def per_subject(lat_s_s, lat_e_s, pad_s, len_s, n_s, rng_s, os_s,
                            oe_s, store_s, store_j_s):
                k1, k2 = jax.random.split(rng_s)
                sel = jax.random.randint(k1, (nb,), 0, n_s)
                idx = jax.random.randint(k2, (nb, npp), 0, len_s[sel][:, None])
                xc0 = (
                    jnp.take_along_axis(store_s[sel], idx[..., None], axis=1)
                    if warm
                    else None
                )
                jinv0 = (
                    jnp.take_along_axis(
                        store_j_s[sel], idx[:, :, None, None], axis=1
                    )
                    if warm_j
                    else None
                )
                (loss, aux), (g_s, g_e) = grad_fn(
                    lat_s_s, lat_e_s, params_shape, params_expr, pad_s,
                    lam_mat[:, t], clamp_arr[t], sel, idx, xc0, jinv0, bsteps,
                )
                if warm:
                    store_s = store_s.at[sel[:, None], idx].set(aux["xc_opt"])
                if warm_j:
                    store_j_s = store_j_s.at[sel[:, None], idx].set(
                        aux["j_inv"]
                    )
                upd_s, os_s = adam.update(g_s, os_s, lat_s_s)
                upd_e, oe_s = adam.update(g_e, oe_s, lat_e_s)
                return (
                    lat_s_s - lr * upd_s,
                    lat_e_s - lr * upd_e,
                    os_s,
                    oe_s,
                    store_s,
                    store_j_s,
                    loss,
                    aux["broyden_iters"],
                )

            (lat_s, lat_e, os_state, oe_state, store, store_j, losses,
             biters) = jax.vmap(per_subject)(
                lat_s, lat_e, padded, lens, n_obs, rngs, os_state, oe_state,
                store, store_j,
            )
            return (
                (lat_s, lat_e, os_state, oe_state, store, store_j),
                (losses, biters),
            )

        with jax.default_matmul_precision(cfg.matmul_precision):
            carry, (losses, biters) = jax.lax.scan(
                step,
                (lat_shape, lat_expr, os_state, oe_state, store0, storej0),
                jnp.arange(lr_arr.shape[0]),
            )
        return carry + (losses, biters)

    if mesh is None:
        block = scan_block
    else:
        from nphm_tpu.parallel.mesh import DATA_AXIS
        from jax.sharding import PartitionSpec as P

        D, R = P(DATA_AXIS), P()
        block = jax.shard_map(
            scan_block,
            mesh=mesh,
            in_specs=(D, D, D, D, D, D, D, D, R, R, R, R, R, R, D, D, R),
            out_specs=(
                D, D, D, D, D, D,
                P(None, DATA_AXIS), P(None, DATA_AXIS),
            ),
            check_vma=False,  # pallas_call out_shape carries no vma
        )

    def run(*args):
        *carry, losses, biters = block(*args)
        return tuple(carry), (losses, biters)

    return jax.jit(run)


def fit_joint(
    decoder_shape,
    params_shape,
    decoder_expr,
    params_expr,
    all_obs: List[np.ndarray],
    lambdas: Optional[Dict[str, float]] = None,
    schedule: Optional[Dict[str, Dict[int, float]]] = None,
    cfg: FittingConfig = FittingConfig(),
    lat_expr_init: Optional[np.ndarray] = None,
    lat_shape_init: Optional[np.ndarray] = None,
    verbose: bool = True,
):
    """Joint identity + expression fitting with Broyden correspondences.

    Returns (lat_expr [n_obs, E], lat_shape [1, D], anchors, history dict).

    Default numerics note: ``cfg.warm_start_corresp=True`` (with
    ``broyden_warm_steps``) warm-starts the root-find from each point's
    previous root, while the reference cold-re-inits from x_posed with 15
    Broyden iterations every step (iterative_root_finding.py:108).
    Converged roots agree only up to ``broyden_cvg``, so an exact
    reference-TRAJECTORY comparison needs
    ``FittingConfig(warm_start_corresp=False)`` (like
    ``matmul_precision="default"``, which is already the reference-faithful
    setting).  The fixed points, loss floor, and n_valid match either way.
    """
    cfg = _coerce_cfg(cfg)
    lambdas = dict(lambdas or default_joint_lambdas())
    schedule = schedule or default_joint_schedule()
    total = cfg.total_steps
    lam_keys = tuple(sorted(lambdas))

    lr_arr = jnp.asarray(
        _scheduled_array(cfg.lr * cfg.lr_scale, schedule.get("lr", {}), total, cfg.step_scale)
    )
    lam_mat = jnp.stack(
        [
            jnp.asarray(
                _scheduled_array(
                    lambdas[k], schedule.get(k, {}), total, cfg.step_scale
                )
            )
            for k in lam_keys
        ]
    )
    clamp_arr = jnp.asarray(_clamp_array(cfg.clamp_schedule, total, cfg.step_scale))

    padded, lens = _pad_observations(all_obs)
    n_obs = len(all_obs)
    # pad shapes to stable granules so repeat fits hit the runner cache
    # (obs counts 7-24 in the eval protocol -> granule 8 = three buckets)
    o_pad = -(-n_obs // 8) * 8
    p_pad = -(-padded.shape[1] // 512) * 512
    padded = jnp.pad(padded, ((0, o_pad - n_obs), (0, p_pad - padded.shape[1]), (0, 0)))
    lens = jnp.pad(lens, (0, o_pad - n_obs), constant_values=1)

    lat_expr = (
        jnp.zeros((o_pad, decoder_expr.lat_dim), jnp.float32)
        if lat_expr_init is None
        else jnp.pad(
            jnp.asarray(lat_expr_init, jnp.float32).reshape(n_obs, -1),
            ((0, o_pad - n_obs), (0, 0)),
        )
    )
    lat_shape = (
        jnp.zeros((1, decoder_shape.lat_dim), jnp.float32)
        if lat_shape_init is None
        else jnp.asarray(lat_shape_init, jnp.float32).reshape(1, -1)
    )

    adam = optax.scale_by_adam()
    opt_shape_state = adam.init(lat_shape)
    opt_expr_state = adam.init(lat_expr)
    base_key = jax.random.PRNGKey(cfg.seed)

    warm = cfg.warm_start_corresp
    warm_j = warm and cfg.warm_jacobian_store
    store0 = padded if warm else jnp.zeros((1,))
    storej0 = (
        jnp.broadcast_to(
            jnp.eye(3, dtype=padded.dtype), padded.shape[:2] + (3, 3)
        )
        if warm_j
        else jnp.zeros((1,))
    )
    segments = _fit_segments(cfg, decoder_shape, total)

    def driver(run_fn):
        carry = (lat_shape, lat_expr, opt_shape_state, opt_expr_state,
                 store0, storej0)
        hists = []
        for off, ln in segments:
            carry, hist = run_fn(
                *carry[:4], params_shape, params_expr, padded, lens, n_obs,
                base_key, lr_arr[off:off + ln], lam_mat[:, off:off + ln],
                clamp_arr[off:off + ln], carry[4], carry[5], np.int32(off),
            )
            hists.append(hist)
            if len(segments) > 1:
                # force this segment's execution to finish before the next
                # is dispatched: bounded per-invocation device time is the
                # whole point of segmenting (one scalar pull, ~26 ms)
                np.asarray(hist[-1, 0])
        full = hists[0] if len(hists) == 1 else jnp.concatenate(hists, axis=0)
        return (carry[0], carry[1]), full

    ((lat_shape, lat_expr), hist), elapsed = _run_with_xla_fallback(
        lambda c: _joint_runner(decoder_shape, decoder_expr, c, lam_keys),
        cfg, decoder_shape, driver, "fit_joint", decoder_expr=decoder_expr,
        shapes=(o_pad, p_pad),
    )
    history = {k: hist[:, i] for i, k in enumerate(_JOINT_HIST_KEYS)}
    lat_expr = lat_expr[:n_obs]
    if verbose:
        for j in range(0, total, max(1, cfg.log_every)):
            msg = f"Step {j:5d} " + " ".join(
                f"{k} {history[k][j]:02.6f}" for k in sorted(history) if k != "n_valid"
            )
            print(msg, int(history["n_valid"][j]))
        print(f"[fit_joint] {total} steps in {elapsed:.1f}s "
              f"({total / max(elapsed, 1e-9):.1f} it/s)")

    _, anchors = decoder_shape.apply(
        params_shape, jnp.zeros((1, 1, 3)), lat_shape, training=False
    )
    history["elapsed_s"] = elapsed
    return np.asarray(lat_expr), np.asarray(lat_shape), (
        None if anchors is None else np.asarray(anchors)
    ), history


def fit_joint_batch(
    decoder_shape,
    params_shape,
    decoder_expr,
    params_expr,
    subjects_obs: List[List[np.ndarray]],
    lambdas: Optional[Dict[str, float]] = None,
    schedule: Optional[Dict[str, Dict[int, float]]] = None,
    cfg: FittingConfig = FittingConfig(),
    verbose: bool = True,
    mesh=None,
    pad_obs_to: int = 0,
    pad_points_to: int = 0,
    pad_subjects_to: int = 0,
):
    """Fit MANY subjects at once by vmapping the per-subject fit step.

    The reference protocol fits its 23 test identities serially
    (fitting_pointclouds.py:241-287).  Vmapping S subjects multiplies every
    matmul's batch by S at the same step count.  Measured on one v5e
    (production dims, 20 obs x 2500 pts, 1000 steps, loss-specialized fit
    kernel, 2026-08-17): S=8 runs at 196 subject-steps/s steady state vs
    ~214 it/s for the serial fit — 1.8x protocol throughput — plus one
    compile for the whole protocol instead of one per obs-count bucket.
    Capacity diagnosis (VERDICT r2 item 3): the compiled S=8 program
    declares 1.47 GB HBM temp + 27 MB args (memory_analysis; S=2: 0.47 GB,
    S=4: 0.98 GB — ~linear) on a 16 GB chip, and S=8 completes 1000 steps
    repeatedly; the one recorded round-2 S=8 crash ("TPU worker process
    crashed or restarted") is therefore a transient worker/relay failure,
    not a program-capacity limit.  ``fit_joint_batch_resilient`` remains
    the guard for exactly that failure class.  S=16 is a measured dead
    end (BATCHSIZE_AB_r05.json, 2026-08-20): no throughput gain over S=8
    (4.81 vs 4.64-4.73 s/subject — the vmapped matmuls already saturate
    the chip) and the unsegmented 1000-step S=16 invocation reliably
    crashes the worker (the same over-long-invocation class the NPM
    family's auto-segmentation exists for).
    The per-subject optimization trajectory is identical to ``fit_joint``
    up to RNG draws (each subject folds its own seed).

    ``mesh``: optional ``jax.sharding.Mesh`` — shards the subjects axis
    across devices (each chip fits its own block of subjects; no
    collectives).  The subject count is padded up to a multiple of the mesh
    size with dummy subjects; per-subject results are unchanged vs
    ``mesh=None`` because the RNG folds the global subject index.

    subjects_obs: one observation list per subject (ragged sizes fine).
    ``pad_obs_to`` / ``pad_points_to``: lower bounds on the padded
    observation-count and points-per-observation axes.  A caller looping
    over groups (the protocol CLI) passes its GLOBAL maxima so every group
    reuses ONE compiled executable — without them the per-group granule
    rounding (8 obs / 512 points) makes e.g. obs counts 7-24 compile three
    programs (VERDICT r3 weak item 1).
    ``pad_subjects_to``: lower bound on the subject axis — the same
    one-executable argument applied to S: a 23-subject protocol at group
    size 8 otherwise compiles a second program for its trailing S=7 group
    (measured, PROTOCOL_r04 group walls: 40.9 s steady S=8 vs 91.4 s for
    the S=7 group = recompile + steady).  Dummy rows reuse the mesh-padding
    machinery below and are dropped from the results.
    Returns per-subject lists: (lat_exprs, lat_shapes, anchors, history).
    """
    cfg = _coerce_cfg(cfg)
    lambdas = dict(lambdas or default_joint_lambdas())
    schedule = schedule or default_joint_schedule()
    total = cfg.total_steps
    S = len(subjects_obs)
    S_pad = max(S, pad_subjects_to) if pad_subjects_to else S
    if mesh is not None:
        S_pad = -(-S_pad // mesh.size) * mesh.size
    lam_keys = tuple(sorted(lambdas))

    lr_arr = jnp.asarray(
        _scheduled_array(cfg.lr * cfg.lr_scale, schedule.get("lr", {}), total, cfg.step_scale)
    )
    lam_mat = jnp.stack(
        [
            jnp.asarray(
                _scheduled_array(
                    lambdas[k], schedule.get(k, {}), total, cfg.step_scale
                )
            )
            for k in lam_keys
        ]
    )
    clamp_arr = jnp.asarray(_clamp_array(cfg.clamp_schedule, total, cfg.step_scale))

    n_obs = np.asarray([len(o) for o in subjects_obs], np.int32)
    o_max = -(-max(int(n_obs.max()), pad_obs_to) // 8) * 8
    p_max = -(
        -max(
            int(max(len(o) for obs in subjects_obs for o in obs)),
            pad_points_to,
        )
        // 512
    ) * 512
    padded = np.zeros((S_pad, o_max, p_max, 3), np.float32)
    lens = np.ones((S_pad, o_max), np.int32)  # 1 (not 0) so randint stays valid
    for s_i, obs in enumerate(subjects_obs):
        for i, o in enumerate(obs):
            o = np.asarray(o, np.float32)[:, :3]
            padded[s_i, i, : len(o)] = o
            lens[s_i, i] = len(o)
    padded, lens = jnp.asarray(padded), jnp.asarray(lens)
    n_obs_j = jnp.asarray(
        np.concatenate([n_obs, np.ones(S_pad - S, np.int32)])
    )
    subj_idx = jnp.arange(S_pad, dtype=jnp.int32)

    lat_expr = jnp.zeros((S_pad, o_max, decoder_expr.lat_dim), jnp.float32)
    lat_shape = jnp.zeros((S_pad, 1, decoder_shape.lat_dim), jnp.float32)

    adam = optax.scale_by_adam()
    opt_shape_state = jax.vmap(adam.init)(lat_shape)
    opt_expr_state = jax.vmap(adam.init)(lat_expr)
    base_key = jax.random.PRNGKey(cfg.seed)

    warm = cfg.warm_start_corresp
    warm_j = warm and cfg.warm_jacobian_store
    store0 = padded if warm else jnp.zeros((S_pad, 1))
    storej0 = (
        jnp.broadcast_to(
            jnp.eye(3, dtype=padded.dtype), padded.shape[:3] + (3, 3)
        )
        if warm_j
        else jnp.zeros((S_pad, 1))
    )
    segments = _fit_segments(
        cfg, decoder_shape, total, mesh,
        subjects_per_device=S_pad // (mesh.size if mesh is not None else 1),
    )

    def driver(run_fn):
        carry = (lat_shape, lat_expr, opt_shape_state, opt_expr_state,
                 store0, storej0)
        hists = []
        for off, ln in segments:
            carry, hist = run_fn(
                *carry[:4], padded, lens, n_obs_j, subj_idx, params_shape,
                params_expr, base_key, lr_arr[off:off + ln],
                lam_mat[:, off:off + ln], clamp_arr[off:off + ln],
                carry[4], carry[5], np.int32(off),
            )
            hists.append(hist)
            if len(segments) > 1:
                # per-segment sync: bound each device invocation (see
                # FittingConfig.steps_per_call)
                np.asarray(hist[0][-1, 0])
        full = (
            hists[0]
            if len(hists) == 1
            else jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *hists
            )
        )
        return (carry[0], carry[1]), full

    ((lat_shape, lat_expr), (losses, biters)), elapsed = _run_with_xla_fallback(
        lambda c: _joint_batch_runner(
            decoder_shape, decoder_expr, c, lam_keys, mesh
        ),
        cfg, decoder_shape, driver, "fit_joint_batch",
        mesh=mesh, decoder_expr=decoder_expr,
        shapes=(S_pad, o_max, p_max),
    )
    losses = losses[:, :S]
    biters = biters[:, :S]
    if verbose:
        print(
            f"[fit_joint_batch] {S} subjects x {total} steps in {elapsed:.1f}s "
            f"({total / max(elapsed, 1e-9):.1f} it/s, "
            f"{S * total / max(elapsed, 1e-9):.1f} subject-steps/s, "
            f"mean Broyden iters {float(biters.mean()):.2f})"
        )

    lat_shape, lat_expr = lat_shape[:S], lat_expr[:S]
    _, anchors = decoder_shape.apply(
        params_shape, jnp.zeros((S, 1, 3)), lat_shape[:, 0], training=False
    )
    lat_exprs = [np.asarray(lat_expr[s, : n_obs[s]]) for s in range(S)]
    lat_shapes = [np.asarray(lat_shape[s]) for s in range(S)]
    anchors_list = (
        [None] * S if anchors is None else [np.asarray(anchors[s : s + 1]) for s in range(S)]
    )
    history = {"loss": losses, "broyden_iters": biters, "elapsed_s": elapsed}
    return lat_exprs, lat_shapes, anchors_list, history



def fit_joint_batch_resilient(
    decoder_shape,
    params_shape,
    decoder_expr,
    params_expr,
    subjects_obs: List[List[np.ndarray]],
    lambdas: Optional[Dict[str, float]] = None,
    schedule: Optional[Dict[str, Dict[int, float]]] = None,
    cfg: FittingConfig = FittingConfig(),
    verbose: bool = True,
    mesh=None,
    pad_obs_to: int = 0,
    pad_points_to: int = 0,
    pad_subjects_to: int = 0,
    _batch_fn=None,
    _single_fn=None,
    _recover_fn=None,
):
    """Crash-tolerant ``fit_joint_batch``: bisect-and-retry on worker crashes.

    A large vmapped fit has crashed the TPU worker in this environment
    (verify skill record: "TPU worker process crashed or restarted"; the
    chip recovers on its own).  A 23-subject evaluation protocol must not
    die mid-run, so any runtime failure of a group fit is caught, logged,
    and the group is bisected — each half retried independently, singleton
    groups through the non-vmapped ``fit_joint``.  A singleton that fails
    twice re-raises: that is a genuine error, not a capacity crash.

    A worker crash poisons the whole in-process backend — every retry,
    however small, fails instantly until the runtime is re-initialized
    (measured r04: the NPM S=8 fit crashed the worker and the ladder burned
    8→4→2→1 retries against the dead backend in seconds).  Crash-shaped
    failures (``ops.fallback.backend_crash_error``) therefore trigger
    ``recover_backend()`` before the ladder continues, and the decoder
    params are snapshotted to HOST memory up front so retries do not
    dereference device buffers that died with the worker.  The Broyden warm
    store and Adam state live inside each (re-executed) group fit, so a
    recovered retry is a clean re-fit of that group, not a resume.

    When ``recover_backend()`` itself FAILS the backend is gone for this
    process — continuing the bisection would burn a full ~3-minute
    recovery ladder per rung against a dead runtime (measured live on the
    S=16 worker crash, 2026-08-20: five rungs ≈ 16 wasted minutes before
    the honest re-raise).  The wrapper then aborts immediately with a
    clear error; a fresh process is the only cure (the chip itself
    recovers on its own — verify-skill record).

    Same contract as ``fit_joint_batch``; ``history`` additionally records
    ``group_sizes`` (the sizes that ultimately succeeded) and ``crashes``.
    ``_batch_fn``/``_single_fn`` are test seams.
    """
    from nphm_tpu.ops.fallback import backend_crash_error, recover_backend

    batch_fn = _batch_fn or fit_joint_batch
    single_fn = _single_fn or fit_joint
    recover_fn = _recover_fn or recover_backend

    def _recover_or_abort(e):
        """After a crash-shaped failure, re-init the backend or abort the
        whole ladder: retries into a dead backend cost ~3 min each.

        Trade-off accepted: a TRANSIENT relay outage that outlasts one
        full ``recover_backend`` ladder also aborts here, where the old
        keep-bisecting behavior might have outlived it.  The ladder is
        not a 3-minute fuse though — against a down-but-healing relay its
        probes BLOCK for up to 120 s each (5 probes + backoff ≈ 13 min of
        grace); against a genuinely dead backend the probes fail fast
        (~3 min total, the measured case).  An outage longer than the
        ladder kills the old behavior too, just ~16 doomed minutes later;
        the clear abort is the better failure."""
        if backend_crash_error(e) and not recover_fn():
            raise RuntimeError(
                "[fit_joint_batch_resilient] the TPU backend did not "
                "recover in-process after a worker crash; a fresh process "
                "is required (bisection aborted — every further retry "
                "would burn a full recovery ladder against a dead runtime)"
            ) from e
    # Host-side param snapshots: device buffers do not survive a worker
    # crash + backend re-init; numpy leaves re-upload transparently on the
    # next call (a few MB once per protocol — noise vs the fit itself).
    params_shape = jax.tree.map(np.asarray, params_shape)
    params_expr = jax.tree.map(np.asarray, params_expr)
    kw = dict(lambdas=lambdas, schedule=schedule, cfg=cfg, verbose=verbose)
    # mesh/padding hints only apply to the vmapped group fit (fit_joint is
    # per-subject and does its own granule padding)
    batch_kw = dict(kw, pad_obs_to=pad_obs_to, pad_points_to=pad_points_to)
    if mesh is not None:
        batch_kw["mesh"] = mesh
    stats = {"crashes": 0, "group_sizes": []}

    def fit_group(group, pad_s=0):
        S = len(group)
        if S == 1:
            for attempt in (0, 1):
                try:
                    le, ls, an, h = single_fn(
                        decoder_shape, params_shape, decoder_expr,
                        params_expr, group[0], **kw,
                    )
                    stats["group_sizes"].append(1)
                    return [le], [ls], [an], [h]
                except Exception as e:  # noqa: BLE001 — crash surface is opaque
                    stats["crashes"] += 1
                    if attempt:
                        raise
                    print(
                        "[fit_joint_batch_resilient] single-subject fit "
                        f"failed ({type(e).__name__}: {e}); retrying once"
                    )
                    _recover_or_abort(e)
        try:
            le, ls, an, h = batch_fn(
                decoder_shape, params_shape, decoder_expr, params_expr,
                group, pad_subjects_to=pad_s, **batch_kw,
            )
            stats["group_sizes"].append(S)
            return le, ls, an, [h]
        except Exception as e:  # noqa: BLE001
            stats["crashes"] += 1
            half = S // 2
            print(
                f"[fit_joint_batch_resilient] {S}-subject fit failed "
                f"({type(e).__name__}: {e}); bisecting to {half}+{S - half}"
            )
            _recover_or_abort(e)
            # bisected retries drop the subject padding: after a (likely
            # capacity) crash, shrinking the program is the whole point
            le1, ls1, an1, h1 = fit_group(group[:half])
            le2, ls2, an2, h2 = fit_group(group[half:])
            return le1 + le2, ls1 + ls2, an1 + an2, h1 + h2

    lat_exprs, lat_shapes, anchors_list, hists = fit_group(
        list(subjects_obs), pad_s=pad_subjects_to
    )
    history = {"histories": hists, **stats}
    return lat_exprs, lat_shapes, anchors_list, history


@functools.lru_cache(maxsize=64)
def _identity_runner(decoder_shape, cfg: FittingConfig, lam_keys):
    """Compiled identity-only fit program, cached like ``_joint_runner``."""
    nb, npp = cfg.n_obs_per_batch, cfg.n_points_per_obs
    fused_fields = _shape_fields_fn(decoder_shape, cfg)

    def loss_fn(lat_s, params_shape, padded, lens, n_obs, lam_row, clamp_j, rng):
        k1, k2 = jax.random.split(rng)
        sel = jax.random.randint(k1, (nb,), 0, n_obs)
        idx = jax.random.randint(k2, (nb, npp), 0, lens[sel][:, None])
        obs = jnp.take_along_axis(padded[sel], idx[..., None], axis=1)
        lat_b = jnp.broadcast_to(lat_s, (nb, lat_s.shape[-1]))
        if fused_fields is not None:
            sdf = fused_fields(params_shape, obs, lat_b)
        else:
            sdf, _ = decoder_shape.apply(
                params_shape, obs, lat_b, training=cfg.training_mode_shape
            )
        l = jnp.abs(sdf[..., 0])
        mask = (l < clamp_j).astype(l.dtype)
        terms = {"surface": _masked_mean(l, mask)}
        terms.update(
            _shape_regularizers(decoder_shape, lat_s, cfg.unobserved_anchors)
        )
        loss = 0.0
        for i, k in enumerate(lam_keys):
            loss = loss + lam_row[i] * terms[k]
        return loss, terms

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    adam = optax.scale_by_adam()

    def run(lat_shape, opt_state, params_shape, padded, lens, n_obs, base_key,
            lr_arr, lam_mat, clamp_arr):
        def step(carry, j):
            lat_s, o_state = carry
            rng = jax.random.fold_in(base_key, j)
            (loss, aux), g = grad_fn(
                lat_s, params_shape, padded, lens, n_obs,
                lam_mat[:, j], clamp_arr[j], rng,
            )
            upd, o_state = adam.update(g, o_state, lat_s)
            lat_s = lat_s - lr_arr[j] * upd
            aux["loss"] = loss
            hist = jnp.stack([aux[k] for k in _ID_HIST_KEYS])
            return (lat_s, o_state), hist

        with jax.default_matmul_precision(cfg.matmul_precision):
            (lat_s, _), history = jax.lax.scan(
                step, (lat_shape, opt_state), jnp.arange(lr_arr.shape[0])
            )
        return lat_s, history

    return jax.jit(run)


def fit_identity(
    decoder_shape,
    params_shape,
    all_obs: List[np.ndarray],
    lambdas: Optional[Dict[str, float]] = None,
    schedule: Optional[Dict[str, Dict[int, float]]] = None,
    cfg: FittingConfig = FittingConfig(),
    lat_shape_init: Optional[np.ndarray] = None,
    verbose: bool = True,
):
    """Identity-space-only fitting (reference fitting.py:180-285)."""
    lambdas = dict(
        lambdas
        or {
            "surface": 2.0,
            "reg_global": 0.25,
            "reg_unobserved": 10.0,
            "reg_loc": 0.05,
            "symm_dist": 5.0,
        }
    )
    cfg = _coerce_cfg(cfg)
    schedule = schedule or default_joint_schedule()
    total = cfg.total_steps
    lam_keys = tuple(sorted(lambdas))

    lr_arr = jnp.asarray(
        _scheduled_array(cfg.lr * cfg.lr_scale, schedule.get("lr", {}), total, cfg.step_scale)
    )
    lam_mat = jnp.stack(
        [
            jnp.asarray(
                _scheduled_array(
                    lambdas[k], schedule.get(k, {}), total, cfg.step_scale
                )
            )
            for k in lam_keys
        ]
    )
    clamp_arr = jnp.asarray(_clamp_array(cfg.clamp_schedule, total, cfg.step_scale))

    padded, lens = _pad_observations(all_obs)
    n_obs = len(all_obs)
    o_pad = -(-n_obs // 8) * 8
    p_pad = -(-padded.shape[1] // 512) * 512
    padded = jnp.pad(padded, ((0, o_pad - n_obs), (0, p_pad - padded.shape[1]), (0, 0)))
    lens = jnp.pad(lens, (0, o_pad - n_obs), constant_values=1)
    lat_shape = (
        jnp.zeros((1, decoder_shape.lat_dim), jnp.float32)
        if lat_shape_init is None
        else jnp.asarray(lat_shape_init, jnp.float32).reshape(1, -1)
    )
    adam = optax.scale_by_adam()
    opt_state = adam.init(lat_shape)
    base_key = jax.random.PRNGKey(cfg.seed)

    # identity-only fits have no Broyden search — even the NPM family's
    # 1024-wide net runs ms-scale steps, so the single-scan program is fine
    ((lat_shape, hist)), elapsed = _run_with_xla_fallback(
        lambda c: _identity_runner(decoder_shape, c, lam_keys),
        cfg, decoder_shape,
        lambda run_fn: run_fn(
            lat_shape, opt_state, params_shape, padded, lens, n_obs,
            base_key, lr_arr, lam_mat, clamp_arr,
        ),
        "fit_identity", shapes=(o_pad, p_pad),
    )
    history = {k: hist[:, i] for i, k in enumerate(_ID_HIST_KEYS)}
    if verbose:
        print(f"[fit_identity] {total} steps in {elapsed:.1f}s "
              f"({total / max(elapsed, 1e-9):.1f} it/s), "
              f"final loss {history['loss'][-1]:.6f}")
    _, anchors = decoder_shape.apply(
        params_shape, jnp.zeros((1, 1, 3)), lat_shape, training=False
    )
    history["elapsed_s"] = elapsed
    return np.asarray(lat_shape), (
        None if anchors is None else np.asarray(anchors)
    ), history
