#!/usr/bin/env python
"""Roofline probe for the fused extraction kernel (VERDICT r3 item 6).

The res-256 extraction headline has sat at ~14.2M queries/s for three
rounds with no statement of WHERE that sits against the hardware bound.
This probe measures, on the real chip at production dims:

  1. kernel wall-clock at the production setting (brick tiles, member
     culling) and at cull_eps=0 (every member evaluated),
  2. the EXACT per-(tile, member) active fraction (replicating the
     kernel's box-distance predicate on the host), so useful-FLOP rates
     are computed from the work actually executed, not the dense count,
  3. derived rates: useful TFLOP/s, MXU-padded TFLOP/s (the [200,200]
     matmuls pad to 128-multiples: x(256/200)^2 = 1.64), queries/s,
     and the per-grid-step overhead implied by the fully-culled tiles.

Writes one JSON line; run on the real TPU (relay caveats in
.claude/skills/verify/SKILL.md: times are device-side, forced by a
scalar np.asarray pull of a device-side sum).
"""

import json
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from nphm_tpu.models import NPHMConfig, make_nphm_decoder
from nphm_tpu.ops.pallas_ensemble import (
    CULL_EPS,
    DEFAULT_GROUP,
    DEFAULT_TILE,
    _brick_points,
    _brick_shape,
    nphm_grid_sdf_pallas,
    prepare_pallas_operands,
)

GRID_MIN = (-0.55, -0.5, -0.95)
GRID_MAX = (0.55, 0.75, 0.4)
RES = 256


def time_grid(params, cfg, lat, **kw):
    @jax.jit
    def run():
        return jnp.sum(
            nphm_grid_sdf_pallas(
                params, cfg, lat, GRID_MIN, GRID_MAX, RES, **kw
            )
        )

    np.asarray(run())  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    out = {"res": RES, "tile": DEFAULT_TILE, "group": DEFAULT_GROUP}
    cfg = NPHMConfig()
    from nphm_tpu import env_paths
    if os.path.exists(env_paths.ANCHOR_MEAN_PATH):
        mean_anchors = np.load(env_paths.ANCHOR_MEAN_PATH)
    else:
        # same fabrication as data/dummy.py: 39 directions scaled into the
        # face region — culling geometry representative of the real layout
        rng = np.random.default_rng(0)
        mean_anchors = rng.normal(size=(39, 3))
        mean_anchors /= np.linalg.norm(mean_anchors, axis=-1, keepdims=True)
        mean_anchors *= 0.4
    dec = make_nphm_decoder(cfg, mean_anchors.astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0))
    lat = (
        jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1
    )

    # --- exact active fraction (host replica of the kernel's predicate) ---
    _, anchors = jax.jit(
        lambda p, l: (0, prepare_pallas_operands(p, cfg, l)[1])
    )(params, lat)
    anchors = np.asarray(anchors)
    tile = DEFAULT_TILE
    brick = _brick_shape(RES, tile)
    axes = [np.linspace(GRID_MIN[i], GRID_MAX[i], RES) for i in range(3)]
    n = RES**3
    lin = np.arange(n, dtype=np.int64)
    pts = np.asarray(
        _brick_points([jnp.asarray(a) for a in axes], jnp.asarray(lin),
                      RES, brick, tile)
    )
    pts_t = pts.reshape(n // tile, tile, 3)
    lo, hi = pts_t.min(axis=1), pts_t.max(axis=1)
    clipped = np.clip(anchors[None], lo[:, None], hi[:, None])
    box_d2 = ((anchors[None] - clipped) ** 2).sum(-1)  # [tiles, K]
    cull_r2 = np.log(1.0 / CULL_EPS) * cfg.blend_var
    active = box_d2 < cull_r2  # [tiles, K]
    n_tiles = active.shape[0]
    out["n_tiles"] = int(n_tiles)
    out["active_member_frac"] = round(float(active.mean()), 4)
    out["frac_tiles_all_culled"] = round(
        float((~active.any(axis=1)).mean()), 4
    )
    # group-level activity: a group runs its @pl.when per member, but the
    # grid STEP (incl. its weight-block DMA) happens for every (tile, group)
    Kp = -(-cfg.n_loc // DEFAULT_GROUP) * DEFAULT_GROUP
    act_pad = np.concatenate(
        [active, np.zeros((n_tiles, Kp - cfg.n_loc), bool)], axis=1
    )
    group_any = act_pad.reshape(n_tiles, -1, DEFAULT_GROUP).any(-1)
    out["active_group_frac"] = round(float(group_any.mean()), 4)

    # --- timings -----------------------------------------------------------
    t_cull = time_grid(params, cfg, lat)
    out["t_culled_s"] = round(t_cull, 4)
    t_dense = time_grid(params, cfg, lat, cull_eps=0.0)
    out["t_dense_s"] = round(t_dense, 4)

    # --- derived rates -----------------------------------------------------
    # FLOPs from the kernel's ACTUAL per-point data flow (pallas_ensemble
    # _make_kernel), not the logical layer shapes: latent conditioning is
    # folded into per-member biases at prepare time, so layer 0 and the
    # skip layer touch only the 3 spatial inputs per point (VPU outer
    # products), the last layer is a VPU column-reduce, and only the
    # hidden-to-hidden contractions hit the MXU.
    shapes, skip_in = cfg.layer_shapes
    n_layers = len(shapes)
    ds = cfg.input_dim
    vpu_pp = 0  # per point per member, f32 VPU flops
    mxu_pp = 0  # per point per member, useful MXU flops
    mxu_pad_pp = 0  # same, with both matmul dims padded to 128 multiples
    r128 = lambda d: -(-d // 128) * 128
    for i, (s_in, s_out) in enumerate(shapes):
        if i == 0:
            vpu_pp += 2 * ds * s_out  # point_matmul(w0p)
        elif i == n_layers - 1:
            vpu_pp += 2 * s_in * s_out  # column reduce, out_dim=1
        elif i == skip_in:
            h = s_in - cfg.d_in  # hidden part of the concat input
            mxu_pp += 2 * h * s_out
            mxu_pad_pp += 2 * r128(h) * r128(s_out)
            vpu_pp += 2 * ds * s_out  # point_matmul(wsp)
        else:
            mxu_pp += 2 * s_in * s_out
            mxu_pad_pp += 2 * r128(s_in) * r128(s_out)
    # blend: dist2 (9) + sqrt/exp (~2) + accum (4) per point per member;
    # activations: softplus100 on every hidden unit (transcendental-bound,
    # counted separately — relu-vs-softplus already measured a dead end)
    vpu_pp += 13
    n_act = sum(o for _, o in shapes[:-1])
    out["flops_pp_vpu"] = vpu_pp
    out["flops_pp_mxu"] = mxu_pp
    out["flops_pp_mxu_padded"] = mxu_pad_pp
    out["activations_pp"] = n_act
    n_active_pts = float(active.sum()) * tile  # point-member pairs
    out["qps_culled_M"] = round(n / t_cull / 1e6, 2)
    out["qps_dense_M"] = round(n / t_dense / 1e6, 2)
    for tag, t_s, pairs in (
        ("culled", t_cull, n_active_pts),
        ("dense", t_dense, float(cfg.n_loc) * n),
    ):
        out[f"tflops_useful_{tag}"] = round(
            (mxu_pp + vpu_pp) * pairs / t_s / 1e12, 2
        )
        out[f"tflops_mxu_{tag}"] = round(mxu_pp * pairs / t_s / 1e12, 2)
        out[f"tflops_mxu_padded_{tag}"] = round(
            mxu_pad_pp * pairs / t_s / 1e12, 2
        )
    # v5e MXU peaks: 197 TFLOP/s bf16; f32 operands execute as 3-pass
    # bf16x3 (~65.7) — the kernel keeps f32 operands (bf16 measured dead
    # end), so the honest ceiling for its matmul work is the bf16x3 figure
    out["peak_tflops_bf16"] = 197.0
    out["peak_tflops_f32_3pass"] = round(197.0 / 3, 1)
    out["pct_of_f32_mxu_peak_culled"] = round(
        100.0 * out["tflops_mxu_padded_culled"] / (197.0 / 3), 1
    )
    # per-(tile,group) grid-step cost implied if compute were free on
    # all-culled steps: dense-vs-culled time difference per extra active work
    steps_total = n_tiles * (Kp // DEFAULT_GROUP)
    out["grid_steps"] = int(steps_total)
    out["us_per_grid_step_culled"] = round(t_cull / steps_total * 1e6, 3)
    # weight bytes re-streamed per (tile, group) step (BlockSpec fetches
    # happen whether or not the member is culled)
    w_bytes_pm = 4 * (
        sum(i * o for i, o in shapes) + sum(o for _, o in shapes) + 3
    )
    out["weight_mb_per_tile"] = round(Kp * w_bytes_pm / 1e6, 2)
    out["weight_gb_total"] = round(n_tiles * Kp * w_bytes_pm / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
