"""Fused Pallas TPU kernel for the Broyden correspondence search (hot loop #3).

The joint fit's per-step cost is dominated by the SEQUENTIAL Broyden
root-find: 1 residual + ``broyden_warm_steps`` iterations, each one
deformation-trunk forward at ~5000 points (reference
``src/NPHM/models/iterative_root_finding.py:30-69`` drives the same chain
with torch index mutation).  On the XLA path every trunk layer round-trips
``[N, hidden]`` activations through HBM and the per-point secant algebra
(3x3 matvecs, rank-1 updates, norm masks) runs as dozens of small fusions
BETWEEN the matmul layers — the chain is latency/bandwidth-bound, not
MXU-bound (bf16 operands were measured a ~4% end-to-end no-op).

This kernel runs the ENTIRE search — residual init + all iterations — in
one ``pallas_call``: trunk weights and activations stay VMEM-resident and
the per-point state (x, g(x), J^-1, best iterate) is carried through an
in-kernel ``lax.while_loop`` as ONE ``[24, TILE]`` lane-major f32 vector
(24 = 3x8 sublanes; Mosaic's while-carry layout inference requires it).
Every (obs, point) pair is a LANE on one flat axis — per-obs conditioning
travels as per-point bias columns, not a grid dimension — so each matmul
in the chain is ``[H, H] x [H, TILE]`` at full MXU width, and matmuls run
at ``Precision.HIGHEST`` (f32): Mosaic's bf16 default stalls residuals
around 1e-4, under the 1e-6 convergence threshold (measured, -29%
n_valid).

Scope / contract:

- **Forward-only.**  The search result is consumed under ``stop_gradient``;
  gradients attach at the root via the IFT correction
  (``fitting/broyden.py:ift_correction``, reference ``fitting.py:98-107``),
  so no custom VJP is needed.  The caller stop-gradients every input.
- **Generic over any DeepSDF-style trunk** (``models/deepsdf.py:_trunk``)
  with row-constant conditioning and raw-xyz spatial input: the cond
  columns of layer 0 and of the skip layer are folded into per-row biases
  OUTSIDE the kernel (the same folding the trunk itself performs), so the
  kernel sees only the ``input_dim==3`` spatial columns.
- **Per-tile early exit.**  The while condition is ``any(active)`` over the
  TILE — a strict refinement of the reference's global ``any(active)``
  (iterative_root_finding.py:39): every point iterates until it converges,
  diverges, or the budget ends in BOTH versions (inactive points are
  masked no-ops); the per-tile exit only skips whole-tile no-op
  iterations, which the global condition cannot (one straggler anywhere
  keeps the global loop alive — measured in PROTOCOL_r03_diag).
- The iteration budget is a RUNTIME scalar (SMEM), so the warm fit loop's
  ``where(step==0, 15, warm_steps)`` budget needs one compiled kernel.

Parity: ``tests/test_pallas_search.py`` (interpret mode) vs the XLA path
``fitting/broyden.py:search``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nphm_tpu.models.deepsdf import DeepSDFConfig

SQRT2 = 1.4142135623730951
DEFAULT_TILE = 1024


def _op_layout(tcfg: DeepSDFConfig):
    """(layer, role) list for the flat operand tuple."""
    shapes, skip_in = tcfg.layer_shapes
    L = len(shapes)
    layout = []
    for i in range(L):
        if i == 0:
            layout += [(i, "wp0"), (i, "bias0")]
        elif i == skip_in:
            layout += [(i, "whS"), (i, "wpS"), (i, "biasS")]
        elif i == L - 1:
            layout += [(i, "wlast"), (i, "blast")]
        else:
            layout += [(i, "wh"), (i, "b")]
    return layout


def prepare_search_operands(params_trunk, tcfg: DeepSDFConfig, cond):
    """Kernel-ready trunk operands with conditioning folded per row (XLA).

    cond: [B, lat_dim] row-constant trunk conditioning (eval mode).
    Mirrors the splits of models/deepsdf.py:_trunk exactly: layer 0 and the
    skip layer keep only their ``d_in_spatial`` point columns; the cond
    columns become per-row biases; the skip's 1/sqrt(2) is pre-scaled into
    its weights/bias so the kernel adds three plain terms.
    """
    shapes, skip_in = tcfg.layer_shapes
    L = len(shapes)
    ds = tcfg.d_in_spatial
    layers = params_trunk["layers"]
    ops = []
    for i in range(L):
        w, b = layers[i]["w"], layers[i]["b"]  # [out, in], [out]
        if i == 0:
            bias0 = jnp.einsum("bc,oc->bo", cond, w[:, ds:]) + b
            ops += [w[:, :ds], bias0]  # [H, 3], [B, H]
        elif i == skip_in:
            h = w.shape[1] - tcfg.d_in
            biasS = (
                jnp.einsum("bc,oc->bo", cond, w[:, h + ds :]) / SQRT2 + b
            )
            ops += [w[:, :h] / SQRT2, w[:, h : h + ds] / SQRT2, biasS]
        elif i == L - 1:
            ops += [jnp.swapaxes(w, 0, 1), b[:, None]]  # [in, out], [out, 1]
        else:
            ops += [w, b[:, None]]
    return tuple(ops)


def _softplus(x, beta):
    bx = beta * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)


def _pmm(wp, raw):
    """[H, 3] x [3, T] as three VPU outer products (K=3 would waste the MXU)."""
    acc = wp[:, 0:1] * raw[0:1, :]
    for i in range(1, raw.shape[0]):
        acc += wp[:, i : i + 1] * raw[i : i + 1, :]
    return acc


def _dot(w, x):
    # HIGHEST: full f32 matmul passes.  Mosaic's default drops f32 dots to
    # bf16 — measured on hardware: residuals then stall around ~1e-4 and
    # n_valid (converged-below-1e-6 roots) falls 29% vs the XLA search.
    return jnp.dot(
        w, x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _matvec3(j9, v):
    """out_i = sum_j J[3i+j] * v_j for j9 [9, T], v [3, T]."""
    rows = []
    for i in range(3):
        acc = j9[3 * i : 3 * i + 1] * v[0:1]
        acc += j9[3 * i + 1 : 3 * i + 2] * v[1:2]
        acc += j9[3 * i + 2 : 3 * i + 3] * v[2:3]
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _vecmat3(v, j9):
    """out_j = sum_i v_i * J[3i+j]."""
    rows = []
    for j in range(3):
        acc = v[0:1] * j9[j : j + 1]
        acc += v[1:2] * j9[3 + j : 4 + j]
        acc += v[2:3] * j9[6 + j : 7 + j]
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _make_search_kernel(tcfg: DeepSDFConfig, tile: int, n_real: int,
                        n_pad: int, cvg: float, dvg: float, eps: float):
    shapes, skip_in = tcfg.layer_shapes
    L = len(shapes)
    beta = tcfg.beta
    layout = _op_layout(tcfg)
    n_ops = len(layout)

    def kernel(niter_ref, *refs):
        op_refs = refs[:n_ops]
        obs_ref, x0_ref, j0_ref = refs[n_ops : n_ops + 3]
        xb_ref, bn_ref, ji_ref, act_ref, it_ref = refs[n_ops + 3 :]
        op = {}
        for (i, role), ref in zip(layout, op_refs):
            # per-obs biases arrive as [H, 128] lane-broadcast panels (see
            # the block-spec note in broyden_search_pallas); one column is
            # the whole bias
            if role in ("bias0", "biasS"):
                op[(i, role)] = ref[:, 0:1]
            else:
                op[(i, role)] = ref[:]
        obs = obs_ref[:]  # [3, T]

        def fwd(x):
            """g(x) = x + trunk(x) - obs, activations VMEM-resident."""
            h = None
            for i in range(L - 1):
                if i == 0:
                    z = _pmm(op[(0, "wp0")], x) + op[(0, "bias0")]
                elif i == skip_in:
                    z = (
                        _dot(op[(i, "whS")], h)
                        + _pmm(op[(i, "wpS")], x)
                        + op[(i, "biasS")]
                    )
                else:
                    z = _dot(op[(i, "wh")], h) + op[(i, "b")]
                h = _softplus(z, beta) if beta > 0 else jnp.maximum(z, 0.0)
            wl = op[(L - 1, "wlast")]  # [H, out]
            bl = op[(L - 1, "blast")]  # [out, 1]
            rows = [
                jnp.sum(h * wl[:, o : o + 1], axis=0, keepdims=True) + bl[o, 0]
                for o in range(3)
            ]
            return x + jnp.concatenate(rows, axis=0) - obs

        x0 = x0_ref[:]
        j0 = j0_ref[:]
        gx0 = fwd(x0)
        upd0 = -_matvec3(j0, gx0)
        bn0 = jnp.sqrt(jnp.sum(gx0 * gx0, axis=0, keepdims=True))
        # tile-padding points must never count as active: they would hold
        # the per-tile early exit open for the whole budget (and a frozen
        # pad point's recomputed activity test could re-arm them).  Padding
        # is per-obs (each obs occupies n_pad lanes, n_real of them live).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        inb = (pl.program_id(0) * tile + lane) % n_pad < n_real
        niter = niter_ref[0, 0]

        # All per-point state rides ONE [24, tile] f32 carry (24 = 3x8
        # sublanes): Mosaic's while-loop layout inference chokes on many
        # small odd-row carries (3/9/1-row vectors + i1 masks yield mixed
        # (4,128)/(8,128)/replicated layouts at the scf.yield).  Rows:
        # 0-2 x, 3-5 g(x), 6-8 update, 9-17 J^-1, 18-20 x_best,
        # 21 best_norm, 22 active flag (f32 0/1), 23 pad.
        zrow = jnp.zeros((1, tile), jnp.float32)
        s0 = jnp.concatenate(
            [x0, gx0, upd0, j0, x0, bn0, inb.astype(jnp.float32), zrow],
            axis=0,
        )

        def cond(s):
            it, st = s
            return jnp.logical_and(it < niter, jnp.any(st[22:23] > 0.5))

        def body(s):
            it, st = s
            x, gx, upd = st[0:3], st[3:6], st[6:9]
            j9, xb, bn = st[9:18], st[18:21], st[21:22]
            act = st[22:23] > 0.5
            dx = jnp.where(act, upd, 0.0)
            x2 = x + dx
            gxn = fwd(x2)
            dg = jnp.where(act, gxn - gx, 0.0)
            gx2 = gx + dg
            n2 = jnp.sqrt(jnp.sum(gx2 * gx2, axis=0, keepdims=True))
            better = n2 < bn
            bn2 = jnp.where(better, n2, bn)
            xb2 = jnp.where(better, x2, xb)
            act2 = jnp.logical_and(inb, jnp.logical_and(bn2 > cvg, n2 < dvg))
            # good-Broyden rank-1 update of J^-1
            vT = _vecmat3(dx, j9)
            a = dx - _matvec3(j9, dg)
            den = jnp.sum(vT * dg, axis=0, keepdims=True)
            den = jnp.where(den >= 0, den + eps, den - eps)
            u = a / den
            outer = jnp.concatenate(
                [u[i : i + 1] * vT[j : j + 1] for i in range(3) for j in range(3)],
                axis=0,
            )
            j2 = j9 + jnp.where(act, outer, 0.0)
            upd2 = -_matvec3(j2, gx2)
            st2 = jnp.concatenate(
                [x2, gx2, upd2, j2, xb2, bn2, act2.astype(jnp.float32), zrow],
                axis=0,
            )
            return (it + 1, st2)

        it, st = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), s0)
        )
        xb_ref[:] = st[18:21]
        bn_ref[:] = st[21:22]
        ji_ref[:] = st[9:18]
        act_ref[:] = st[22:23]
        # whole-array SMEM accumulator (Mosaic requires full blocks in SMEM);
        # each sequential grid step writes its own cell
        it_ref[0, pl.program_id(0)] = it

    return kernel


def broyden_search_pallas(
    params_trunk,
    tcfg: DeepSDFConfig,
    cond,
    obs,
    xc_init,
    j_inv_init,
    n_iters,
    *,
    cvg_thresh: float = 1e-6,
    dvg_thresh: float = 0.2,
    eps: float = 1e-6,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Run the full Broyden search fused on device.

    params_trunk: DeepSDF trunk params ({"layers": [...]}).
    cond: [B, tcfg.lat_dim] row-constant conditioning (eval mode).
    obs / xc_init: [B, N, 3]; j_inv_init: [B, N, 3, 3].
    n_iters: scalar iteration budget (may be traced — runtime SMEM value).

    Returns dict(result [B,N,3], diff [B,N], valid_ids [B,N] bool,
    j_inv [B,N,3,3], active [B,N] bool, iters scalar int32) matching
    ``fitting.broyden.broyden``'s contract (search-level reshaping /
    diverged-reset is the caller's job, as on the XLA path).
    """
    if tcfg.d_in_spatial != 3:
        raise ValueError("fused search needs a raw-xyz trunk (no freq bands)")
    sg = jax.lax.stop_gradient
    B, N, _ = obs.shape
    # ONE flat point axis: every (obs, point) pair becomes a lane, so each
    # grid instance's matmuls are [H, H] x [H, tile] regardless of how the
    # caller batched the observations.  (The first cut gridded
    # (B, tiles-of-N): 10 instances of [H, 512] matmuls were overhead-bound
    # and only ~7% faster end-to-end than XLA.)  Each obs is padded to a
    # tile multiple so every tile belongs to exactly ONE obs and the
    # per-obs conditioning biases ride the INDEX MAP as [H, 1] columns —
    # materializing them as [H, P] per-point columns instead blows the
    # ~16 MB scoped-VMEM stack limit (measured: 34.95M requested at
    # production dims, HTTP 500 from the AOT compiler).
    Np = -(-N // tile) * tile  # padded points per obs
    tpo = Np // tile  # tiles per obs
    n_t = B * tpo
    P = n_t * tile

    def prep(p, k):  # [B, N, k] -> [k, B*Np], lane-major, per-obs padded
        p = jnp.pad(sg(p), ((0, 0), (0, Np - N), (0, 0)))
        return p.reshape(P, k).T

    obs_t = prep(obs, 3)
    x0_t = prep(xc_init, 3)
    j0_t = prep(j_inv_init.reshape(B, N, 9), 9)
    ops = jax.tree_util.tree_map(sg, prepare_search_operands(
        params_trunk, tcfg, sg(cond)
    ))
    layout = _op_layout(tcfg)
    # Per-obs biases [B, H] -> per-TILE 128-lane broadcast panels
    # [H, n_t * 128].  Mosaic's lowering requires the last block dim to be
    # a multiple of 128 OR the full array dim, so the obvious per-obs
    # [H, 1] column block over [H, B] is NOT lowerable for B > 1 — exactly
    # the r04 driver-bench failure (interpret-mode tests don't check block
    # shapes; tests/test_pallas_lowering.py asserts the Mosaic rule on
    # every spec).  Each tile's panel repeats its obs's bias across 128
    # lanes; the kernel reads column 0.  Cost: n_t*128*H*4 bytes of HBM
    # (~1.3 MB at production fit dims) staged once per kernel invocation.
    obs_of_tile = np.asarray(np.arange(n_t) // tpo)

    def _bias_panels(arr_bh):  # [B, H] -> [H, n_t * 128]
        cols = arr_bh.T[:, obs_of_tile]  # [H, n_t]
        return jnp.broadcast_to(
            cols[:, :, None], cols.shape + (128,)
        ).reshape(cols.shape[0], n_t * 128)

    ops = tuple(
        _bias_panels(arr) if role in ("bias0", "biasS") else arr
        for (_, role), arr in zip(layout, ops)
    )

    op_specs = []
    for (_, role), arr in zip(layout, ops):
        if role in ("bias0", "biasS"):  # [H, n_t*128]: this tile's panel
            op_specs.append(
                pl.BlockSpec(
                    (arr.shape[0], 128),
                    lambda t: (0, t),
                    memory_space=pltpu.VMEM,
                )
            )
        else:  # constant across the grid: fetched once, kept resident
            op_specs.append(
                pl.BlockSpec(
                    arr.shape,
                    lambda t, nd=arr.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
            )

    pt_spec = lambda k: pl.BlockSpec(  # noqa: E731
        (k, tile), lambda t: (0, t), memory_space=pltpu.VMEM
    )
    kernel = _make_search_kernel(
        tcfg, tile, N, Np, cvg_thresh, dvg_thresh, eps
    )
    niter_arr = jnp.asarray(n_iters, jnp.int32).reshape(1, 1)

    xb, bn, j9, act, iters = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            *op_specs,
            pt_spec(3), pt_spec(3), pt_spec(9),
        ],
        out_specs=[
            pt_spec(3),
            pt_spec(1),
            pt_spec(9),
            pt_spec(1),
            pl.BlockSpec(
                (1, n_t), lambda t: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, P), jnp.float32),
            jax.ShapeDtypeStruct((1, P), jnp.float32),
            jax.ShapeDtypeStruct((9, P), jnp.float32),
            jax.ShapeDtypeStruct((1, P), jnp.float32),
            jax.ShapeDtypeStruct((1, n_t), jnp.int32),
        ],
        # The resident trunk weights + per-iteration activations at
        # tile=1024 need ~24 MB of scoped VMEM at production dims — over
        # Mosaic's conservative 16 MB default but well inside the chip's
        # physical VMEM (128 MB on v5e).  Without this the r05 bench-dims
        # program died at AOT compile with "Ran out of memory in memory
        # space vmem ... 24.35M and limit 16.00M".
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(niter_arr, *ops, obs_t, x0_t, j0_t)

    def unprep(p, k):  # [k, B*Np] -> [B, N, k]
        return p.T.reshape(B, Np, k)[:, :N]

    diff = bn[0].reshape(B, Np)[:, :N]
    return {
        "result": unprep(xb, 3),
        "diff": diff,
        "valid_ids": diff < cvg_thresh,
        "j_inv": unprep(j9, 9).reshape(B, N, 3, 3),
        "active": act[0].reshape(B, Np)[:, :N] > 0.5,
        # executed iterations: max over tiles == what the global any(active)
        # condition would have executed (the slowest tile's straggler)
        "iters": jnp.max(iters),
    }


def search_pallas(
    decoder_expr,
    params_expr,
    obs,
    cond_lat,
    anchors,
    *,
    max_steps,
    cvg_thresh: float = 1e-6,
    dvg_thresh: float = 0.2,
    xc_init,
    j_inv_init,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Drop-in for ``fitting.broyden.search`` on the fused path.

    Same arguments/returns as ``search`` (cond_lat = its ``cond``:
    [B, lat_shape_full + lat_expr]); requires explicit warm inits
    (``xc_init`` + ``j_inv_init``) — the autograd-Jacobian cold init stays
    on the XLA path.  Gate callers with :func:`search_fusable`.
    """
    from nphm_tpu.models.deformation import _conditioning

    if decoder_expr.kind == "deformation_npm":
        # NPM family (config.py:87-112): the trunk IS the decoder — a plain
        # DeepSDF over [z_id, z_ex] with no conditioning head
        tcfg, cond, trunk = decoder_expr.cfg, cond_lat, params_expr
    else:
        dcfg = decoder_expr.cfg
        cond = _conditioning(
            params_expr, dcfg, cond_lat, anchors, training=False, rng=None
        )
        tcfg, trunk = dcfg.trunk_cfg, params_expr["trunk"]
    res = broyden_search_pallas(
        trunk, tcfg, cond, obs, xc_init, j_inv_init,
        max_steps, cvg_thresh=cvg_thresh, dvg_thresh=dvg_thresh, tile=tile,
        interpret=interpret,
    )
    # diverged points reset to identity exactly as search() does
    # (fitting/broyden.py:226-235): final-state deactivated AND not valid
    diverged = jnp.logical_and(~res["active"], ~res["valid_ids"])
    eye = jnp.eye(3, dtype=res["j_inv"].dtype)
    j_inv_out = jnp.where(diverged[..., None, None], eye, res["j_inv"])
    xc = res["result"]
    return xc, {
        "result": xc,
        "diff": res["diff"].reshape(-1),
        "valid_ids": res["valid_ids"],
        "j_inv": j_inv_out,
        "iters": res["iters"],
    }


@functools.lru_cache(maxsize=None)
def _search_trunk_cfg(decoder_expr):
    """The DeepSDF trunk config the fused search would run, or None."""
    kind = getattr(decoder_expr, "kind", None)
    if kind == "deformation_npm":
        tcfg = decoder_expr.cfg
    elif kind == "deformation":
        dcfg = decoder_expr.cfg
        if dcfg.mode == "interpolate":
            return None
        tcfg = dcfg.trunk_cfg
    else:
        return None
    if tcfg.d_in_spatial != 3 or tcfg.out_dim < 3:
        return None
    return tcfg


def search_fusable(decoder_expr) -> bool:
    """Is this expression decoder's search kernel-eligible?

    Needs a DeepSDF trunk over raw xyz with row-constant conditioning
    (every DeformationConfig mode except the per-point 'interpolate', plus
    the NPM family's bare-DeepSDF offsets net) and a >=3-d offset head.
    Eligibility only — whether the kernel FITS is `search_vmem_estimate`.
    """
    return _search_trunk_cfg(decoder_expr) is not None


def search_vmem_estimate(decoder_expr, tile: int = DEFAULT_TILE) -> int:
    """Rough scoped-VMEM bytes the fused search kernel needs: the resident
    trunk weights plus the per-iteration activation/state buffers.

    The kernel keeps EVERY trunk weight VMEM-resident for the whole search
    (that is the point: zero HBM traffic per Broyden iteration).  The NPHM
    deformation trunk (8 x 512) needs ~24 MB total and compiles inside the
    64 MB vmem_limit_bytes; the NPM family's 8 x 1024 offsets net needs
    ~28 MB of weights + ~4 MB per [H, tile] activation buffer and FAILS to
    compile at production dims (measured r05: `npm_fit_ab.py` — every NPM
    fit fell back to the XLA search).  `_use_fused_search`'s "auto" mode
    gates on this estimate so oversized trunks skip the doomed compile
    instead of paying one per process; `fused_search="on"` still forces a
    try (the staged fallback in inference.py catches genuine failures).
    """
    tcfg = _search_trunk_cfg(decoder_expr)
    if tcfg is None:
        return 0
    shapes, _ = tcfg.layer_shapes
    weight_floats = sum(int(np.prod(s)) for s in shapes)
    # fwd keeps ~4 live [H, tile] buffers (x, h, skip stash, residual) plus
    # the [3/9, tile] point-state registers; be conservative.
    act_floats = 5 * tcfg.hidden_dim * tile
    return 4 * (weight_floats + act_floats)
