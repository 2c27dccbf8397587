"""Fused Pallas TPU kernels for NPHM ensemble *training* (hot loop #1).

SURVEY.md section 3 ranks the identity train step (ensemble forward + eikonal
double backprop, reference ``src/NPHM/models/EnsembledDeepSDF.py:37-55`` +
``diff_operators.py:69-79``) as the top compute sink: 30k epochs of it
dominate stage-1 training.  The pure-XLA step is HBM-bound — every layer
round-trips ``[members, B*N, hidden]`` activations through HBM (measured
~3-4 TFLOP/s on a v5e).  These kernels keep all activations in VMEM.

Design (two kernels wrapped in one ``jax.custom_vjp``):

- The differentiation boundary is the **per-member field**: the raw SDF
  ``F_a`` and its spatial gradient ``G_a = dF_a/dcoords`` for each of the 40
  local MLPs, with the latent conditioning folded into per-(member, row)
  biases and the symmetric weight sharing / x-mirroring expanded OUTSIDE the
  kernel by XLA gathers (whose autodiff handles pair-summing and sign
  flips).  Gaussian blending stays in XLA, where plain autodiff provides all
  blend-weight derivatives — including their second-order terms.
- **Forward kernel**: primal MLP sweep + an in-kernel reverse sweep for G
  (the output is scalar per point, so the full spatial gradient costs one
  extra matmul chain, not three).
- **Backward kernel** (the custom VJP — i.e. the double backprop): given
  cotangents ``(u, V)`` of ``(F, G)``, it evaluates

      phi = <u, F> + <V, G> = <u, F> + JVP(F; V)

  and reverse-sweeps ``phi`` through the coupled primal+tangent chains:
  grad-of-grad reduces to one tangent forward (softplus' coefficients, one
  tangent column because V seeds it) and one reverse pass with softplus''
  cross terms — all dense ``[H, H] x [H, T]`` MXU matmuls with activations
  resident in VMEM.  Weight/bias gradients accumulate across point tiles in
  revisited output blocks (members iterate on the outer grid axis so each
  accumulator stays in VMEM for its whole sweep).
- **Member culling** (optional): blend weights decay as ``exp(-d^2/var)``,
  so a member whose anchor is farther than ``sqrt(ln(1/eps)*var)`` from
  every point of a tile contributes ``< eps`` relative weight.  Points are
  pre-sorted per batch row by Morton code (making tiles spatially compact)
  and a per-(member, tile) box-distance predicate — computed in XLA, read
  as an SMEM scalar — skips the member's whole tile, forward and backward
  consistently.  The background member is never culled.

Parity: ``tests/test_pallas_train.py`` checks member fields, blended
(sdf, spatial grad), and full loss *gradients* (the grad-of-grad path) vs.
the XLA decoder (``models/ensemble.py``) in interpret mode.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nphm_tpu.models.ensemble import NPHMConfig, _split_cond, predict_anchors
from nphm_tpu.utils.math import safe_l2norm

SQRT2 = 1.4142135623730951
DEFAULT_TILE = 512
# Member culling is OFF by default for training.  Measured on a v5e at the
# production batch (B=32, N=1693/row): fusion alone gives 51 ms/step vs
# 323 ms XLA (6.3x) and is EXACT (loss delta 2e-6); cull_eps=1e-10 only
# reaches 47 ms (+7%) but perturbs the loss by ~2e-2 — far points blend
# with the 1e-6 normalizer floor, so a culled member's weight*|F| error is
# amplified by ~1e6 and local MLPs extrapolate to |F| ~ 5-10 out there
# (w*|F|/1e-6 ~ 39e-10*10e6 ~ 4e-3 relative on exactly the points the
# exp(-10|sdf|) repulsion term reads).  Culling remains available for
# experiments; parity tests cover eps>0 at interpret precision.
CULL_EPS_TRAIN = 0.0


@dataclasses.dataclass(frozen=True)
class _Spec:
    """Static kernel configuration (hashable; nondiff arg of the custom VJP)."""

    cfg: NPHMConfig
    tile: int
    tpr: int  # tiles per batch row (rows are padded to tile multiples)
    cull_eps: float
    interpret: bool


def _op_layout(cfg: NPHMConfig):
    """Flat operand layout shared by prepare/fwd/bwd.

    Returns a list of (layer, role) for the flat ops tuple; roles are
    'wp0', 'bias0', 'whS', 'whST', 'wpS', 'biasS', 'wh', 'whT', 'b',
    'wlast'.  Transposed copies exist so the kernels' reverse sweeps read
    weights in their natural [in, out] orientation (no in-kernel
    relayouts); their VJP cotangents are zero — the full gradient rides on
    the untransposed operand, and the XLA-side chain (both derived from the
    same parameter) sums to the correct total.
    """
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    layout = []
    for i in range(L):
        if i == 0:
            layout += [(i, "wp0"), (i, "bias0")]
        elif i == skip_in:
            layout += [(i, "whS"), (i, "whST"), (i, "wpS"), (i, "biasS")]
        elif i == L - 1:
            layout += [(i, "wlast")]
        else:
            layout += [(i, "wh"), (i, "whT"), (i, "b")]
    return layout


def prepare_train_operands(params, cfg: NPHMConfig, lat):
    """Kernel-ready per-member operands with conditioning folded per row.

    lat: [B, lat_dim].  All XLA, differentiable; symmetric weight sharing is
    expanded by gather (autodiff scatter-adds pair gradients back onto the
    distinct storage, reproducing the reference repeat_interleave semantics,
    EnsembledDeepSDF.py:43-45).  Mirroring is NOT folded here — it lives in
    the coords construction (see apply_nphm_train_pallas).

    Returns (ops tuple per _op_layout, last_bias [A, out]).
    """
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    ds = cfg.input_dim
    member_map = jnp.asarray(cfg.member_map)
    cond = _split_cond(cfg, lat)  # [B, A, C]

    def expand(t):
        return jnp.take(t, member_map, axis=0)

    ops = []
    last_b = None
    for i in range(L):
        w = expand(params["ensemble"][i]["w"])  # [A, out, in]
        b = expand(params["ensemble"][i]["b"])  # [A, out]
        if i == 0:
            bias = jnp.einsum("bac,aoc->abo", cond, w[:, :, ds:]) + b[:, None, :]
            ops += [w[:, :, :ds], bias[..., None]]  # [A,H,3], [A,B,H,1]
        elif i == skip_in:
            h = w.shape[2] - cfg.d_in
            whS = w[:, :, :h] / SQRT2
            wpS = w[:, :, h : h + ds] / SQRT2
            bias = (
                jnp.einsum("bac,aoc->abo", cond, w[:, :, h + ds :]) / SQRT2
                + b[:, None, :]
            )
            ops += [whS, jnp.swapaxes(whS, 1, 2), wpS, bias[..., None]]
        elif i == L - 1:
            ops += [jnp.swapaxes(w, 1, 2)]  # [A, in, out] column layout
            last_b = b
        else:
            ops += [w, jnp.swapaxes(w, 1, 2), b[:, :, None]]
    return tuple(ops), last_b


def _active_mask(cfg: NPHMConfig, coords, tile: int, cull_eps: float):
    """Per-(tile, member) liveness from tile bounding boxes (XLA side).

    coords: [A, 3, M] member-local coordinates — the distance to member a's
    anchor is just |coords[a]| (mirroring flips a sign, distance unchanged),
    so the box closest-point test needs no anchor array.  Background member
    (index A-1) is always live.  Returns int32 [ceil8(n_tiles), A].
    """
    A, _, M = coords.shape
    n_t = M // tile
    if cull_eps <= 0:
        active = jnp.ones((n_t, A), jnp.int32)
    else:
        r2 = float(np.log(1.0 / cull_eps) * cfg.blend_var)
        c = coords.reshape(A, 3, n_t, tile)
        lo = jnp.min(c, axis=3)  # [A, 3, n_t]
        hi = jnp.max(c, axis=3)
        closest = jnp.clip(0.0, lo, hi)
        d2 = jnp.sum(closest**2, axis=1)  # [A, n_t]
        active = (d2 < r2).astype(jnp.int32)
        active = active.at[A - 1].set(1)  # background member: constant weight
        active = jnp.transpose(active)  # [n_t, A]
    pad = (-n_t) % 8
    if pad:
        active = jnp.concatenate([active, jnp.zeros((pad, A), jnp.int32)], 0)
    return jax.lax.stop_gradient(active)


def _softplus100(x, beta):
    bx = beta * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)


def _pmm(wp, raw):
    """[H, 3] x [3, T] as three VPU outer products (K=3 would waste the MXU)."""
    acc = wp[:, 0:1] * raw[0:1, :]
    for i in range(1, raw.shape[0]):
        acc += wp[:, i : i + 1] * raw[i : i + 1, :]
    return acc


def _pmmT(wp, d):
    """[H, 3]^T x [H, T] -> [3, T] via sublane reduces."""
    rows = [
        jnp.sum(wp[:, i : i + 1] * d, axis=0, keepdims=True)
        for i in range(wp.shape[1])
    ]
    return jnp.concatenate(rows, axis=0)


def _dot(w, x):
    return jnp.dot(w, x, preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """[H, T] x [I, T] -> [H, I] (contract the lane/point axis)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ddot3(z, raw):
    """[H, T] x [3, T] -> [H, 3] via lane reduces (3-wide MXU would pad)."""
    cols = [
        jnp.sum(z * raw[i : i + 1, :], axis=1, keepdims=True)
        for i in range(raw.shape[0])
    ]
    return jnp.concatenate(cols, axis=1)


def _rowsum(z):
    return jnp.sum(z, axis=1, keepdims=True)


def _member_block_specs(cfg: NPHMConfig, ops, tpr: int):
    """BlockSpecs for the flat ops tuple: one member slab per grid step;
    per-row biases additionally indexed by the tile's batch row."""
    layout = _op_layout(cfg)
    specs = []
    for (_, role), op in zip(layout, ops):
        if role in ("bias0", "biasS"):  # [A, B, H, 1]
            specs.append(
                pl.BlockSpec(
                    (1, 1) + op.shape[2:],
                    lambda a, t: (a, t // tpr, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            specs.append(
                pl.BlockSpec(
                    (1,) + op.shape[1:],
                    lambda a, t, nd=op.ndim: (a,) + (0,) * (nd - 1),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def _fwd_math(cfg: NPHMConfig, op, raw):
    """Shared primal sweep: returns (hs, f) with hs the hidden activations."""
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    beta = cfg.beta
    hs = []
    h = None
    for i in range(L - 1):
        if i == 0:
            z = _pmm(op[(i, "wp0")], raw) + op[(i, "bias0")]
        elif i == skip_in:
            z = _dot(op[(i, "whS")], h) + _pmm(op[(i, "wpS")], raw) + op[(i, "biasS")]
        else:
            z = _dot(op[(i, "wh")], h) + op[(i, "b")]
        h = _softplus100(z, beta)
        hs.append(h)
    f = jnp.sum(hs[-1] * op[(L - 1, "wlast")], axis=0, keepdims=True)  # [1, T]
    return hs, f


def _op_dict(cfg: NPHMConfig, op_refs):
    """Map flat per-member refs to {(layer, role): array} for this grid step."""
    layout = _op_layout(cfg)
    out = {}
    for (i, role), ref in zip(layout, op_refs):
        if role in ("bias0", "biasS"):
            out[(i, role)] = ref[0, 0]  # [H, 1]
        else:
            out[(i, role)] = ref[0]
    return out


def _make_fwd_kernel(cfg: NPHMConfig, tile: int):
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    beta = cfg.beta
    n_ops = len(_op_layout(cfg))

    def kernel(*refs):
        active_ref, coords_ref = refs[0], refs[1]
        op_refs = refs[2 : 2 + n_ops]
        f_ref, g_ref = refs[-2], refs[-1]
        a = pl.program_id(0)
        t = pl.program_id(1)
        live = active_ref[t % 8, a] != 0

        @pl.when(live)
        def _():
            op = _op_dict(cfg, op_refs)
            raw = coords_ref[0]  # [3, T]
            hs, f = _fwd_math(cfg, op, raw)
            f_ref[0] = f
            # reverse sweep for the spatial gradient (scalar output)
            u = op[(L - 1, "wlast")]  # [H, 1] cotangent of h_{L-2}
            g = None
            for i in range(L - 2, -1, -1):
                sp = 1.0 - jnp.exp(-beta * hs[i])  # softplus'(z_i)
                d = u * sp
                if i == skip_in:
                    gi = _pmmT(op[(i, "wpS")], d)
                    g = gi if g is None else g + gi
                    u = _dot(op[(i, "whST")], d)
                elif i == 0:
                    gi = _pmmT(op[(i, "wp0")], d)
                    g = gi if g is None else g + gi
                else:
                    u = _dot(op[(i, "whT")], d)
            g_ref[0] = g

        @pl.when(jnp.logical_not(live))
        def _():
            f_ref[:] = jnp.zeros((1, 1, tile), jnp.float32)
            g_ref[:] = jnp.zeros((1, 3, tile), jnp.float32)

    return kernel


def _make_bwd_kernel(cfg: NPHMConfig, tile: int, tpr: int):
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    beta = cfg.beta
    layout = _op_layout(cfg)
    n_ops = len(layout)
    # output ops: gradients for everything except the transposed copies
    grad_roles = [r for r in layout if r[1] not in ("whST", "whT")]

    def kernel(*refs):
        active_ref, coords_ref, u_ref, v_ref = refs[:4]
        op_refs = refs[4 : 4 + n_ops]
        out_refs = refs[4 + n_ops :]
        dcoords_ref = out_refs[0]
        dop_refs = {key: ref for key, ref in zip(grad_roles, out_refs[1:])}
        a = pl.program_id(0)
        t = pl.program_id(1)
        live = active_ref[t % 8, a] != 0

        # accumulator init: per-member grads once per member sweep, per-row
        # biases at each row boundary — unconditionally (culled members too)
        @pl.when(t == 0)
        def _():
            for (i, role), ref in dop_refs.items():
                if role not in ("bias0", "biasS"):
                    ref[:] = jnp.zeros_like(ref)

        @pl.when(t % tpr == 0)
        def _():
            for (i, role), ref in dop_refs.items():
                if role in ("bias0", "biasS"):
                    ref[:] = jnp.zeros_like(ref)

        @pl.when(live)
        def _():
            op = _op_dict(cfg, op_refs)
            raw = coords_ref[0]  # [3, T]
            v = v_ref[0]  # [3, T] tangent seed (cotangent of G)
            uf = u_ref[0]  # [1, T] cotangent of F

            # primal + tangent forwards (tangent input = v)
            hs, _ = _fwd_math(cfg, op, raw)
            ps, qs = [], []
            q = None
            for i in range(L - 1):
                if i == 0:
                    p = _pmm(op[(i, "wp0")], v)
                elif i == skip_in:
                    p = _dot(op[(i, "whS")], q) + _pmm(op[(i, "wpS")], v)
                else:
                    p = _dot(op[(i, "wh")], q)
                e = jnp.exp(-beta * hs[i])
                q = (1.0 - e) * p
                ps.append(p)
                qs.append(q)

            # seeds: phi = <uf, F> + Fhat, with F = wlast.h + b,
            # Fhat = wlast.q  (the JVP output)
            wlast = op[(L - 1, "wlast")]  # [H, 1]
            dop_refs[(L - 1, "wlast")][0] += _rowsum(hs[-1] * uf) + _rowsum(
                qs[-1]
            )
            ubar = wlast * uf  # [H, T] cotangent of h_{L-2}
            vbar = jnp.broadcast_to(wlast, ubar.shape)  # cotangent of q_{L-2}

            dg = None  # accumulates d_coords
            for i in range(L - 2, -1, -1):
                e = jnp.exp(-beta * hs[i])
                sp = 1.0 - e  # softplus'
                spp = beta * sp * e  # softplus''
                zbar = ubar * sp + vbar * spp * ps[i]
                pbar = vbar * sp
                h_in = hs[i - 1] if i > 0 else None
                q_in = qs[i - 1] if i > 0 else None
                if i == 0:
                    dop_refs[(i, "wp0")][0] += _ddot3(zbar, raw) + _ddot3(
                        pbar, v
                    )
                    dop_refs[(i, "bias0")][0, 0] += _rowsum(zbar)
                    gi = _pmmT(op[(i, "wp0")], zbar)
                    dg = gi if dg is None else dg + gi
                elif i == skip_in:
                    dop_refs[(i, "whS")][0] += _dot_nt(zbar, h_in) + _dot_nt(
                        pbar, q_in
                    )
                    dop_refs[(i, "wpS")][0] += _ddot3(zbar, raw) + _ddot3(
                        pbar, v
                    )
                    dop_refs[(i, "biasS")][0, 0] += _rowsum(zbar)
                    gi = _pmmT(op[(i, "wpS")], zbar)
                    dg = gi if dg is None else dg + gi
                    ubar = _dot(op[(i, "whST")], zbar)
                    vbar = _dot(op[(i, "whST")], pbar)
                else:
                    dop_refs[(i, "wh")][0] += _dot_nt(zbar, h_in) + _dot_nt(
                        pbar, q_in
                    )
                    dop_refs[(i, "b")][0] += _rowsum(zbar)
                    ubar = _dot(op[(i, "whT")], zbar)
                    vbar = _dot(op[(i, "whT")], pbar)
            dcoords_ref[0] = dg

        @pl.when(jnp.logical_not(live))
        def _():
            dcoords_ref[:] = jnp.zeros((1, 3, tile), jnp.float32)

    return kernel, grad_roles


def _fields_flops(cfg: NPHMConfig, m: int, factor: float):
    """FLOPs of the folded per-member point path (what the kernel actually
    executes: conditioning columns live in precomputed biases, so layer 0 and
    the skip layer only touch the 3 spatial inputs).  ``factor`` ~ 2 for the
    forward kernel (primal + reverse-for-G), ~6 for the backward (primal +
    tangent + dual reverse + weight-gradient outer products)."""
    shapes, skip_in = cfg.layer_shapes
    ds = cfg.input_dim
    per_point = 0
    for i, (s_in, s_out) in enumerate(shapes):
        if i == 0:
            per_point += 2 * s_out * ds
        elif i == skip_in:
            per_point += 2 * s_out * (s_in - cfg.d_in + ds)
        else:
            per_point += 2 * s_out * s_in
    return int(factor * per_point * cfg.n_members * m)


def _fwd_impl(spec: _Spec, ops, coords):
    cfg = spec.cfg
    A = cfg.n_members
    T = spec.tile
    M = coords.shape[-1]
    n_t = M // T
    active = _active_mask(cfg, coords, T, spec.cull_eps)

    in_specs = [
        pl.BlockSpec((8, A), lambda a, t: (t // 8, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        *_member_block_specs(cfg, ops, spec.tpr),
    ]
    # F rides as [A, 1, M] so its block (1, 1, T) satisfies the TPU rule
    # that the last two block dims divide (8, 128) or equal the array dims
    out_specs = [
        pl.BlockSpec((1, 1, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((A, 1, M), jnp.float32),
        jax.ShapeDtypeStruct((A, 3, M), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=_fields_flops(cfg, M, 2.0),
        bytes_accessed=coords.size * 4 + A * M * 16,
        transcendentals=2 * A * M * cfg.hidden_dim,
    )
    f, g = pl.pallas_call(
        _make_fwd_kernel(cfg, T),
        grid=(A, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=spec.interpret,
    )(active, coords, *ops)
    return f[:, 0], g


def _bwd_impl(spec: _Spec, ops, coords, dF, dG):
    cfg = spec.cfg
    A = cfg.n_members
    T = spec.tile
    M = coords.shape[-1]
    n_t = M // T
    # recomputed (not a residual): identical to the forward's mask because
    # it is a pure function of coords — fwd and bwd cull consistently
    active = _active_mask(cfg, coords, T, spec.cull_eps)
    layout = _op_layout(cfg)
    kernel, grad_roles = _make_bwd_kernel(cfg, T, spec.tpr)

    in_specs = [
        pl.BlockSpec((8, A), lambda a, t: (t // 8, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        *_member_block_specs(cfg, ops, spec.tpr),
    ]
    ops_by_key = {key: op for key, op in zip(layout, ops)}
    out_specs = [
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((A, 3, M), jnp.float32)]
    for key in grad_roles:
        op = ops_by_key[key]
        if key[1] in ("bias0", "biasS"):
            out_specs.append(
                pl.BlockSpec(
                    (1, 1) + op.shape[2:],
                    lambda a, t: (a, t // spec.tpr, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            out_specs.append(
                pl.BlockSpec(
                    (1,) + op.shape[1:],
                    lambda a, t, nd=op.ndim: (a,) + (0,) * (nd - 1),
                    memory_space=pltpu.VMEM,
                )
            )
        out_shape.append(jax.ShapeDtypeStruct(op.shape, jnp.float32))

    cost = pl.CostEstimate(
        flops=_fields_flops(cfg, M, 6.0),
        bytes_accessed=coords.size * 4 * 2 + A * M * 32,
        transcendentals=4 * A * M * cfg.hidden_dim,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(A, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=spec.interpret,
    )(active, coords, dF.reshape(A, 1, M), dG, *ops)
    dcoords = outs[0]
    grads_by_key = {key: g for key, g in zip(grad_roles, outs[1:])}
    d_ops = tuple(
        grads_by_key.get(key, jnp.zeros_like(op))
        for key, op in zip(layout, ops)
    )
    return d_ops, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _member_fields(spec: _Spec, ops, coords):
    """(F [A, M], G [A, 3, M]) per-member raw SDF and its coords-gradient."""
    return _fwd_impl(spec, ops, coords)


def _member_fields_fwd(spec, ops, coords):
    out = _fwd_impl(spec, ops, coords)
    return out, (ops, coords)


def _member_fields_bwd(spec, res, cts):
    ops, coords = res
    dF, dG = cts
    d_ops, dcoords = _bwd_impl(spec, ops, coords, dF, dG)
    return d_ops, dcoords


_member_fields.defvjp(_member_fields_fwd, _member_fields_bwd)


# ---------------------------------------------------------------------------
# Loss-specialized FIT kernels: F only + first-order VJP
# ---------------------------------------------------------------------------
#
# The joint/identity FIT loss (fitting/inference.py) needs only |sdf| and its
# gradient w.r.t. the LATENT code and the QUERY POINTS — the shape decoder's
# params are frozen, and no eikonal term means no spatial-gradient output and
# no grad-of-grad.  Routing the fit through the full training kernel
# (forward ~2x primal for G, backward ~6x primal for the double-backprop +
# weight-gradient accumulators that the fit discards) does ~8x the minimal
# work (VERDICT r2 item 6).  These kernels do the minimum:
#
# - fit forward: the primal sweep only -> F (~1x primal);
# - fit backward: given the cotangent u of F, one reverse sweep yields
#   d_coords (the point gradient, seeding the IFT/latent chain) and the
#   per-(member, row) bias cotangents (which carry the latent gradient —
#   conditioning is folded into biases by ``prepare_train_operands``, whose
#   XLA-side VJP maps d_bias -> d_lat) (~2x primal).
#
# Weight gradients are returned as zeros: the frozen-params chain is dead
# code XLA eliminates.


def _make_fit_fwd_kernel(cfg: NPHMConfig, tile: int):
    n_ops = len(_op_layout(cfg))

    def kernel(*refs):
        active_ref, coords_ref = refs[0], refs[1]
        op_refs = refs[2 : 2 + n_ops]
        f_ref = refs[-1]
        a = pl.program_id(0)
        t = pl.program_id(1)
        live = active_ref[t % 8, a] != 0

        @pl.when(live)
        def _():
            op = _op_dict(cfg, op_refs)
            _hs, f = _fwd_math(cfg, op, coords_ref[0])
            f_ref[0] = f

        @pl.when(jnp.logical_not(live))
        def _():
            f_ref[:] = jnp.zeros((1, 1, tile), jnp.float32)

    return kernel


def _make_fit_bwd_kernel(cfg: NPHMConfig, tile: int, tpr: int):
    shapes, skip_in = cfg.layer_shapes
    L = len(shapes)
    beta = cfg.beta
    n_ops = len(_op_layout(cfg))

    def kernel(*refs):
        active_ref, coords_ref, u_ref = refs[:3]
        op_refs = refs[3 : 3 + n_ops]
        dcoords_ref, dbias0_ref, dbiasS_ref = refs[3 + n_ops :]
        a = pl.program_id(0)
        t = pl.program_id(1)
        live = active_ref[t % 8, a] != 0

        # per-row bias accumulators init at each row boundary (culled too)
        @pl.when(t % tpr == 0)
        def _():
            dbias0_ref[:] = jnp.zeros_like(dbias0_ref)
            dbiasS_ref[:] = jnp.zeros_like(dbiasS_ref)

        @pl.when(live)
        def _():
            op = _op_dict(cfg, op_refs)
            raw = coords_ref[0]  # [3, T]
            uf = u_ref[0]  # [1, T] cotangent of F
            hs, _f = _fwd_math(cfg, op, raw)
            u = op[(L - 1, "wlast")] * uf  # [H, T] cotangent of h_{L-2}
            dg = None
            for i in range(L - 2, -1, -1):
                sp = 1.0 - jnp.exp(-beta * hs[i])  # softplus'
                d = u * sp
                if i == skip_in:
                    dbiasS_ref[0, 0] += _rowsum(d)
                    gi = _pmmT(op[(i, "wpS")], d)
                    dg = gi if dg is None else dg + gi
                    u = _dot(op[(i, "whST")], d)
                elif i == 0:
                    dbias0_ref[0, 0] += _rowsum(d)
                    gi = _pmmT(op[(i, "wp0")], d)
                    dg = gi if dg is None else dg + gi
                else:
                    u = _dot(op[(i, "whT")], d)
            dcoords_ref[0] = dg

        @pl.when(jnp.logical_not(live))
        def _():
            dcoords_ref[:] = jnp.zeros((1, 3, tile), jnp.float32)

    return kernel


def _fit_fwd_impl(spec: _Spec, ops, coords):
    cfg = spec.cfg
    A = cfg.n_members
    T = spec.tile
    M = coords.shape[-1]
    n_t = M // T
    active = _active_mask(cfg, coords, T, spec.cull_eps)
    in_specs = [
        pl.BlockSpec((8, A), lambda a, t: (t // 8, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        *_member_block_specs(cfg, ops, spec.tpr),
    ]
    out_specs = pl.BlockSpec(
        (1, 1, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=_fields_flops(cfg, M, 1.0),
        bytes_accessed=coords.size * 4 + A * M * 8,
        transcendentals=A * M * cfg.hidden_dim,
    )
    f = pl.pallas_call(
        _make_fit_fwd_kernel(cfg, T),
        grid=(A, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((A, 1, M), jnp.float32),
        cost_estimate=cost,
        interpret=spec.interpret,
    )(active, coords, *ops)
    return f[:, 0]


def _fit_bwd_impl(spec: _Spec, ops, coords, dF):
    cfg = spec.cfg
    A = cfg.n_members
    T = spec.tile
    M = coords.shape[-1]
    n_t = M // T
    active = _active_mask(cfg, coords, T, spec.cull_eps)
    layout = _op_layout(cfg)
    shapes, skip_in = cfg.layer_shapes
    ops_by_key = {key: op for key, op in zip(layout, ops)}
    bias0 = ops_by_key[(0, "bias0")]
    biasS = ops_by_key[(skip_in, "biasS")]

    in_specs = [
        pl.BlockSpec((8, A), lambda a, t: (t // 8, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        *_member_block_specs(cfg, ops, spec.tpr),
    ]
    bias_spec = lambda op: pl.BlockSpec(  # noqa: E731
        (1, 1) + op.shape[2:],
        lambda a, t: (a, t // spec.tpr, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [
        pl.BlockSpec((1, 3, T), lambda a, t: (a, 0, t), memory_space=pltpu.VMEM),
        bias_spec(bias0),
        bias_spec(biasS),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((A, 3, M), jnp.float32),
        jax.ShapeDtypeStruct(bias0.shape, jnp.float32),
        jax.ShapeDtypeStruct(biasS.shape, jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=_fields_flops(cfg, M, 2.0),
        bytes_accessed=coords.size * 4 * 2 + A * M * 8,
        transcendentals=A * M * cfg.hidden_dim,
    )
    dcoords, d_bias0, d_biasS = pl.pallas_call(
        _make_fit_bwd_kernel(cfg, T, spec.tpr),
        grid=(A, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=spec.interpret,
    )(active, coords, dF.reshape(A, 1, M), *ops)
    d_ops = tuple(
        d_bias0
        if key == (0, "bias0")
        else d_biasS
        if key == (skip_in, "biasS")
        else jnp.zeros_like(op)
        for key, op in zip(layout, ops)
    )
    return d_ops, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _member_f(spec: _Spec, ops, coords):
    """F [A, M] per-member raw SDF (fit-specialized: first-order VJP only;
    weight cotangents are zeros — valid ONLY under frozen decoder params)."""
    return _fit_fwd_impl(spec, ops, coords)


def _member_f_fwd(spec, ops, coords):
    return _fit_fwd_impl(spec, ops, coords), (ops, coords)


def _member_f_bwd(spec, res, dF):
    ops, coords = res
    return _fit_bwd_impl(spec, ops, coords, dF)


_member_f.defvjp(_member_f_fwd, _member_f_bwd)


def apply_nphm_fit_pallas(
    params,
    cfg: NPHMConfig,
    xyz,
    lat,
    *,
    tile: int = DEFAULT_TILE,
    cull_eps: float = CULL_EPS_TRAIN,
    sort: bool | None = None,
    interpret: bool | None = None,
):
    """Fit-specialized NPHM field: sdf only, first-order VJP w.r.t. lat/xyz.

    Same training-mode semantics as ``apply_nphm_train_pallas`` (the
    reference fits with ``decoder_shape.train()``, fitting.py:57) but
    without the spatial-gradient output or the double-backprop machinery the
    fit loss never uses.  NOT valid when gradients w.r.t. ``params`` are
    needed (weight cotangents are zeroed) — the fit optimizes latents only.

    Returns (sdf [B, N, 1], anchors [B, n_loc, 3]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sort is None:
        sort = cull_eps > 0
    B, N, _ = xyz.shape
    A = cfg.n_members

    anchors = predict_anchors(params, cfg, lat)

    if sort:
        perm = jax.lax.stop_gradient(jnp.argsort(_morton_codes(xyz), axis=1))
        xyz_s = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    else:
        perm = None
        xyz_s = xyz

    Np = -(-N // tile) * tile
    if Np != N:
        xyz_s = jnp.concatenate(
            [xyz_s, jnp.broadcast_to(xyz_s[:, -1:], (B, Np - N, 3))], axis=1
        )

    centers = jnp.concatenate(
        [anchors, jnp.zeros_like(anchors[:, :1, :])], axis=1
    )
    sign = jnp.concatenate(
        [
            jnp.asarray(cfg.mirror_sign)[:, None],
            jnp.ones((A, 2), jnp.float32),
        ],
        axis=1,
    )
    coords = (xyz_s[:, :, None, :] - centers[:, None, :, :]) * sign
    coords_t = jnp.transpose(coords, (2, 3, 0, 1)).reshape(A, 3, B * Np)

    ops, last_b = prepare_train_operands(params, cfg, lat)
    spec = _Spec(
        cfg=cfg,
        tile=tile,
        tpr=Np // tile,
        cull_eps=float(cull_eps),
        interpret=interpret,
    )
    F = _member_f(spec, ops, coords_t)
    Fm = jnp.transpose(F.reshape(A, B, Np), (1, 2, 0)) + last_b[:, 0]
    wn = _blend_weights(cfg, xyz_s, anchors)
    sdf = jnp.sum(wn * Fm, axis=-1)[:, :N]
    if perm is not None:
        sdf = jnp.take_along_axis(sdf, jnp.argsort(perm, axis=1), axis=1)
    return sdf[..., None], anchors


def _morton_codes(xyz):
    """Per-row 30-bit Morton codes for spatial sorting. xyz: [B, N, 3]."""
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    q = jnp.clip((xyz - lo) / (hi - lo + 1e-9) * 1023.0, 0.0, 1023.0)
    q = q.astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return (
        (spread(q[..., 0]) << 2)
        | (spread(q[..., 1]) << 1)
        | spread(q[..., 2])
    )


def _blend_weights(cfg: NPHMConfig, q, anchors):
    """Normalized Gaussian blend weights, bitwise the XLA decoder's
    (models/ensemble.py gaussian_blend; reference EnsembledDeepSDF.py:129-150).
    q: [B, N, 3]; anchors: [B, K, 3] -> [B, N, K+1]."""
    d = safe_l2norm(anchors[:, None, :, :] - q[:, :, None, :], axis=-1)
    dist = -((d + 1e-5) ** 2)
    dist = jnp.concatenate(
        [dist, jnp.full_like(dist[..., :1], cfg.blend_background_dist)], axis=-1
    )
    w = jnp.exp(dist / cfg.blend_var)
    return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)


def apply_nphm_train_pallas(
    params,
    cfg: NPHMConfig,
    xyz,
    lat,
    *,
    tile: int = DEFAULT_TILE,
    cull_eps: float = CULL_EPS_TRAIN,
    sort: bool | None = None,
    interpret: bool | None = None,
):
    """Training-mode NPHM field: (sdf, spatial gradient, anchors), fused.

    Drop-in for the ``apply_nphm(training=True)`` + ``spatial_gradient``
    pair of the identity loss (reference loss_functions.py:36-49), built so
    ``jax.grad`` of a loss over (sdf, grad) — the eikonal double backprop —
    runs through one custom-VJP Pallas kernel instead of XLA's
    HBM-round-tripping chain.

    xyz: [B, N, 3]; lat: [B, lat_dim].  Differentiable w.r.t. params, lat
    and xyz.  sort: Morton-order points per row so member culling fires
    (None = only when cull_eps > 0).  Returns
    (sdf [B, N, 1], grads [B, N, 3], anchors [B, n_loc, 3]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sort is None:
        sort = cull_eps > 0
    B, N, _ = xyz.shape
    A = cfg.n_members

    anchors = predict_anchors(params, cfg, lat)  # [B, K, 3]

    if sort:
        perm = jax.lax.stop_gradient(
            jnp.argsort(_morton_codes(xyz), axis=1)
        )  # [B, N]
        xyz_s = jnp.take_along_axis(xyz, perm[..., None], axis=1)
    else:
        perm = None
        xyz_s = xyz

    Np = -(-N // tile) * tile
    if Np != N:
        xyz_s = jnp.concatenate(
            [xyz_s, jnp.broadcast_to(xyz_s[:, -1:], (B, Np - N, 3))], axis=1
        )

    # member-local mirrored coordinates; background member uses global coords
    centers = jnp.concatenate(
        [anchors, jnp.zeros_like(anchors[:, :1, :])], axis=1
    )  # [B, A, 3]
    sign = jnp.concatenate(
        [
            jnp.asarray(cfg.mirror_sign)[:, None],
            jnp.ones((A, 2), jnp.float32),
        ],
        axis=1,
    )  # [A, 3]
    coords = (xyz_s[:, :, None, :] - centers[:, None, :, :]) * sign  # [B,Np,A,3]
    coords_t = jnp.transpose(coords, (2, 3, 0, 1)).reshape(A, 3, B * Np)

    ops, last_b = prepare_train_operands(params, cfg, lat)
    spec = _Spec(
        cfg=cfg,
        tile=tile,
        tpr=Np // tile,
        cull_eps=float(cull_eps),
        interpret=interpret,
    )
    F, G = _member_fields(spec, ops, coords_t)

    Fm = jnp.transpose(F.reshape(A, B, Np), (1, 2, 0)) + last_b[:, 0]  # [B,Np,A]
    Gm = jnp.transpose(G.reshape(A, 3, B, Np), (2, 3, 0, 1))  # [B, Np, A, 3]
    Gm = Gm * sign  # chain d(coords)/d(xyz): mirror sign on the x column

    wn = _blend_weights(cfg, xyz_s, anchors)  # [B, Np, A]
    sdf = jnp.sum(wn * Fm, axis=-1)  # [B, Np]
    # spatial gradient: blend-weight part (autodiff, holding F fixed) +
    # member-field part (kernel G)
    g_wpart = jax.grad(
        lambda q: jnp.sum(_blend_weights(cfg, q, anchors) * Fm)
    )(xyz_s)
    grads = g_wpart + jnp.einsum("bna,bnac->bnc", wn, Gm)

    sdf = sdf[:, :N]
    grads = grads[:, :N]
    if perm is not None:
        inv = jnp.argsort(perm, axis=1)
        sdf = jnp.take_along_axis(sdf, inv, axis=1)
        grads = jnp.take_along_axis(grads, inv[..., None], axis=1)
    return sdf[..., None], grads, anchors
