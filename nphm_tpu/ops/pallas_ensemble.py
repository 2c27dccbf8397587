"""Fused Pallas TPU kernel for the NPHM anchored-ensemble SDF (eval mode).

Hot loop #2 of SURVEY.md section 3 (dense grid evaluation, reference
``src/NPHM/models/reconstruction.py:6-25`` over the decoder at
``src/NPHM/models/EnsembledDeepSDF.py:153``): every query point is pushed
through 40 small local MLPs and the per-member SDFs are blended with a
Gaussian kernel on point-to-anchor distance.

Kernel design (one pallas_call, grid = (point_tiles, member_groups)):

- Points are tiled along the first grid axis; the 39 anchored members
  iterate on the innermost axis (``group`` per step, statically unrolled),
  accumulating the Gaussian-blend numerator and denominator in VMEM
  scratch, so activations never touch HBM (the pure-XLA path writes
  ``[members, N, hidden]`` to HBM between layers and is bandwidth-bound).
- Member weights arrive as per-member blocks (symmetric weight sharing,
  reference EnsembledDeepSDF.py:43-45, is expanded on the XLA side; the
  x-mirror of odd pair members, reference :244, is folded into the sign of
  the point-facing weight rows so the kernel never mirrors coordinates).
- The conditioning ``[z_glob, z_k]`` is constant along points, so its
  input-layer and skip-layer matmul contributions are folded into
  per-member biases outside the kernel (cheap, once per latent).
- **Member culling**: blend weights decay as ``exp(-d^2/0.01)``, so a
  member whose anchor is farther than ``sqrt(ln(1/eps)*var)`` from every
  point in the tile contributes < eps and its whole MLP is predicated off.
  The predicate is computed OUTSIDE the kernel from tile bounding boxes
  (conservative) and read as an SMEM scalar — an in-kernel ``jnp.min``
  reduce would stall the VPU pipeline every step.  On spatially coherent
  tiles (brick-ordered grids) this skips ~75% of the 39 members with an
  error bounded by ``39*eps``.
- TRANSPOSED data flow: points live on the lane axis ([3, T] tiles,
  [hidden, T] activations, [1, T] blend scalars at full lane utilization).
  The 3-wide input matmuls run as VPU outer products and the 1-wide output
  matmul as a VPU column-reduce (K=3 / N=1 MXU matmuls would pad to 128
  and waste ~40x the FLOPs); the big hidden matmuls run on the MXU with
  f32 accumulation (operands optionally bf16 — measured neutral; the
  kernel sits near the padded-matmul roofline for this architecture).
- Eval-mode semantics pin the background member to SDF=1 (reference
  :260-261 intent), so its blend contribution is the scratch initializer
  and only the 39 anchored members are evaluated.

Only the no-grad forward is provided: training and fitting differentiate
through the decoder and use the XLA path (models/ensemble.py), which is
what SURVEY.md section 7 prescribes (pure-XLA reference first, Pallas for
the extraction hot path).

Measured roofline (scripts/validation/kernel_roofline.py, one v5e chip,
res-256 brick grid at production dims, 2026-08-19):

- **Dense data flow is AT the compute roofline.** With culling disabled
  the kernel evaluates all 40 members for 16.77M points in 2.85 s =
  5.90M q/s = 37.6 useful TFLOP/s; counting the unavoidable MXU-tile
  padding of the reference's hidden_dim=200 matmuls to 256 lanes (x1.63),
  the MXU sustains 60.3 TFLOP/s = **92% of the 65.7 TFLOP/s f32
  (3-pass) peak**.  HBM is idle by comparison: weights are re-streamed
  per point tile at 142 GB/s of the ~819 GB/s available, and activations
  never leave VMEM.  The residual 8% is the VPU share (blend + the
  3-wide/1-wide outer-product layers: 2.8k VPU flops per point-member vs
  161k MXU) plus grid-step overhead.
- **The production (culled) setting trades MXU utilization for work
  elimination, net +2.55x.**  At cull_eps=1e-10 exactly 22.5% of
  (tile, member) pairs survive the box predicate; the kernel runs the
  same grid in 1.11 s = 15.1M q/s, with the surviving matmuls at
  34.7 TFLOP/s padded = 53% of f32 peak.  The utilization drop vs the
  dense path is per-grid-step overhead concentrated by culling (19.2% of
  the 81.9k grid steps are fully culled yet still cost part of the
  13.6 us/step average) and cross-tile raggedness.
- **Headroom accounting.**  If the surviving 22.5% of work ran at the
  dense path's 92% utilization, the culled kernel would reach ~26M q/s
  (+74%).  Every in-place knob to get there is a measured dead end at
  parity dims: member group >4 (2x worse), tile 4096 (2x worse — larger
  tile bounding boxes gut the cull), bf16 operands (neutral — the kernel
  is not bandwidth-bound), relu (changes semantics).  Closing the gap
  requires a different schedule — compacting active (tile, member) pairs
  into a dense work list instead of predicating a fixed grid — i.e. the
  strategy reconstruction/sparse.py already applies one level up, where
  it wins 2-3x end-to-end on trained models by never touching empty
  bricks at all.  The 14.2M q/s BENCH headline (15.1M kernel-only; the
  bench leg includes operand prep) is therefore the plateau of THIS
  schedule, not of the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nphm_tpu.models.ensemble import NPHMConfig, _split_cond, predict_anchors

DEFAULT_TILE = 2048  # 1-D f32 output tiling is T(1024); tile must be a multiple
_ACTIVATION = "softplus"  # private ablation hook ("relu" for perf probes)
DEFAULT_GROUP = 4  # members per grid step (best measured; see commit log)
# Skip a member when its blend weight is < eps for all points in a tile.
# The far-field error bound is n_loc*eps relative to the 1e-6 normalization
# floor: eps=1e-10 keeps the worst-case far-field SDF error below
# ~4e-3*|sdf| (measured: res-256 logits sum bit-identical to eps=1e-12,
# +8% throughput from the tighter cull radius).
CULL_EPS = 1e-10
SQRT2 = 1.4142135623730951


def prepare_pallas_operands(
    params, cfg: NPHMConfig, lat, dtype=jnp.float32, group: int = 1
):
    """Fold latent conditioning, symmetric sharing and mirroring into
    kernel-ready per-member operands.

    lat: [lat_dim] or [1, lat_dim].  Pure XLA, cheap (a few [40, hidden]
    einsums), safe to run inside the same jit as the kernel call.

    group: member-axis operands are zero-padded to a multiple of this (the
    kernel evaluates ``group`` members per grid step); padded members get a
    far-away sentinel center so the cull predicate always skips them.

    Returns (operands, anchors[n_loc, 3]); operands is the flat tuple
    (centers, w0p, wsp, *hidden_ws, *biases) the kernel consumes.
    """
    lat = jnp.reshape(lat, (1, cfg.lat_dim))
    shapes, skip_in = cfg.layer_shapes
    n_layers = len(shapes)
    K = cfg.n_loc  # anchored members only; background is pinned at eval
    ds = cfg.input_dim

    anchors = predict_anchors(params, cfg, lat)[0]  # [K, 3]
    cond = _split_cond(cfg, lat)[0]  # [n_members, G+L]
    member_map = jnp.asarray(cfg.member_map[:K])  # [K] distinct index
    sign = jnp.asarray(cfg.mirror_sign[:K])  # [K] x-mirror per member

    def expand(t):  # distinct -> per-member, anchored members only
        return jnp.take(t, member_map, axis=0)

    def fold_sign(wp):  # wp [K, out, ds]: mirror = flip sign of the x column
        col_scale = jnp.concatenate(
            [sign[:, None], jnp.ones((K, ds - 1), sign.dtype)], axis=1
        )
        return wp * col_scale[:, None, :]

    # Everything below is laid out for the kernel's TRANSPOSED data flow
    # (activations [hidden, points]): weights stay in their native [out, in]
    # orientation, per-point vectors live on the lane axis, and per-member
    # vectors (centers, biases) are [*, 1] columns that broadcast over lanes.
    hidden_ws = []
    biases = []
    wsp = None
    for i in range(n_layers):
        w = params["ensemble"][i]["w"]  # [n_distinct, out, in]
        b = params["ensemble"][i]["b"]  # [n_distinct, out]
        if i == 0:
            w0p = fold_sign(expand(w[:, :, :ds]))  # [K, H0, 3]
            bias = (
                jnp.einsum("kc,koc->ko", cond[:K], expand(w[:, :, ds:]))
                + expand(b)
            )
        elif i == skip_in:
            h = w.shape[2] - cfg.d_in
            hidden_ws.append(expand(w[:, :, :h]).astype(dtype) / SQRT2)
            wsp = fold_sign(expand(w[:, :, h : h + ds])) / SQRT2
            bias = (
                jnp.einsum("kc,koc->ko", cond[:K], expand(w[:, :, h + ds :]))
                / SQRT2
                + expand(b)
            )
        elif i == n_layers - 1:
            # consumed as a VPU column-reduce: [K, in, out] layout, f32
            hidden_ws.append(
                jnp.transpose(expand(w), (0, 2, 1)).astype(jnp.float32)
            )
            bias = expand(b)
        else:
            hidden_ws.append(expand(w).astype(dtype))
            bias = expand(b)
        biases.append(bias.astype(jnp.float32)[:, :, None])  # [K, H_i, 1]

    centers = anchors.astype(jnp.float32)[:, :, None]  # [K, 3, 1]
    pad = (-K) % group
    if pad:
        def zpad(t):
            return jnp.concatenate(
                [t, jnp.zeros((pad,) + t.shape[1:], t.dtype)], axis=0
            )

        centers = jnp.concatenate(
            [centers, jnp.full((pad, 3, 1), 1e9, jnp.float32)], axis=0
        )
        w0p, wsp = zpad(w0p), zpad(wsp)
        hidden_ws = [zpad(t) for t in hidden_ws]
        biases = [zpad(t) for t in biases]

    operands = (
        centers,
        w0p.astype(jnp.float32),  # consumed on the VPU
        wsp.astype(jnp.float32),
        *hidden_ws,
        *biases,
    )
    return operands, anchors


def _make_kernel(cfg: NPHMConfig, tile: int, dtype, group: int):
    shapes, skip_in = cfg.layer_shapes
    n_layers = len(shapes)
    n_groups = -(-cfg.n_loc // group)
    inv_var = 1.0 / cfg.blend_var
    bg_w = float(np.exp(cfg.blend_background_dist / cfg.blend_var))

    def softplus100(x):
        if _ACTIVATION == "relu":  # ablation hook, not a public knob
            return jnp.maximum(x, 0.0)
        bx = cfg.beta * x
        return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / cfg.beta)

    def point_matmul(wp, raw):
        # [H, 3] x [3, T] as three VPU outer products: a K=3 MXU matmul
        # would pad the contraction to 128 and waste ~40x the FLOPs.
        acc = wp[:, 0:1] * raw[0:1, :]
        for i in range(1, raw.shape[0]):
            acc += wp[:, i : i + 1] * raw[i : i + 1, :]
        return acc

    def kernel(*refs):
        # TRANSPOSED data flow: points live on the lane axis, so per-point
        # scalars (distances, blend weights, accumulators) are [1, T] rows
        # at full lane utilization — in the [T, 1] orientation every one of
        # those VPU ops would run 128x under-utilized.
        active_ref, q_ref, center_ref, w0p_ref, wsp_ref = refs[:5]
        wh_refs = refs[5 : 5 + n_layers - 1]
        b_refs = refs[5 + n_layers - 1 : 5 + 2 * n_layers - 1]
        out_ref = refs[-3]
        num_ref, den_ref = refs[-2], refs[-1]  # scratch args follow outputs

        k = pl.program_id(1)  # member-group index

        @pl.when(k == 0)
        def _():
            num_ref[:] = jnp.full((1, tile), bg_w * 1.0, jnp.float32)
            den_ref[:] = jnp.full((1, tile), bg_w, jnp.float32)

        q = q_ref[:]  # [3, T] f32

        for g in range(group):  # static unroll: amortizes grid-step overhead
            # SMEM scalar predicate (precomputed box-distance cull): no
            # in-kernel vector->scalar reduction, no VPU pipeline sync.
            @pl.when(active_ref[pl.program_id(0) % 8, k * group + g] != 0)
            def _(g=g):
                raw = q - center_ref[g]  # [3, T] - [3, 1]
                dist2 = jnp.sum(raw * raw, axis=0, keepdims=True)  # [1, T]
                dd = jnp.sqrt(dist2 + 1e-20)
                w = jnp.exp(-((dd + 1e-5) ** 2) * inv_var)  # [1, T] f32

                h = None
                wi = 0
                for i in range(n_layers):
                    bias = b_refs[i][g]  # [out_i, 1] f32
                    if i == 0:
                        z = point_matmul(w0p_ref[g], raw) + bias
                    elif i == n_layers - 1:
                        # [1, H] x [H, T] contraction as a VPU column-reduce;
                        # an MXU matmul would pad the 1-wide output sublane.
                        z = (
                            jnp.sum(h * wh_refs[wi][g], axis=0, keepdims=True)
                            + bias
                        )
                        wi += 1
                    elif i == skip_in:
                        z = (
                            jnp.dot(
                                wh_refs[wi][g],
                                h.astype(dtype),
                                preferred_element_type=jnp.float32,
                            )
                            + point_matmul(wsp_ref[g], raw)
                            + bias
                        )
                        wi += 1
                    else:
                        z = (
                            jnp.dot(
                                wh_refs[wi][g],
                                h.astype(dtype),
                                preferred_element_type=jnp.float32,
                            )
                            + bias
                        )
                        wi += 1
                    if i < n_layers - 1:
                        h = softplus100(z)
                num_ref[:] = num_ref[:] + w * z[:1, :]
                den_ref[:] = den_ref[:] + w

        @pl.when(k == n_groups - 1)
        def _():
            out_ref[:] = (num_ref[:] / (den_ref[:] + 1e-6))[0, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tile", "dtype", "cull_eps", "group", "interpret"),
)
def nphm_sdf_pallas(
    params,
    cfg: NPHMConfig,
    xyz,
    lat,
    *,
    tile: int = DEFAULT_TILE,
    dtype=jnp.float32,
    cull_eps: float = CULL_EPS,
    group: int = DEFAULT_GROUP,
    interpret: bool | None = None,
):
    """Eval-mode NPHM SDF via the fused kernel.

    group: members evaluated per grid step (statically unrolled; measured
    mildly best at 4 — the kernel sits near the padded-matmul roofline, so
    grouping mostly trades VMEM for step count).  Culling stays per-member.

    xyz: [N, 3] (padded to a tile multiple internally); lat: [lat_dim] or
    [1, lat_dim].  Returns sdf [N] f32.  Matches
    ``apply_nphm(..., training=False)`` up to matmul precision plus a
    blend-weight truncation bounded by ``n_loc * cull_eps`` (set
    ``cull_eps=0`` to disable member culling).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile % 1024:
        raise ValueError("tile must be a multiple of 1024 (f32 1-D layout)")
    shapes, _ = cfg.layer_shapes
    n_layers = len(shapes)
    K = cfg.n_loc
    # weight < eps  <=>  d^2 > ln(1/eps) * var  (cull on squared distance)
    cull_r2 = (
        float(np.log(1.0 / cull_eps) * cfg.blend_var)
        if cull_eps > 0
        else float(np.inf)
    )

    n = xyz.shape[0]
    pad = (-n) % tile
    if pad:
        # pad with the last real point so padding never un-culls a member
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[-1:], (pad, 3))], axis=0
        )
    grid_t = xyz.shape[0] // tile

    operands, anchors = prepare_pallas_operands(params, cfg, lat, dtype, group)
    kernel = _make_kernel(cfg, tile, dtype, group)
    n_groups = -(-K // group)
    Kp = n_groups * group

    # Per-(tile, member) cull predicate, precomputed in XLA from tile
    # bounding boxes: box-to-anchor distance lower-bounds every point-to-
    # anchor distance, so this is a conservative superset of the exact
    # per-point cull.  Computing it here (instead of a min-reduce inside
    # the kernel) keeps the kernel free of vector->scalar pipeline syncs —
    # the predicate arrives as an SMEM scalar per step.
    pts_t = xyz.reshape(grid_t, tile, 3)
    box_lo = jnp.min(pts_t, axis=1)  # [G, 3]
    box_hi = jnp.max(pts_t, axis=1)
    centers_k = jnp.concatenate(
        [anchors, jnp.full((Kp - K, 3), 1e9, jnp.float32)], axis=0
    )
    clipped = jnp.clip(
        centers_k[None, :, :], box_lo[:, None, :], box_hi[:, None, :]
    )
    box_d2 = jnp.sum((centers_k[None] - clipped) ** 2, axis=-1)  # [G, Kp]
    active = (box_d2 < cull_r2).astype(jnp.int32)
    # SMEM blocks obey the (8, _) sublane rule: ship 8 tile-rows per block
    # and pick row t % 8 inside the kernel.
    row_pad = (-grid_t) % 8
    if row_pad:
        active = jnp.concatenate(
            [active, jnp.zeros((row_pad, Kp), jnp.int32)], axis=0
        )

    def member_block(shape):
        # one member-group slab of a [Kp, ...] operand
        return pl.BlockSpec(
            (group, *shape), lambda t, k: (k,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec(
            (8, Kp), lambda t, k: (t // 8, 0), memory_space=pltpu.SMEM
        ),  # active predicate rows for tiles [8*(t//8), 8*(t//8)+8)
        pl.BlockSpec((3, tile), lambda t, k: (0, t), memory_space=pltpu.VMEM),
    ]
    for op in operands:  # centers, w0p, wsp, hidden ws, biases: per member
        in_specs.append(member_block(op.shape[1:]))

    flops_pp = sum(2 * s_in * s_out for (s_in, s_out) in shapes)
    cost = pl.CostEstimate(
        flops=flops_pp * K * xyz.shape[0],
        bytes_accessed=xyz.size * 4 + xyz.shape[0] * 4,
        transcendentals=2 * K * xyz.shape[0] * cfg.hidden_dim,
    )

    out = pl.pallas_call(
        kernel,
        grid=(grid_t, n_groups),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile,), lambda t, k: (t,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid_t * tile,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(active, jnp.transpose(xyz.astype(jnp.float32)), *operands)
    return out[:n]


def _brick_shape(res: int, tile: int):
    """A (bx, by, bz) brick with bx*by*bz == tile that divides res^3, or None.

    Bricks make kernel tiles spatially compact so member culling can fire:
    a flat z-fastest tile spans the whole z-axis and stays "near" every
    anchor, but an 8x8x16 brick at res 256 is ~0.04 units across and culls
    most of the 39 members (all of them, outside the head).
    """
    best = None
    b = 2
    while b * b * b <= tile:
        if tile % (b * b) == 0:
            bz = tile // (b * b)
            if res % b == 0 and res % bz == 0 and bz <= res:
                best = (b, b, bz)
        b *= 2
    return best


def _brick_points(cfg_axes, lin, res: int, brick, tile: int):
    """Grid coordinates of brick-order linear indices ``lin`` (on device)."""
    if brick is None:
        ix = lin // (res * res)
        iy = (lin // res) % res
        iz = lin % res
    else:
        bx, by, bz = brick
        nby, nbz = res // by, res // bz
        b, i = lin // tile, lin % tile
        ix = (b // (nby * nbz)) * bx + i // (by * bz)
        iy = ((b // nbz) % nby) * by + (i // bz) % by
        iz = (b % nbz) * bz + i % bz
    return jnp.stack(
        [cfg_axes[0][ix], cfg_axes[1][iy], cfg_axes[2][iz]], axis=-1
    )


def _unbrick_gather(res: int, brick, tile: int):
    """Natural (x-major) index -> brick-order position, as a gather map."""
    lin = jnp.arange(res * res * res, dtype=jnp.int32)
    if brick is None:
        return lin
    bx, by, bz = brick
    nby, nbz = res // by, res // bz
    jx = lin // (res * res)
    jy = (lin // res) % res
    jz = lin % res
    return (
        ((jx // bx) * nby * nbz + (jy // by) * nbz + jz // bz) * tile
        + (jx % bx) * (by * bz)
        + (jy % by) * bz
        + (jz % bz)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "mini",
        "maxi",
        "res",
        "tile",
        "dtype",
        "cull_eps",
        "group",
        "interpret",
        "device_mesh",
    ),
)
def nphm_grid_sdf_pallas(
    params,
    cfg: NPHMConfig,
    lat,
    mini,
    maxi,
    res: int,
    *,
    tile: int = DEFAULT_TILE,
    dtype=jnp.float32,
    cull_eps: float = CULL_EPS,
    group: int = DEFAULT_GROUP,
    interpret: bool | None = None,
    device_mesh=None,
):
    """Dense-grid SDF evaluation, fully on device.

    Equivalent to evaluating ``create_grid_points_from_bounds(mini, maxi,
    res)`` (reference utils/reconstruction.py:5-20 ordering: x-major, z
    fastest) but the points are *generated on device in brick order*, so
    (a) nothing is shipped through the host and (b) every kernel tile is a
    compact spatial brick, which is what makes member culling effective.

    device_mesh: optional ``jax.sharding.Mesh`` — bricks are sharded across
    its devices with ``shard_map`` (the multi-chip analogue of the
    reference's serial 25k-point chunks, SURVEY.md section 2.3) and the
    logits all-gather back.  res^3 must tile evenly across devices.

    Returns logits [res^3] f32 in the natural (x-major) grid order.
    """
    if interpret is None and device_mesh is not None:
        # the kernel runs on the mesh's devices, not the default backend
        interpret = device_mesh.devices.flat[0].platform != "tpu"
    brick = _brick_shape(res, tile)
    if brick is None and tile > 1024:
        # brick compactness (-> member culling) is worth more than a larger
        # tile: e.g. res 400 has no 2048-point brick but an (8, 8, 16) one
        # at 1024 (measured: natural-order tiles barely cull)
        smaller = _brick_shape(res, 1024)
        if smaller is not None:
            tile, brick = 1024, smaller
    axes = [
        jnp.linspace(mini[i], maxi[i], res, dtype=jnp.float32)
        for i in range(3)
    ]
    n = res * res * res
    lin = jnp.arange(n, dtype=jnp.int32)

    def eval_lin(p, l, lin_part):
        pts = _brick_points(axes, lin_part, res, brick, tile)
        return nphm_sdf_pallas(
            p, cfg, pts, l,
            tile=tile, dtype=dtype, cull_eps=cull_eps, group=group,
            interpret=interpret,
        )

    if device_mesh is None:
        sdf_brick = eval_lin(params, lat, lin)
    else:
        from jax.sharding import PartitionSpec as P

        axis = device_mesh.axis_names[0]
        n_dev = device_mesh.devices.size
        if n % (n_dev * tile):
            raise ValueError(
                f"res^3={n} must split into whole tiles across {n_dev} devices"
            )
        sdf_brick = jax.shard_map(
            eval_lin,
            mesh=device_mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,  # pallas_call out_shape carries no vma info
        )(params, lat, lin)
    return sdf_brick[_unbrick_gather(res, brick, tile)]


def apply_nphm_pallas(params, cfg: NPHMConfig, xyz, lat, **kw):
    """Drop-in for ``apply_nphm(..., training=False)`` on [B, N, 3] input.

    Returns (sdf [B, N, 1], anchors [B, n_loc, 3]).  B is looped serially
    (extraction always runs B=1).
    """
    B = xyz.shape[0]
    anchors = predict_anchors(params, cfg, jnp.reshape(lat, (B, cfg.lat_dim)))
    sdfs = [
        nphm_sdf_pallas(params, cfg, xyz[b], lat[b], **kw)[:, None]
        for b in range(B)
    ]
    return jnp.stack(sdfs, axis=0), anchors
