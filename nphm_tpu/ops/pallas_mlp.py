"""Fused Pallas kernel for DeepSDF-style conditioned MLP trunks (eval mode).

STATUS — exposed op, not routed by default.  Head-to-head on a v5e the
chunked XLA paths win for BOTH production trunks (NPM 8x1024: 11.3 vs
4.0 Mq/s at res 256; deformation 6x512: 22.4 vs 14.2 Mv/s at 1M points):
DeepSDF trunks are large square matmuls, exactly the regime XLA already
runs near peak, and the layer-streaming design pays padding + per-step
costs without a compensating fusion win (unlike the 40-member ensemble,
whose [members, N, hidden] HBM traffic the ensemble kernel eliminates).
The kernel is kept (tested, interpret-exact) as the building block for
narrow/custom trunks where weight residency does pay.

Design — grid = (point_tiles, layers), TRANSPOSED data flow:

- Layer weights are zero-padded to one uniform ``[L, H, H + ds]`` tensor in
  HBM and streamed one layer per grid step (NPM's ~33 MB of f32 weights
  cannot sit in VMEM; a 4 MB layer block double-buffers fine).  The input
  vector of every layer is a persistent VMEM scratch ``hx`` whose first H
  rows hold the current hidden state and whose last ``ds`` rows hold the
  (positionally encoded) spatial features — so layer 0, the mid-trunk skip
  (``cat/sqrt(2)``, reference deepSDF.py:82) and plain layers are all the
  SAME ``[H, H+ds] @ [H+ds, T]`` matmul, with the wiring expressed purely
  in how the padded weights are laid out.
- The conditioning code is constant along points, so its input-layer and
  skip-layer contributions fold into per-layer biases outside the kernel.
- Points live on the lane axis; per-layer compute is one MXU matmul plus a
  Softplus(100) on ``[H, T]``.

Only the no-grad forward is provided (training/fitting differentiate
through the XLA path).  Per-point conditioning (deformation mode
``interpolate``) is not expressible here — callers fall back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nphm_tpu.models.deepsdf import DeepSDFConfig, positional_encoding

DEFAULT_TILE = None  # auto: 512 lanes, 256 for wide (>512) trunks (VMEM)
SQRT2 = 1.4142135623730951


def _auto_tile(cfg: DeepSDFConfig) -> int:
    # scratch [H+ds, T] + z [H, T] + 2x weight blocks [H, H+ds] must fit
    # the ~16 MB VMEM budget; 1024-wide trunks need the smaller tile.
    return 256 if cfg.hidden_dim > 512 else 512


def prepare_trunk_operands(params, cfg: DeepSDFConfig, cond, dtype=jnp.float32):
    """Pad per-layer weights into one uniform tensor; fold cond into biases.

    params: {"layers": [{"w" [out, in], "b" [out]}, ...]} (our DeepSDF).
    cond: [lat_dim] conditioning code (constant along points) or None when
    ``cfg.lat_dim == 0``.

    Returns (W [L, H, H+ds], B [L, H, 1], H) with the convention that the
    trunk input/output of every layer lives in rows [0:width] and spatial
    features in rows [H:H+ds] of the layer-input vector.
    """
    shapes, skip_in = cfg.layer_shapes
    n_layers = len(shapes)
    ds = cfg.d_in_spatial
    # H spans only the *hidden* portion of each layer input/output: spatial
    # features ride in rows [H:H+ds] and conditioning is folded into biases,
    # so layer-0's full (spatial+cond) input width must NOT inflate the
    # padded [L, H, H+ds] tensor (wide conditioning would balloon it with
    # all-zero columns and waste VMEM).
    H = max(
        max(s_out for _, s_out in shapes),
        max(
            0 if i == 0 else (s_in - cfg.d_in if i == skip_in else s_in)
            for i, (s_in, _) in enumerate(shapes)
        ),
        cfg.hidden_dim,
    )
    if cond is not None:
        cond = jnp.reshape(cond, (cfg.lat_dim,))

    Ws, Bs = [], []
    for i, (s_in, s_out) in enumerate(shapes):
        w = params["layers"][i]["w"]  # [out, in]
        b = params["layers"][i]["b"].astype(jnp.float32)
        wp = jnp.zeros((H, H + ds), jnp.float32)
        if i == 0:
            # in = [spatial, cond]
            wp = wp.at[:s_out, H : H + ds].set(w[:, :ds])
            if cond is not None:
                b = b + w[:, ds:] @ cond
        elif i == skip_in:
            # in = [hidden, spatial, cond] / sqrt2
            h_w = w.shape[1] - cfg.d_in
            wp = wp.at[:s_out, :h_w].set(w[:, :h_w] / SQRT2)
            wp = wp.at[:s_out, H : H + ds].set(w[:, h_w : h_w + ds] / SQRT2)
            if cond is not None:
                b = b + (w[:, h_w + ds :] @ cond) / SQRT2
        else:
            wp = wp.at[:s_out, :s_in].set(w)
        bp = jnp.zeros((H,), jnp.float32).at[: b.shape[0]].set(b)
        Ws.append(wp.astype(dtype))
        Bs.append(bp)
    return jnp.stack(Ws), jnp.stack(Bs)[:, :, None], H


def _make_kernel(cfg: DeepSDFConfig, tile: int, H: int, dtype):
    shapes, _ = cfg.layer_shapes
    n_layers = len(shapes)
    ds = cfg.d_in_spatial
    out_dim = cfg.out_dim
    beta = cfg.beta

    def act(x):
        if beta <= 0:
            return jnp.maximum(x, 0.0)
        bx = beta * x
        return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)

    def kernel(q_ref, w_ref, b_ref, out_ref, hx_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            hx_ref[:] = jnp.zeros((H + ds, tile), jnp.float32)
            hx_ref[H:, :] = q_ref[:]

        z = (
            jnp.dot(
                w_ref[0],
                hx_ref[:].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + b_ref[0]
        )  # [H, T]

        @pl.when(l < n_layers - 1)
        def _():
            hx_ref[:H, :] = act(z)

        @pl.when(l == n_layers - 1)
        def _():
            out_ref[:] = z[:out_dim, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile", "dtype", "interpret")
)
def deepsdf_trunk_pallas(
    params,
    cfg: DeepSDFConfig,
    xyz,
    cond,
    *,
    tile: int | None = DEFAULT_TILE,
    dtype=jnp.float32,
    interpret: bool | None = None,
):
    """Fused trunk evaluation.

    xyz: [N, 3] points; cond: [lat_dim] row-constant conditioning (or None).
    Returns [N, out_dim] f32; matches ``apply_deepsdf`` up to matmul
    precision.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = _auto_tile(cfg)
    if tile % 128:
        raise ValueError("tile must be a multiple of 128")
    shapes, _ = cfg.layer_shapes
    n_layers = len(shapes)
    ds = cfg.d_in_spatial

    n = xyz.shape[0]
    pad = (-n) % tile
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], axis=0)
    grid_t = xyz.shape[0] // tile

    pe = positional_encoding(xyz.astype(jnp.float32), cfg.num_freq_bands)
    W, B, H = prepare_trunk_operands(params, cfg, cond, dtype)

    flops = 2 * grid_t * tile * n_layers * H * (H + ds)
    out = pl.pallas_call(
        _make_kernel(cfg, tile, H, dtype),
        grid=(grid_t, n_layers),
        in_specs=[
            pl.BlockSpec(
                (ds, tile), lambda t, l: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, H + ds), lambda t, l: (l, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H, 1), lambda t, l: (l, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.out_dim, tile), lambda t, l: (0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.out_dim, grid_t * tile), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((H + ds, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xyz.size * 4 + grid_t * tile * cfg.out_dim * 4,
            transcendentals=grid_t * tile * n_layers * H,
        ),
        interpret=interpret,
    )(jnp.transpose(pe), W, B)
    return jnp.transpose(out)[:n]


def npm_sdf_pallas(params, cfg: DeepSDFConfig, xyz, lat, **kw):
    """NPM identity SDF over [N, 3] points with latent [lat_dim]."""
    return deepsdf_trunk_pallas(
        params, cfg, xyz, jnp.reshape(lat, (cfg.lat_dim,)), **kw
    )[:, 0]


def deformation_pallas(params, dcfg, xyz, lat, anchors=None, **kw):
    """Eval-mode forward deformation offsets via the fused trunk kernel.

    xyz: [N, 3]; lat: [lat_dim_shape_full + lat_dim_expr]; anchors [K, 3]
    (required for compress/GNN).  Row-constant conditioning modes only
    (everything but 'interpolate').  Returns delta [N, 3] f32.
    """
    from nphm_tpu.models.deformation import conditioning_code

    cond = conditioning_code(params, dcfg, lat, anchors)
    out = deepsdf_trunk_pallas(params["trunk"], dcfg.trunk_cfg, xyz, cond, **kw)
    return out[:, :3]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mini", "maxi", "res", "tile", "dtype", "interpret"),
)
def npm_grid_sdf_pallas(
    params,
    cfg: DeepSDFConfig,
    lat,
    mini,
    maxi,
    res: int,
    *,
    tile: int | None = DEFAULT_TILE,
    dtype=jnp.float32,
    interpret: bool | None = None,
):
    """Dense-grid NPM SDF, grid generated on device (x-major order).

    No member culling exists for the global MLP, so natural ordering is
    used; the win over the chunked XLA path is fused activations (nothing
    of shape [N, hidden] touches HBM) and no host->device point shipping.
    Returns logits [res^3] f32.
    """
    axes = [
        jnp.linspace(mini[i], maxi[i], res, dtype=jnp.float32)
        for i in range(3)
    ]
    n = res * res * res
    lin = jnp.arange(n, dtype=jnp.int32)
    ix = lin // (res * res)
    iy = (lin // res) % res
    iz = lin % res
    pts = jnp.stack([axes[0][ix], axes[1][iy], axes[2][iz]], axis=-1)
    return npm_sdf_pallas(
        params, cfg, pts, lat, tile=tile, dtype=dtype, interpret=interpret
    )
