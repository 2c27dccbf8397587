"""Global conditioned DeepSDF decoder (the "NPM" model family).

Behavioral spec: reference ``src/NPHM/models/deepSDF.py:6-89`` — an
``n_layers`` x ``hidden_dim`` MLP over ``[PE(xyz), z]`` with a mid-trunk skip
connection (``cat/sqrt(2)``), Softplus(beta=100) activations, and geometric
initialization of the last layer to a sphere SDF.

TPU-first design choice: the latent code is constant along the point axis in
every caller (training batches, fitting, dense grid evaluation), so instead of
materializing ``[B, N, lat_dim]`` and running matmuls over ``3 + lat_dim``
inputs, the latent contribution of the input layer and of the skip layer is
folded into per-batch-row biases computed once.  For the NPM identity net
(lat 512, hidden 1024) this removes ~99% of the input-layer FLOPs and all of
the broadcast HBM traffic while computing exactly the same function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nphm_tpu.models.mlp import (
    geometric_last_layer_init,
    linear,
    mlp_dims,
    positional_encoding,
    softplus_beta,
    torch_linear_init,
)

SQRT2 = 1.4142135623730951


@dataclasses.dataclass(frozen=True)
class DeepSDFConfig:
    lat_dim: int
    hidden_dim: int
    n_layers: int = 8
    geometric_init: bool = True
    radius_init: float = 1.0
    beta: float = 100.0
    out_dim: int = 1
    num_freq_bands: int | None = None
    input_dim: int = 3

    @property
    def d_in_spatial(self) -> int:
        if self.num_freq_bands is None:
            return self.input_dim
        return self.input_dim * (2 * self.num_freq_bands + 1)

    @property
    def d_in(self) -> int:
        return self.lat_dim + self.d_in_spatial

    @property
    def layer_shapes(self):
        return mlp_dims(self.d_in, self.hidden_dim, self.n_layers, self.out_dim)


def init_deepsdf(key, cfg: DeepSDFConfig, dtype=jnp.float32):
    shapes, _skip = cfg.layer_shapes
    n = len(shapes)
    keys = jax.random.split(key, n)
    layers = []
    for i, (d_in, d_out) in enumerate(shapes):
        if cfg.geometric_init and i == n - 1:
            layers.append(geometric_last_layer_init(keys[i], d_in, d_out, cfg.radius_init, dtype))
        else:
            layers.append(torch_linear_init(keys[i], d_in, d_out, dtype))
    return {"layers": layers}


def _trunk(params, cfg: DeepSDFConfig, pe, lat):
    """Shared trunk with the latent columns folded into per-row biases.

    pe:  [..., N, d_spatial]  point-dependent features
    lat: [..., 1 or N, lat_dim] (broadcastable against pe's batch dims)
    """
    shapes, skip_in = cfg.layer_shapes
    layers = params["layers"]
    n = len(layers)
    ds = cfg.d_in_spatial

    x = pe
    for i in range(n):
        w, b = layers[i]["w"], layers[i]["b"]
        if i == 0:
            # [W_spatial | W_lat]: lat part becomes a per-row bias.
            x = (
                jnp.einsum("...i,oi->...o", pe, w[:, :ds])
                + jnp.einsum("...i,oi->...o", lat, w[:, ds:])
                + b
            )
        elif i == skip_in:
            # skip: cat([x, pe, lat]) / sqrt(2), again splitting the matrix.
            h = w.shape[1] - cfg.d_in
            x = (
                jnp.einsum("...i,oi->...o", x, w[:, :h])
                + jnp.einsum("...i,oi->...o", pe, w[:, h : h + ds])
                + jnp.einsum("...i,oi->...o", lat, w[:, h + ds :])
            ) / SQRT2 + b
        else:
            x = linear(layers[i], x)
        if i < n - 1:
            x = softplus_beta(x, cfg.beta) if cfg.beta > 0 else jax.nn.relu(x)
    return x


def apply_deepsdf(params, cfg: DeepSDFConfig, xyz, lat):
    """Evaluate the decoder.

    xyz: [..., N, input_dim]
    lat: [..., lat_dim] (constant per batch row) or [..., N, lat_dim]
    returns sdf/offsets: [..., N, out_dim]
    """
    pe = positional_encoding(xyz, cfg.num_freq_bands)
    if lat.ndim == xyz.ndim - 1:
        lat = lat[..., None, :]
    return _trunk(params, cfg, pe, lat)
