"""Forward deformation field F_ex: canonical -> posed offsets.

Behavioral spec: reference ``src/NPHM/models/deepSDF.py:118-239``
(DeformationNetwork).  A DeepSDF trunk (no geometric init) predicts 3D
offsets conditioned on the expression code plus an identity summary whose
form depends on ``mode``:

- ``compress`` (the shipped configs): project ``[z_id, anchors]`` (1461-d for
  NPHM dims) through one Linear to 32-d, add N(0,1)/200 noise at train time,
  and condition on ``[compressed, z_ex]`` (:153-156, :212-223).
- ``glob_only``: condition on ``[z_id_glob, z_ex]``.
- ``expr_only``: condition on ``z_ex`` alone.
- ``interpolate``: condition on ``[z_id_glob, blend(z_id_loc at anchors), z_ex]``
  where the local identity codes are Gaussian-blended per query point.
- ``GNN``: anchor-position-encoded local codes combined into a global summary.

The expression latent layout at call sites is ``lat = [z_id(full), z_ex]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nphm_tpu.models.deepsdf import DeepSDFConfig, apply_deepsdf, init_deepsdf
from nphm_tpu.models.mlp import linear, torch_linear_init
from nphm_tpu.utils.math import safe_l2norm


@dataclasses.dataclass(frozen=True)
class DeformationConfig:
    mode: str = "compress"
    lat_dim_expr: int = 200
    lat_dim_id: int = 32  # compressed identity dim (mode == 'compress')
    lat_dim_glob_shape: int = 64
    lat_dim_loc_shape: int = 32
    n_loc: int = 39
    hidden_dim: int = 512
    n_layers: int = 6
    out_dim: int = 3
    input_dim: int = 3
    noise_scale: float = 1.0 / 200.0

    @property
    def lat_dim_shape_full(self) -> int:
        return self.lat_dim_glob_shape + (self.n_loc + 1) * self.lat_dim_loc_shape

    @property
    def lat_dim(self) -> int:
        """Conditioning width of the inner trunk."""
        if self.mode == "glob_only":
            return self.lat_dim_glob_shape + self.lat_dim_expr
        if self.mode == "expr_only":
            return self.lat_dim_expr
        if self.mode == "interpolate":
            return self.lat_dim_glob_shape + self.lat_dim_expr + self.lat_dim_loc_shape
        if self.mode == "compress":
            return self.lat_dim_expr + self.lat_dim_id
        if self.mode == "GNN":
            return self.lat_dim_expr * 2
        raise ValueError(f"Unknown deformation mode: {self.mode}")

    @property
    def compressor_in(self) -> int:
        return (
            (self.lat_dim_loc_shape + 3) * self.n_loc
            + self.lat_dim_loc_shape
            + self.lat_dim_glob_shape
        )

    @property
    def trunk_cfg(self) -> DeepSDFConfig:
        return DeepSDFConfig(
            lat_dim=self.lat_dim,
            hidden_dim=self.hidden_dim,
            n_layers=self.n_layers,
            geometric_init=False,
            out_dim=self.out_dim,
            input_dim=self.input_dim,
        )


def init_deformation(key, cfg: DeformationConfig, dtype=jnp.float32):
    k_trunk, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
    params = {"trunk": init_deepsdf(k_trunk, cfg.trunk_cfg, dtype)}
    if cfg.mode == "compress":
        params["compressor"] = torch_linear_init(
            k1, cfg.compressor_in, cfg.lat_dim_id, dtype
        )
    elif cfg.mode == "GNN":
        L, G, E = cfg.lat_dim_loc_shape, cfg.lat_dim_glob_shape, cfg.lat_dim_expr
        params["pos_enc"] = [
            torch_linear_init(k1, 3, L, dtype),
            torch_linear_init(k2, L, L, dtype),
        ]
        params["local_combiner"] = [
            torch_linear_init(k3, L, L, dtype),
            torch_linear_init(k4, L, L, dtype),
        ]
        params["global_combiner"] = [
            torch_linear_init(k5, G + cfg.n_loc * L, 512, dtype),
            torch_linear_init(k6, 512, E, dtype),
        ]
    return params


def _interp_local(q, anchors, loc_lat, var=0.1**2):
    """Per-point Gaussian blend of local identity codes (no background)."""
    d = safe_l2norm(anchors[:, None, :, :] - q[:, :, None, :], axis=-1)
    w = jnp.exp(-((d + 1e-5) ** 2) / var)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
    return jnp.einsum("bnk,bkc->bnc", w, loc_lat)


def conditioning_code(params, cfg: DeformationConfig, lat, anchors=None):
    """Row-constant conditioning code for the trunk (eval mode, no noise).

    lat: [lat_dim_shape_full + lat_dim_expr] (single row); anchors [K, 3].
    Valid for every mode except 'interpolate', whose conditioning is
    per-point.  Used by the fused eval kernel (ops/pallas_mlp.py).
    """
    if cfg.mode == "interpolate":
        raise ValueError("'interpolate' conditioning is per-point")
    lat = jnp.reshape(lat, (1, -1))
    anchors_b = None if anchors is None else jnp.reshape(anchors, (1, -1, 3))
    cond = _conditioning(params, cfg, lat, anchors_b, training=False, rng=None)
    return cond[0]


def _conditioning(params, cfg, lat, anchors, *, training, rng):
    B = lat.shape[0]
    E = cfg.lat_dim_expr
    z_ex = lat[..., -E:]
    if cfg.mode == "glob_only":
        return jnp.concatenate([lat[..., : cfg.lat_dim_glob_shape], z_ex], axis=-1)
    if cfg.mode == "expr_only":
        return z_ex
    if cfg.mode == "compress":
        concat = jnp.concatenate(
            [lat[..., :-E], anchors.reshape(B, -1)], axis=-1
        )  # [B, 1461]
        compressed = linear(params["compressor"], concat)  # [B, 32]
        if training:
            assert rng is not None, "compress-mode training needs an rng for noise"
            compressed = compressed + (
                jax.random.normal(rng, compressed.shape, compressed.dtype)
                * cfg.noise_scale
            )
        return jnp.concatenate([compressed, z_ex], axis=-1)
    if cfg.mode == "GNN":
        G, L = cfg.lat_dim_glob_shape, cfg.lat_dim_loc_shape
        pe = linear(
            params["pos_enc"][1], jax.nn.relu(linear(params["pos_enc"][0], anchors))
        )
        loc = lat[..., G : G + cfg.n_loc * L].reshape(B, cfg.n_loc, L)
        local = linear(
            params["local_combiner"][1],
            jax.nn.relu(linear(params["local_combiner"][0], pe + loc)),
        )
        concat = jnp.concatenate([lat[..., :G], local.reshape(B, -1)], axis=-1)
        combined = linear(
            params["global_combiner"][1],
            jax.nn.relu(linear(params["global_combiner"][0], concat)),
        )
        return jnp.concatenate([combined, z_ex], axis=-1)
    raise ValueError(f"Unknown deformation mode: {cfg.mode}")


def apply_deformation(
    params,
    cfg: DeformationConfig,
    xyz,
    lat,
    anchors=None,
    *,
    training: bool = False,
    rng=None,
):
    """Predict deformation offsets.

    xyz: [B, N, 3]; lat: [B, lat_dim_shape_full + lat_dim_expr]
    anchors: [B, n_loc, 3] (required for 'compress'/'interpolate'/'GNN').
    Returns (delta [B, N, 3], extra [B, N, 1]) mirroring the reference's
    ``(pred[..., :3], pred[..., -1:])`` contract.
    """
    B, N, _ = xyz.shape
    E = cfg.lat_dim_expr
    z_ex = lat[..., -E:]

    if cfg.mode != "interpolate":
        cond = _conditioning(
            params, cfg, lat, anchors, training=training, rng=rng
        )
    else:  # 'interpolate': per-point conditioning
        G, L = cfg.lat_dim_glob_shape, cfg.lat_dim_loc_shape
        loc = lat[..., G : G + cfg.n_loc * L].reshape(B, cfg.n_loc, L)
        interp = _interp_local(xyz[..., :3], anchors, loc)  # [B, N, L]
        glob = jnp.broadcast_to(lat[:, None, :G], (B, N, G))
        z_ex_pp = jnp.broadcast_to(z_ex[:, None, :], (B, N, E))
        cond = jnp.concatenate([glob, interp, z_ex_pp], axis=-1)  # per-point

    pred = apply_deepsdf(params["trunk"], cfg.trunk_cfg, xyz, cond)
    return pred[..., :3], pred[..., -1:]
