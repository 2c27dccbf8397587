"""The NPHM identity decoder: an ensemble of local SDF MLPs at facial anchors.

Behavioral spec: reference ``src/NPHM/models/EnsembledDeepSDF.py``:
- 40 small DeepSDF MLPs (39 anchored + 1 global "background"), evaluated for
  every query point and blended with a Gaussian kernel on point-to-anchor
  distance (``sample_point_feature``, :129-150).
- Symmetric weight sharing: the first ``2*n_symm_pairs`` members use
  ``n_symm_pairs`` distinct weight sets (each pair shares), and odd pair
  members see x-mirrored local coordinates (:43-45, :244).
- Anchor positions are predicted from the global latent by a 3-layer MLP as
  offsets to the dataset-mean anchors (:194-200, :228-229).
- Latent layout: ``[z_glob(G), z_1, z*_1, ..., z_{n_loc}, z_bg]`` with one
  local code per member (:171, :212).
- At eval time the background member's SDF is pinned to 1 (:260-261).
  NOTE: the reference line ``sdf_pred[:, :, -1, 0] = 1`` indexes a tensor of
  shape [members, batch, points, out], so it actually pins the last *point*
  across all members rather than the background member the comment intends
  (the permute to [batch, points, members, out] happens afterwards, :263).
  We implement the documented intent: the *background member* reports
  "outside" at eval time.

TPU-first design:
- One parameter tensor per layer, shape ``[n_distinct, out, in]``; the
  symmetric expansion to 40 members is a gather with a static index map, so
  the whole ensemble layer is a single batched matmul on the MXU.
- The per-member conditioning ``[z_glob, z_k]`` is constant along the point
  axis, so its input-layer and skip-layer contributions are folded into
  per-(member, batch) biases computed once per call.  Point matmuls touch
  only the 3 local coordinates; nothing of shape [B, N, members, lat] is
  ever materialized.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nphm_tpu.models.mlp import linear, mlp_dims, softplus_beta, torch_linear_init
from nphm_tpu.utils.math import safe_l2norm

SQRT2 = 1.4142135623730951


@dataclasses.dataclass(frozen=True)
class NPHMConfig:
    lat_dim_glob: int = 64
    lat_dim_loc: int = 32
    n_loc: int = 39
    n_symm_pairs: int = 16
    hidden_dim: int = 200
    n_layers: int = 4
    pos_mlp_dim: int = 256
    out_dim: int = 1
    input_dim: int = 3
    beta: float = 100.0
    blend_var: float = 0.1**2
    blend_background_dist: float = -0.2

    @property
    def n_members(self) -> int:
        return self.n_loc + 1

    @property
    def n_distinct(self) -> int:
        return self.n_members - self.n_symm_pairs

    @property
    def lat_dim(self) -> int:
        return self.lat_dim_glob + self.n_members * self.lat_dim_loc

    @property
    def lat_dim_part(self) -> int:
        return self.lat_dim_glob + self.lat_dim_loc

    @property
    def d_in(self) -> int:
        return self.input_dim + self.lat_dim_part

    @property
    def member_map(self) -> np.ndarray:
        """Distinct-weight index for each of the 40 members.

        [0,0,1,1,...,s-1,s-1, s, s+1, ...]: pair (2k, 2k+1) shares weight k.
        """
        pairs = np.repeat(np.arange(self.n_symm_pairs), 2)
        rest = np.arange(self.n_symm_pairs, self.n_distinct)
        return np.concatenate([pairs, rest]).astype(np.int32)

    @property
    def mirror_sign(self) -> np.ndarray:
        """Per-member sign on the local x coordinate (-1 for odd pair members)."""
        sign = np.ones(self.n_members, dtype=np.float32)
        sign[1 : 2 * self.n_symm_pairs : 2] = -1.0
        return sign

    @property
    def layer_shapes(self):
        return mlp_dims(self.d_in, self.hidden_dim, self.n_layers, self.out_dim)


def _init_ensembled_linear(key, n_distinct, d_in, d_out, dtype=jnp.float32):
    """Per-member torch-default Linear init, vectorized over members."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(kw, (n_distinct, d_out, d_in), dtype, -bound, bound)
    b = jax.random.uniform(kb, (n_distinct, d_out), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nphm(key, cfg: NPHMConfig, mean_anchors, dtype=jnp.float32):
    """Returns the full NPHM parameter pytree.

    mean_anchors: [n_loc, 3] dataset-mean anchor positions (held fixed).
    """
    shapes, _ = cfg.layer_shapes
    keys = jax.random.split(key, len(shapes) + 3)
    ensemble = [
        _init_ensembled_linear(keys[i], cfg.n_distinct, s_in, s_out, dtype)
        for i, (s_in, s_out) in enumerate(shapes)
    ]
    g, p = cfg.lat_dim_glob, cfg.pos_mlp_dim
    mlp_pos = [
        torch_linear_init(keys[-3], g, p, dtype),
        torch_linear_init(keys[-2], p, p, dtype),
        torch_linear_init(keys[-1], p, cfg.n_loc * 3, dtype),
    ]
    return {
        "ensemble": ensemble,
        "mlp_pos": mlp_pos,
        "mean_anchors": jnp.asarray(mean_anchors, dtype),
    }


def predict_anchors(params, cfg: NPHMConfig, lat):
    """Anchor positions from the global latent. lat: [..., lat_dim] -> [..., n_loc, 3]."""
    z_glob = lat[..., : cfg.lat_dim_glob]
    h = jax.nn.relu(linear(params["mlp_pos"][0], z_glob))
    h = jax.nn.relu(linear(params["mlp_pos"][1], h))
    offsets = linear(params["mlp_pos"][2], h)
    offsets = offsets.reshape(offsets.shape[:-1] + (cfg.n_loc, 3))
    return offsets + jax.lax.stop_gradient(params["mean_anchors"])


def _split_cond(cfg: NPHMConfig, lat):
    """lat [B, lat_dim] -> per-member cond [B, n_members, G+L]."""
    z_glob = lat[..., : cfg.lat_dim_glob]
    z_loc = lat[..., cfg.lat_dim_glob :].reshape(
        lat.shape[:-1] + (cfg.n_members, cfg.lat_dim_loc)
    )
    z_glob = jnp.broadcast_to(
        z_glob[..., None, :], z_loc.shape[:-1] + (cfg.lat_dim_glob,)
    )
    return jnp.concatenate([z_glob, z_loc], axis=-1)


def _expand(cfg: NPHMConfig, t):
    """Gather distinct weights to the full member axis (symmetric sharing)."""
    return jnp.take(t, jnp.asarray(cfg.member_map), axis=0)


def ensemble_trunk(params_ensemble, cfg: NPHMConfig, coords, cond):
    """Evaluate all ensemble MLPs with conditioning folded into biases.

    coords: [A, B, N, 3]   per-member local coordinates
    cond:   [B, A, C]      per-member conditioning (constant over N)
    returns [A, B, N, out_dim]
    """
    shapes, skip_in = cfg.layer_shapes
    n = len(params_ensemble)
    ds = cfg.input_dim

    cond_a = jnp.transpose(cond, (1, 0, 2))  # [A, B, C]
    x = coords
    for i in range(n):
        w = _expand(cfg, params_ensemble[i]["w"])  # [A, out, in]
        b = _expand(cfg, params_ensemble[i]["b"])  # [A, out]
        if i == 0:
            bias = jnp.einsum("abc,aoc->abo", cond_a, w[:, :, ds:]) + b[:, None, :]
            x = (
                jnp.einsum("abni,aoi->abno", coords, w[:, :, :ds])
                + bias[:, :, None, :]
            )
        elif i == skip_in:
            h = w.shape[2] - cfg.d_in
            bias = jnp.einsum("abc,aoc->abo", cond_a, w[:, :, h + ds :]) / SQRT2
            x = (
                (
                    jnp.einsum("abni,aoi->abno", x, w[:, :, :h])
                    + jnp.einsum("abni,aoi->abno", coords, w[:, :, h : h + ds])
                )
                / SQRT2
                + bias[:, :, None, :]
                + b[:, None, None, :]
            )
        else:
            x = jnp.einsum("abni,aoi->abno", x, w) + b[:, None, None, :]
        if i < n - 1:
            x = softplus_beta(x, cfg.beta)
    return x


def gaussian_blend(q, anchors, member_preds, var, background_dist):
    """Blend per-member predictions with a normalized Gaussian kernel.

    q: [B, N, 3] query points; anchors: [B, K, 3]; member_preds: [B, N, K+1, C].
    The background member gets a constant kernel distance (reference
    EnsembledDeepSDF.py:129-150).
    """
    d = safe_l2norm(anchors[:, None, :, :] - q[:, :, None, :], axis=-1)
    dist = -((d + 1e-5) ** 2)  # [B, N, K]
    dist = jnp.concatenate(
        [dist, jnp.full_like(dist[..., :1], background_dist)], axis=-1
    )
    weight = jnp.exp(dist / var)
    weight = weight / (jnp.sum(weight, axis=-1, keepdims=True) + 1e-6)
    return jnp.sum(weight[..., None] * member_preds, axis=2)


def apply_nphm(params, cfg: NPHMConfig, xyz, lat, *, training: bool = False):
    """NPHM identity SDF.

    xyz: [B, N, 3]; lat: [B, lat_dim] (constant along points).
    Returns (sdf [B, N, out_dim], anchors [B, n_loc, 3]).
    """
    B, N, _ = xyz.shape
    anchors = predict_anchors(params, cfg, lat)  # [B, n_loc, 3]

    # local coordinates per member; the background member uses global coords
    centers = jnp.concatenate(
        [anchors, jnp.zeros_like(anchors[:, :1, :])], axis=1
    )  # [B, A, 3]
    coords = xyz[:, :, None, :] - centers[:, None, :, :]  # [B, N, A, 3]
    sign = jnp.asarray(cfg.mirror_sign)
    coords = coords * jnp.concatenate(
        [sign[None, None, :, None], jnp.ones((1, 1, cfg.n_members, 2))], axis=-1
    )

    cond = _split_cond(cfg, lat)  # [B, A, G+L]
    coords_a = jnp.transpose(coords, (2, 0, 1, 3))  # [A, B, N, 3]
    preds = ensemble_trunk(params["ensemble"], cfg, coords_a, cond)  # [A,B,N,out]

    if not training:
        # background member always reports "outside"
        preds = preds.at[-1, :, :, 0].set(1.0)

    preds = jnp.transpose(preds, (1, 2, 0, 3))  # [B, N, A, out]
    sdf = gaussian_blend(
        xyz, anchors, preds, cfg.blend_var, cfg.blend_background_dist
    )
    return sdf, anchors
