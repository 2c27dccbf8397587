"""Training losses.

Behavioral spec: reference ``src/NPHM/models/loss_functions.py``:

- ``identity_sdf_loss`` == ``actual_compute_loss`` (:20-110): IGR-style SDF
  supervision — |sdf| on surface points, normal alignment (clamped at 0.75
  and halved for non-face points), eikonal |grad|-1 everywhere, exp(-10|sdf|)
  repulsion at far points, latent L2, anchor MSE, and symmetric/middle
  latent-pair consistency for the ensemble decoder.
- ``deformation_loss`` == ``compute_loss_corresp_forward`` (:282-322):
  MSE(neutral + delta, posed) correspondence loss, expression-latent L2, and
  a zero-deformation prior at random points in [-1.25, 1.25]^3.

TPU-first: the four point sets of the identity loss are concatenated into one
decoder call + one gradient pass (the reference runs four separate
forward/backward pairs); results are sliced back per set.  All shapes are
static; per-set weighting is unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nphm_tpu.models.fields import spatial_gradient
from nphm_tpu.utils.math import safe_l2norm, sq_norm


def latent_pair_consistency(decoder, lat):
    """Symmetric-pair and middle-pair latent consistency terms
    (reference loss_functions.py:74-85)."""
    g, l = decoder.lat_dim_glob, decoder.lat_dim_loc
    n_symm = decoder.n_symm_pairs
    n_kps = decoder.n_loc
    B = lat.shape[0]
    loc_symm = lat[:, g : g + 2 * n_symm * l].reshape(B, 2 * n_symm, l)
    symm_dist = jnp.mean(safe_l2norm(loc_symm[:, ::2] - loc_symm[:, 1::2]))
    loc_middle = lat[:, g + 2 * n_symm * l : -l].reshape(B, n_kps - 2 * n_symm, l)
    if loc_middle.shape[1] < 2:  # no middle pairs to compare
        return symm_dist, jnp.zeros(())
    if loc_middle.shape[1] % 2 == 0:
        middle = safe_l2norm(loc_middle[:, ::2] - loc_middle[:, 1::2])
    else:
        middle = safe_l2norm(loc_middle[:, :-1:2] - loc_middle[:, 1::2])
    return symm_dist, jnp.mean(middle)


def identity_sdf_loss(
    decoder,
    params,
    batch: Dict[str, jnp.ndarray],
    lat: jnp.ndarray,
    *,
    training: bool = True,
    remat: bool = True,
    fields_fn=None,
) -> Dict[str, jnp.ndarray]:
    """IGR identity-SDF loss dict.

    batch keys: points_face [B,Nf,3], normals_face, points_non_face [B,Nn,3],
    normals_non_face, sup_grad_far [B,Fa,3], sup_grad_near [B,Ne,3],
    gt_anchors [B,K,3] (ensemble decoder only).
    lat: [B, lat_dim] (already gathered + renormed rows).

    remat: rematerialize the decoder forward in the backward pass.  The
    eikonal term makes the step a double backprop; at the reference batch
    (32 x 2125 points x 40 ensemble members) the saved activations exceed a
    v5e's 16 GB HBM (measured 19 GB) — checkpointing trades one extra
    forward for fitting comfortably.

    fields_fn: optional fused (sdf, grads, anchors) provider with signature
    ``(params, pts [B,N,3], lat) -> (sdf [B,N,1], grads [B,N,3], anchors)``
    replacing the decoder-apply + spatial_gradient pair — the hook for the
    Pallas training kernel (ops/pallas_train.py).  It handles its own
    rematerialization, so ``remat`` is ignored.
    """
    pf, pn = batch["points_face"], batch["points_non_face"]
    far, near = batch["sup_grad_far"], batch["sup_grad_near"]
    n_f, n_n, n_fa = pf.shape[1], pn.shape[1], far.shape[1]

    pts = jnp.concatenate([pf, pn, far, near], axis=1)

    if fields_fn is not None:
        sdf, grads, anchors = fields_fn(params, pts, lat)
    else:
        def field(x):
            sdf, _ = decoder.apply(params, x, lat, training=training)
            return sdf

        if remat:
            field = jax.checkpoint(field)

        sdf = field(pts)
        grads = spatial_gradient(field, pts)
        _, anchors = decoder.apply(
            params, pts[:, :1], lat, training=training
        )  # anchors are point-independent

    sdf_f = sdf[:, :n_f, 0]
    sdf_n = sdf[:, n_f : n_f + n_n, 0]
    sdf_far = sdf[:, n_f + n_n : n_f + n_n + n_fa, 0]
    g_f = grads[:, :n_f]
    g_n = grads[:, n_f : n_f + n_n]

    surf_sdf = jnp.mean(
        jnp.concatenate([jnp.abs(sdf_f), jnp.abs(sdf_n)], axis=1)
    )
    normal_f = safe_l2norm(g_f - batch["normals_face"])
    normal_n = jnp.clip(safe_l2norm(g_n - batch["normals_non_face"]), None, 0.75) / 2.0
    normals = jnp.mean(jnp.concatenate([normal_f, normal_n], axis=1))

    eikonal = jnp.mean(jnp.abs(safe_l2norm(grads, axis=-1) - 1.0))
    space_sdf = jnp.mean(jnp.exp(-10.0 * jnp.abs(sdf_far)))
    lat_reg = jnp.mean(sq_norm(lat))

    out = {
        "surf_sdf": surf_sdf,
        "normals": normals,
        "space_sdf": space_sdf,
        "grad": eikonal,
        "lat_reg": lat_reg,
    }
    if anchors is not None and "gt_anchors" in batch:
        out["anchors"] = jnp.mean((anchors - batch["gt_anchors"]) ** 2)
        symm, middle = latent_pair_consistency(decoder, lat)
        out["symm_dist"] = symm
        out["middle_dist"] = middle
    return out


def deformation_loss(
    decoder_expr,
    params_expr,
    batch: Dict[str, jnp.ndarray],
    lat_shape: jnp.ndarray,
    lat_expr: jnp.ndarray,
    anchors: Optional[jnp.ndarray],
    rng: Optional[jax.Array] = None,
    *,
    training: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Forward-deformation correspondence loss dict.

    batch keys: points_neutral [B,N,3], points_posed [B,N,3].
    lat_shape: [B, D_id] frozen identity codes; lat_expr: [B, E].
    anchors: [B, K, 3] predicted from the frozen identity decoder, or None.
    """
    lat = jnp.concatenate([lat_shape, lat_expr], axis=-1)
    pn = batch["points_neutral"]
    B, N, _ = pn.shape

    if rng is not None:
        rng_noise, rng_samps, rng_noise2 = jax.random.split(rng, 3)
    else:
        rng_noise = rng_samps = rng_noise2 = None
    delta, _ = decoder_expr.apply(
        params_expr, pn, lat, anchors, training=training, rng=rng_noise
    )
    pred_posed = pn + delta
    corresp = jnp.mean((pred_posed - batch["points_posed"][..., :3]) ** 2)

    lat_reg = jnp.mean(sq_norm(lat_expr))

    # zero-deformation prior at uniform random points in [-1.25, 1.25]^3
    n_samps = min(100, N)
    samps = (
        jax.random.uniform(rng_samps, (B, n_samps, 3), pn.dtype) - 0.5
    ) * 2.5
    delta_reg, _ = decoder_expr.apply(
        params_expr, samps, lat, anchors, training=training, rng=rng_noise2
    )
    reg_zero = jnp.mean(delta_reg**2)

    return {"corresp": corresp, "lat_reg": lat_reg, "loss_reg_zero": reg_zero}
