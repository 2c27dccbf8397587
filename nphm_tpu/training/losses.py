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
- ``joint_loss`` == ``loss_joint`` (:113-279): the joint two-network loss
  (dead code in the reference — no call sites — ported for surface
  completeness and torch-parity tested).

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


def _masked_concat_mean(parts):
    """Mean over a virtual concatenation of (values, mask) groups — the
    jittable equivalent of the reference's ``torch.cat([...]).mean()`` over
    data-dependent row subsets.  mask=None means all rows count."""
    total = 0.0
    count = 0.0
    for values, mask in parts:
        if mask is None:
            total = total + jnp.sum(values)
            count = count + values.size
        else:
            per_row = values.reshape(values.shape[0], -1)
            m = mask.reshape(-1, 1).astype(per_row.dtype)
            total = total + jnp.sum(per_row * m)
            count = count + jnp.sum(m) * per_row.shape[1]
    return total / jnp.maximum(count, 1.0)


def joint_loss(
    decoder_shape,
    params_shape,
    decoder_expr,
    params_expr,
    batch: Dict[str, jnp.ndarray],
    lat_shape: jnp.ndarray,
    lat_expr: jnp.ndarray,
    epoch: int,
    rng: jax.Array,
    *,
    training: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Joint two-network training loss (reference loss_functions.py:113-279
    ``loss_joint`` — present in the reference's public loss surface but
    never called by its pipelines; ported for completeness).

    Supervises the identity SDF through the backward composition
    ``shape(posed + expr_delta(posed))`` on posed-space surface points, with
    neutral-scan-only back-of-head/off-surface terms, an off-surface SDF
    target, canonical far-space eikonal/repulsion, latent and symmetry
    regularizers, anchor supervision, epoch-gated correspondence loss
    (x0.25 after epoch 750, off from 3000), the zero-deformation prior, and
    a neutral-scan zero-deformation term.

    batch keys: points_surface/normals_surface [B,N,3], points_surface_outer/
    normals_surface_outer [B,No,3], points_off_surface/normals_off_surface/
    sdfs_off_surface [B,Nf,3]/[B,Nf,1], sup_grad_far [B,Fa,3], gt_anchors,
    corresp_posed/corresp_neutral [B,Nc,3], is_neutral [B,1].

    TPU-first: the reference's data-dependent neutral-row slicing becomes
    masked means over static shapes (identical values for any batch).
    """
    cond_cat = jnp.concatenate([lat_shape, lat_expr], axis=-1)
    is_neutral = (batch["is_neutral"].reshape(-1) == 1)
    any_neutral = is_neutral.any()
    if rng is not None:
        rngs = list(jax.random.split(rng, 6))
    else:
        rngs = [None] * 6

    def composed(pts, rng_i=0):
        delta, _ = decoder_expr.apply(
            params_expr, pts, cond_cat, None, training=training,
            rng=rngs[rng_i],
        )
        can = pts + delta
        sdf, anchors = decoder_shape.apply(
            params_shape, can, lat_shape, training=training
        )
        return sdf, delta, anchors

    def surf_terms(pts, normals, rng_i):
        grads = spatial_gradient(lambda p: composed(p, rng_i)[0], pts)
        sdf, delta, anchors = composed(pts, rng_i)
        sdf_l = jnp.abs(sdf[..., 0])
        normal_l = safe_l2norm(grads - normals)
        eik_l = jnp.abs(safe_l2norm(grads, axis=-1) - 1.0)
        return sdf_l, normal_l, eik_l, delta, anchors

    # on surface, face (all scans)
    sdf_s, nrm_s, eik_s, delta_s, anchors = surf_terms(
        batch["points_surface"], batch["normals_surface"], 0
    )
    # on surface, back of head (neutral scans only)
    sdf_o, nrm_o, eik_o, delta_o, _ = surf_terms(
        batch["points_surface_outer"], batch["normals_surface_outer"], 1
    )
    nrm_o = jnp.clip(nrm_o, None, 0.75 * 100) / 2  # (sic — reference :154)
    # off surface with SDF targets (neutral scans only)
    grads_f = spatial_gradient(
        lambda p: composed(p, 2)[0], batch["points_off_surface"]
    )
    sdf_f_raw, delta_f, _ = composed(batch["points_off_surface"], 2)
    sdf_f = jnp.abs(sdf_f_raw - batch["sdfs_off_surface"])[..., 0]
    nrm_f = jnp.clip(
        safe_l2norm(grads_f - batch["normals_off_surface"]), None, 0.75 * 100
    ) / 2
    eik_f = jnp.abs(safe_l2norm(grads_f, axis=-1) - 1.0)

    # off surface, canonical space only (all scans)
    far = batch["sup_grad_far"]

    def shape_only(p):
        sdf, _ = decoder_shape.apply(params_shape, p, lat_shape, training=training)
        return sdf

    grads_far = spatial_gradient(shape_only, far)
    sdf_far = shape_only(far)
    space_sdf = jnp.mean(jnp.exp(-10.0 * jnp.abs(sdf_far[..., 0])))
    eik_far = jnp.abs(safe_l2norm(grads_far, axis=-1) - 1.0)

    neutral = jnp.where(any_neutral, is_neutral, jnp.zeros_like(is_neutral))
    tot_sdf = _masked_concat_mean(
        [(sdf_s, None), (sdf_o, neutral), (sdf_f, neutral)]
    )
    tot_normal = _masked_concat_mean(
        [(nrm_s, None), (nrm_o, neutral), (nrm_f, neutral)]
    )
    tot_eik = _masked_concat_mean(
        [(eik_far, None), (eik_s, None), (eik_o, neutral), (eik_f, neutral)]
    )

    out = {
        "surf_sdf_loss": tot_sdf,
        "normal_loss": tot_normal,
        "space_sdf_loss": space_sdf,
        "eik_loss": tot_eik,
        "reg_shape": jnp.mean(sq_norm(lat_shape)),
        "reg_expr": jnp.mean(sq_norm(lat_expr)),
    }
    if anchors is not None and "gt_anchors" in batch:
        out["anchors"] = jnp.mean((anchors - batch["gt_anchors"]) ** 2)
    if decoder_shape.lat_dim_glob is not None:
        symm, middle = latent_pair_consistency(decoder_shape, lat_shape)
        out["symm_dist"] = symm
        out["middle_dist"] = middle

    # correspondences (epoch-gated like the reference :246-256)
    delta_c, _ = decoder_expr.apply(
        params_expr, batch["corresp_posed"], cond_cat, None,
        training=training, rng=rngs[3],
    )
    pred_can = batch["corresp_posed"] + delta_c
    corresp = jnp.mean((pred_can - batch["corresp_neutral"]) ** 2)
    scale = 1.0 if epoch <= 750 else (0.25 if epoch < 3000 else 0.0)
    out["corresp"] = corresp * scale

    # zero-deformation prior at uniform points in [-1.25, 1.25]^3
    n_samps = min(100, batch["corresp_posed"].shape[1])
    samps = (
        jax.random.uniform(
            rngs[4], (lat_shape.shape[0], n_samps, 3), lat_shape.dtype
        )
        - 0.5
    ) * 2.5
    delta_reg, _ = decoder_expr.apply(
        params_expr, samps, cond_cat, None, training=training, rng=rngs[5]
    )
    out["loss_reg_zero"] = jnp.mean(delta_reg**2)

    # neutral scans: encourage small deformations on all three point sets
    # (three separate neutral-row means, summed — reference :263-266)
    neutral_def = (
        _masked_concat_mean([(delta_s**2, neutral)])
        + _masked_concat_mean([(delta_o**2, neutral)])
        + _masked_concat_mean([(delta_f**2, neutral)])
    )
    out["loss_neutral_zero"] = jnp.where(any_neutral, neutral_def, 0.0)
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
