"""Unit tests for the core decoders.

The latent-folding optimization (constant-per-row conditioning folded into
biases) is checked against a naive dense implementation written independently
here; cross-framework parity against the PyTorch reference lives in
``test_reference_parity.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    NPHMConfig,
    apply_deepsdf,
    apply_deformation,
    apply_nphm,
    init_deepsdf,
    init_deformation,
    init_nphm,
    make_npm_decoder,
    point_jacobian,
    spatial_gradient,
)
from nphm_tpu.models.mlp import positional_encoding, softplus_beta


def naive_deepsdf(params, cfg, xyz, lat):
    """Dense re-implementation: concatenate [PE(xyz), lat] and run the trunk."""
    pe = np.asarray(positional_encoding(jnp.asarray(xyz), cfg.num_freq_bands))
    lat_tiled = np.broadcast_to(lat[..., None, :], pe.shape[:-1] + (lat.shape[-1],))
    inp = np.concatenate([pe, lat_tiled], axis=-1)
    x = inp
    n = len(params["layers"])
    skip = cfg.n_layers // 2
    for i in range(n):
        w = np.asarray(params["layers"][i]["w"])
        b = np.asarray(params["layers"][i]["b"])
        if i == skip:
            x = np.concatenate([x, inp], axis=-1) / np.sqrt(2)
        x = x @ w.T + b
        if i < n - 1:
            x = np.asarray(softplus_beta(jnp.asarray(x), cfg.beta))
    return x


@pytest.mark.parametrize("num_freq_bands", [None, 4])
def test_deepsdf_matches_naive(num_freq_bands):
    cfg = DeepSDFConfig(lat_dim=24, hidden_dim=64, n_layers=4, num_freq_bands=num_freq_bands)
    params = init_deepsdf(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    xyz = jax.random.normal(key, (2, 17, 3))
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.lat_dim))

    out = apply_deepsdf(params, cfg, xyz, lat)
    ref = naive_deepsdf(params, cfg, np.asarray(xyz), np.asarray(lat))
    assert out.shape == (2, 17, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_deepsdf_per_point_latents():
    cfg = DeepSDFConfig(lat_dim=8, hidden_dim=32, n_layers=2)
    params = init_deepsdf(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 3))
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.lat_dim))
    out = apply_deepsdf(params, cfg, xyz, lat)
    # must equal evaluating each point with its own constant latent
    for i in range(5):
        oi = apply_deepsdf(params, cfg, xyz[:, i : i + 1], lat[:, i])
        np.testing.assert_allclose(np.asarray(out[:, i]), np.asarray(oi[:, 0]), rtol=1e-6)


def _small_nphm_cfg():
    return NPHMConfig(
        lat_dim_glob=8, lat_dim_loc=4, n_loc=5, n_symm_pairs=2,
        hidden_dim=16, n_layers=4, pos_mlp_dim=16,
    )


def naive_nphm(params, cfg, xyz, lat, training=False):
    """Dense loop-over-members re-implementation of the ensemble decoder."""
    xyz = np.asarray(xyz)
    lat = np.asarray(lat)
    B, N, _ = xyz.shape
    A = cfg.n_members
    # anchors
    z_glob = lat[:, : cfg.lat_dim_glob]
    h = np.maximum(z_glob @ np.asarray(params["mlp_pos"][0]["w"]).T + np.asarray(params["mlp_pos"][0]["b"]), 0)
    h = np.maximum(h @ np.asarray(params["mlp_pos"][1]["w"]).T + np.asarray(params["mlp_pos"][1]["b"]), 0)
    anchors = (h @ np.asarray(params["mlp_pos"][2]["w"]).T + np.asarray(params["mlp_pos"][2]["b"])).reshape(B, cfg.n_loc, 3)
    anchors = anchors + np.asarray(params["mean_anchors"])

    centers = np.concatenate([anchors, np.zeros((B, 1, 3))], axis=1)
    coords = xyz[:, :, None, :] - centers[:, None, :, :]  # [B,N,A,3]
    for k in range(cfg.n_symm_pairs):
        coords[:, :, 2 * k + 1, 0] *= -1

    z_loc = lat[:, cfg.lat_dim_glob :].reshape(B, A, cfg.lat_dim_loc)
    member_map = cfg.member_map
    skip = cfg.n_layers // 2
    preds = np.zeros((B, N, A, cfg.out_dim), np.float32)
    for a in range(A):
        inp = np.concatenate(
            [coords[:, :, a, :], np.broadcast_to(np.concatenate([z_glob, z_loc[:, a]], -1)[:, None, :], (B, N, cfg.lat_dim_part))],
            axis=-1,
        )
        x = inp
        n = len(params["ensemble"])
        for i in range(n):
            w = np.asarray(params["ensemble"][i]["w"])[member_map[a]]
            b = np.asarray(params["ensemble"][i]["b"])[member_map[a]]
            if i == skip:
                x = np.concatenate([x, inp], axis=-1) / np.sqrt(2)
            x = x @ w.T + b
            if i < n - 1:
                x = np.asarray(softplus_beta(jnp.asarray(x), cfg.beta))
        preds[:, :, a, :] = x
    if not training:
        preds[:, :, -1, 0] = 1.0
    # blending
    d = np.linalg.norm(anchors[:, None, :, :] - xyz[:, :, None, :], axis=-1)
    dist = -((d + 1e-5) ** 2)
    dist = np.concatenate([dist, np.full_like(dist[..., :1], cfg.blend_background_dist)], -1)
    w = np.exp(dist / cfg.blend_var)
    w = w / (w.sum(-1, keepdims=True) + 1e-6)
    sdf = (w[..., None] * preds).sum(2)
    return sdf, anchors


@pytest.mark.parametrize("training", [False, True])
def test_nphm_matches_naive(training):
    cfg = _small_nphm_cfg()
    mean_anchors = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (cfg.n_loc, 3))
    ) * 0.3
    params = init_nphm(jax.random.PRNGKey(0), cfg, mean_anchors)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 3)) * 0.4
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.lat_dim)) * 0.1

    sdf, anchors = apply_nphm(params, cfg, xyz, lat, training=training)
    sdf_ref, anchors_ref = naive_nphm(params, cfg, xyz, lat, training=training)
    assert sdf.shape == (2, 13, 1)
    assert anchors.shape == (2, cfg.n_loc, 3)
    np.testing.assert_allclose(np.asarray(anchors), anchors_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sdf), sdf_ref, rtol=1e-4, atol=1e-5)


def test_nphm_symmetry():
    """A mirrored latent must produce an x-mirrored SDF.

    With symmetric pair codes swapped, middle codes fixed, and a latent whose
    anchors come out mirrored, f(x, y, z) should equal f(-x, y, z) of the
    mirrored code.  We test the special case of a *symmetric* latent (pair
    codes equal, anchors mirrored): the SDF must then be exactly even in x.
    """
    cfg = _small_nphm_cfg()
    # symmetric mean anchors: pairs mirrored in x, middle on the plane
    mean_anchors = np.array(
        [[0.3, 0.1, 0.0], [-0.3, 0.1, 0.0], [0.2, -0.2, 0.1], [-0.2, -0.2, 0.1], [0.0, 0.4, 0.2]],
        np.float32,
    )
    params = init_nphm(jax.random.PRNGKey(0), cfg, mean_anchors)
    # zero out the anchor MLP so anchors == mean anchors (exactly symmetric)
    params["mlp_pos"] = jax.tree.map(jnp.zeros_like, params["mlp_pos"])

    lat = np.zeros((1, cfg.lat_dim), np.float32)
    rngv = np.random.default_rng(3)
    z_glob = rngv.normal(size=cfg.lat_dim_glob) * 0.1
    lat[0, : cfg.lat_dim_glob] = z_glob
    # identical codes within each symmetric pair; middle member code too
    loc = rngv.normal(size=(cfg.n_members, cfg.lat_dim_loc)) * 0.1
    for k in range(cfg.n_symm_pairs):
        loc[2 * k + 1] = loc[2 * k]
    lat[0, cfg.lat_dim_glob :] = loc.reshape(-1)

    xyz = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (1, 50, 3))) * 0.4
    xyz_m = xyz.copy()
    xyz_m[..., 0] *= -1

    sdf, _ = apply_nphm(params, cfg, jnp.asarray(xyz), jnp.asarray(lat))
    sdf_m, _ = apply_nphm(params, cfg, jnp.asarray(xyz_m), jnp.asarray(lat))
    # middle (non-paired, non-background) member breaks symmetry unless its
    # anchor lies on the mirror plane and its weights are shared — here the
    # middle anchor x==0 but its MLP is not x-symmetric, so restrict the check
    # to points far from the middle anchor where its blend weight vanishes.
    d_mid = np.linalg.norm(xyz - mean_anchors[4], axis=-1)
    mask = d_mid > 0.45  # blend weight < exp(-20)
    assert mask.sum() > 5
    np.testing.assert_allclose(
        np.asarray(sdf)[mask], np.asarray(sdf_m)[mask], rtol=1e-4, atol=1e-5
    )


def test_deformation_modes():
    for mode in ["compress", "glob_only", "expr_only", "interpolate", "GNN"]:
        cfg = DeformationConfig(
            mode=mode, lat_dim_expr=16, lat_dim_id=8, lat_dim_glob_shape=8,
            lat_dim_loc_shape=4, n_loc=5, hidden_dim=64, n_layers=4,
        )
        params = init_deformation(jax.random.PRNGKey(0), cfg)
        xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 3))
        lat = jax.random.normal(
            jax.random.PRNGKey(2), (2, cfg.lat_dim_shape_full + cfg.lat_dim_expr)
        )
        anchors = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.n_loc, 3))
        delta, extra = apply_deformation(params, cfg, xyz, lat, anchors)
        assert delta.shape == (2, 11, 3)
        assert extra.shape == (2, 11, 1)
        # train-time noise path
        delta_t, _ = apply_deformation(
            params, cfg, xyz, lat, anchors, training=True,
            rng=jax.random.PRNGKey(4),
        )
        assert delta_t.shape == (2, 11, 3)


def test_spatial_gradient_analytic():
    """Gradient of a known analytic field."""

    def field(x):
        return jnp.sum(x**2, axis=-1, keepdims=True)  # grad = 2x

    xyz = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 3))
    g = spatial_gradient(field, xyz)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(xyz), rtol=1e-6)


def test_point_jacobian_analytic():
    A = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3)).astype(np.float32))

    def fn(x):
        return jnp.einsum("...i,ji->...j", x, A)

    xyz = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))
    J = point_jacobian(fn, xyz)
    assert J.shape == (2, 4, 3, 3)
    np.testing.assert_allclose(
        np.asarray(J), np.broadcast_to(np.asarray(A), (2, 4, 3, 3)), rtol=1e-5
    )


def test_gradient_supports_double_backprop():
    """Eikonal-style losses need grad-of-grad wrt parameters."""
    cfg = DeepSDFConfig(lat_dim=8, hidden_dim=32, n_layers=2)
    params = init_deepsdf(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 3))
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.lat_dim))

    def eikonal(p):
        g = spatial_gradient(lambda x: apply_deepsdf(p, cfg, x, lat), xyz)
        return jnp.mean(jnp.abs(jnp.linalg.norm(g, axis=-1) - 1.0))

    grads = jax.grad(eikonal)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)


def test_geometric_init_field_is_near_constant_negative():
    """Adjudication of the round-1 "geometric init ~ sphere SDF" property
    tests (SURVEY.md section 4; VERDICT r1 item 5).

    The reference applies the DeepSDF geometric init to the LAST layer only
    (deepSDF.py:49-54: w ~ N(sqrt(pi/fan_in), 1e-5), b = -radius) while
    hidden layers keep the torch-default uniform init.  Measured on the
    actual torch reference (seed 0, 8x1024 trunk, zero latent, spheres of
    radius 0.5/1.0/1.5): sdf = -0.398 with per-radius std < 1e-3 and
    |grad| ~ 0.001 — the field at init is approximately a negative
    CONSTANT, NOT a sphere SDF, and the IGR eikonal-at-init property
    (|grad| ~ 1) does NOT hold for this recipe.  Our init matches that
    measured behavior; asserting sphere-ness would test a property the
    reference never had.
    """
    cfg = DeepSDFConfig(lat_dim=512, hidden_dim=1024, n_layers=8)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    d = rng.normal(size=(1, 1000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lat = jnp.zeros((1, cfg.lat_dim))
    for r in (0.5, 1.0, 1.5):
        xyz = jnp.asarray(d * r)
        sdf, _ = dec.apply(params, xyz, lat)
        s = np.asarray(sdf)
        assert s.std() < 0.01, "init field should be near-constant per radius"
        assert -1.0 < s.mean() < -0.05, "init field should be negative"


def test_geometric_init_eikonal_is_small_not_unit():
    """Companion to the constant-field test: the measured |grad| at init is
    ~1e-3 (torch reference and this port alike), far from the IGR ideal of
    1.  Assert the measured envelope so a regression toward either huge or
    unit gradients (i.e. an init recipe change) is caught."""
    cfg = DeepSDFConfig(lat_dim=512, hidden_dim=1024, n_layers=8)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(1, 1000, 3)).astype(np.float32) * 0.7)
    lat = jnp.zeros((1, cfg.lat_dim))
    g = spatial_gradient(lambda x: dec.apply(params, x, lat)[0], xyz)
    gn = np.linalg.norm(np.asarray(g), axis=-1)
    assert gn.mean() < 0.05, "init gradients are measured ~1e-3, not ~1"


def test_hessian_laplace_divergence_analytic():
    """Ports of the reference's unused diff_operators surface
    (diff_operators.py:5-24, 57-66; VERDICT r1 item 8), checked on
    quadratic/linear fields with known derivatives."""
    from nphm_tpu.models.fields import divergence, laplace, point_hessian

    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    xyz = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))

    def quad(x):  # f = x^T A x  -> hessian A + A^T, laplace tr(A + A^T)
        return jnp.einsum("...i,ij,...j->...", x, A, x)

    H = point_hessian(quad, xyz)
    assert H.shape == (2, 5, 1, 3, 3)
    np.testing.assert_allclose(
        np.asarray(H),
        np.broadcast_to(np.asarray(A + A.T), (2, 5, 1, 3, 3)),
        atol=1e-4,
    )
    lap = laplace(quad, xyz)
    np.testing.assert_allclose(
        np.asarray(lap), float(jnp.trace(A + A.T)), atol=1e-4
    )

    def lin(x):  # v = B x -> div tr(B)
        return jnp.einsum("...i,ji->...j", x, Bm)

    div = divergence(lin, xyz)
    assert div.shape == (2, 5, 1)
    np.testing.assert_allclose(np.asarray(div), float(jnp.trace(Bm)), atol=1e-5)

    def vec2(x):  # [C=2] channel field: hessians per channel
        return jnp.stack([quad(x), jnp.sum(x**2, -1)], axis=-1)

    H2 = point_hessian(vec2, xyz)
    assert H2.shape == (2, 5, 2, 3, 3)
    np.testing.assert_allclose(
        np.asarray(H2[..., 1, :, :]),
        np.broadcast_to(2 * np.eye(3, dtype=np.float32), (2, 5, 3, 3)),
        atol=1e-4,
    )
