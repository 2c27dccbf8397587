"""Fused DeepSDF-trunk kernel vs. the XLA decoders (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    make_deformation_decoder,
    make_npm_decoder,
)
from nphm_tpu.ops.pallas_mlp import (
    deformation_pallas,
    deepsdf_trunk_pallas,
    npm_grid_sdf_pallas,
    npm_sdf_pallas,
)


@pytest.mark.parametrize("freq", [None, 2])
def test_npm_kernel_matches_xla(freq):
    cfg = DeepSDFConfig(lat_dim=32, hidden_dim=64, n_layers=4, num_freq_bands=freq)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 1700, 3)) * 0.4
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 32)) * 0.1
    ref, _ = dec.apply(params, xyz, lat)
    out = npm_sdf_pallas(params, cfg, xyz[0], lat[0], interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=3e-6
    )


def test_npm_grid_kernel_matches_xla():
    from nphm_tpu.ops.grid import create_grid_points_from_bounds

    cfg = DeepSDFConfig(lat_dim=16, hidden_dim=48, n_layers=4)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
    res = 24
    pts = create_grid_points_from_bounds(mini, maxi, res)
    ref, _ = dec.apply(params, jnp.asarray(pts)[None], lat[None])
    out = npm_grid_sdf_pallas(params, cfg, lat, mini, maxi, res, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=3e-6
    )


@pytest.mark.parametrize("mode", ["compress", "glob_only", "GNN"])
def test_deformation_kernel_matches_xla(mode):
    cfg = DeformationConfig(
        mode=mode, lat_dim_glob_shape=16, lat_dim_loc_shape=8, n_loc=7,
        lat_dim_expr=8, lat_dim_id=8, hidden_dim=48, n_layers=4,
    )
    dec = make_deformation_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(1, 900, 3)).astype(np.float32)) * 0.3
    lat = jnp.asarray(
        rng.normal(size=(cfg.lat_dim_shape_full + 8,)).astype(np.float32) * 0.1
    )
    anchors = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32)) * 0.3
    ref, _ = dec.apply(params, xyz, lat[None], anchors[None])
    out = deformation_pallas(params, cfg, xyz[0], lat, anchors, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]), atol=3e-6)


def test_unconditioned_trunk():
    cfg = DeepSDFConfig(lat_dim=0, hidden_dim=32, n_layers=4, out_dim=2)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 500, 3)) * 0.4
    lat = jnp.zeros((1, 0))
    ref, _ = dec.apply(params, xyz, lat)
    out = deepsdf_trunk_pallas(params, cfg, xyz[0], None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]), atol=3e-6)
