"""Fused Pallas ensemble kernel vs. the pure-XLA decoder (interpret mode).

The kernel is TPU-only at runtime; on the CPU test mesh it runs through the
Pallas interpreter, which executes the same kernel logic with full f32
precision — an exact-parity check against ``apply_nphm(training=False)``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.models import NPHMConfig, make_nphm_decoder
from nphm_tpu.ops.pallas_ensemble import apply_nphm_pallas, nphm_sdf_pallas


@pytest.fixture(scope="module")
def setup():
    cfg = NPHMConfig(
        lat_dim_glob=16,
        lat_dim_loc=8,
        n_loc=7,
        n_symm_pairs=3,
        hidden_dim=40,
        n_layers=4,
        pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    mean_anchors = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    decoder = make_nphm_decoder(cfg, mean_anchors)
    params = decoder.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1
    return cfg, decoder, params, lat


def test_matches_xla_eval_mode(setup):
    cfg, decoder, params, lat = setup
    xyz = jax.random.normal(jax.random.PRNGKey(2), (1, 1500, 3)) * 0.4
    ref, _ = decoder.apply(params, xyz, lat, training=False)
    out = nphm_sdf_pallas(params, cfg, xyz[0], lat[0], interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=2e-6, rtol=1e-5
    )


def test_member_culling_error_is_bounded(setup):
    cfg, decoder, params, lat = setup
    # points far outside the anchor cloud: most members cull away
    xyz = jax.random.normal(jax.random.PRNGKey(3), (1, 1024, 3)) * 1.2
    ref, _ = decoder.apply(params, xyz, lat, training=False)
    out = nphm_sdf_pallas(
        params, cfg, xyz[0], lat[0], interpret=True, cull_eps=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=1e-5
    )


def test_nondivisible_point_count_padding(setup):
    cfg, decoder, params, lat = setup
    xyz = jax.random.normal(jax.random.PRNGKey(4), (1, 777, 3)) * 0.4
    ref, _ = decoder.apply(params, xyz, lat, training=False)
    out = nphm_sdf_pallas(params, cfg, xyz[0], lat[0], interpret=True)
    assert out.shape == (777,)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=2e-6, rtol=1e-5
    )


def test_apply_nphm_pallas_batched_wrapper(setup):
    cfg, decoder, params, lat = setup
    lat2 = jnp.concatenate([lat, -lat], axis=0)
    xyz = jax.random.normal(jax.random.PRNGKey(5), (2, 1100, 3)) * 0.4
    ref, ref_anchors = decoder.apply(params, xyz, lat2, training=False)
    sdf, anchors = apply_nphm_pallas(params, cfg, xyz, lat2, interpret=True)
    assert sdf.shape == (2, 1100, 1)
    np.testing.assert_allclose(
        np.asarray(sdf), np.asarray(ref), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(anchors), np.asarray(ref_anchors), atol=1e-6
    )


def test_grid_path_matches_xla_in_brick_and_fallback_order(setup):
    cfg, decoder, params, lat = setup
    from nphm_tpu.ops.grid import create_grid_points_from_bounds
    from nphm_tpu.ops.pallas_ensemble import (
        DEFAULT_TILE,
        _brick_shape,
        nphm_grid_sdf_pallas,
    )

    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
    for res in (32, 20):  # 32 bricks at the default tile; 20 -> natural order
        pts = create_grid_points_from_bounds(mini, maxi, res)
        ref, _ = decoder.apply(
            params, jnp.asarray(pts)[None], lat, training=False
        )
        out = nphm_grid_sdf_pallas(
            params, cfg, lat[0], mini, maxi, res, interpret=True
        )
        # assert against the brick decomposition the production call uses
        if res == 32:
            bx, by, bz = _brick_shape(res, DEFAULT_TILE)
            assert bx * by * bz == DEFAULT_TILE and res % bx == 0
            assert res % by == 0 and res % bz == 0
        else:
            assert _brick_shape(res, DEFAULT_TILE) is None
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref[0, :, 0]), atol=1e-4
        )


def test_grid_path_shards_over_device_mesh(setup):
    cfg, decoder, params, lat = setup
    from jax.sharding import Mesh

    from nphm_tpu.ops.grid import create_grid_points_from_bounds
    from nphm_tpu.ops.pallas_ensemble import nphm_grid_sdf_pallas

    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
    res = 32
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    pts = create_grid_points_from_bounds(mini, maxi, res)
    ref, _ = decoder.apply(params, jnp.asarray(pts)[None], lat, training=False)
    out = nphm_grid_sdf_pallas(
        params, cfg, lat[0], mini, maxi, res, interpret=True, device_mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=1e-4
    )


def test_backward_warp_grid_logits(setup):
    cfg, decoder, params, lat = setup
    from nphm_tpu.models import DeformationConfig, make_deformation_decoder
    from nphm_tpu.ops.grid import create_grid_points_from_bounds
    from nphm_tpu.reconstruction.extract import (
        get_logits_backward,
        pallas_backward_grid_logits,
    )

    dcfg = DeformationConfig(
        mode="glob_only",
        lat_dim_glob_shape=cfg.lat_dim_glob,
        lat_dim_expr=8,
        hidden_dim=48,
        n_layers=4,
    )
    expr = make_deformation_decoder(dcfg)
    p_expr = expr.init(jax.random.PRNGKey(7))
    lat_cond = jnp.concatenate(
        [lat[0, : cfg.lat_dim_glob], jnp.full((8,), 0.05)]
    )

    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
    res = 32
    pts = create_grid_points_from_bounds(mini, maxi, res)
    ref = get_logits_backward(
        decoder, expr, params, p_expr, lat[0], lat_cond, pts,
        chunk_size=2048,
    )
    out = pallas_backward_grid_logits(
        decoder, expr, params, p_expr, lat[0], lat_cond, mini, maxi, res,
        chunk_size=2048, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_bf16_operands_are_close(setup):
    cfg, decoder, params, lat = setup
    xyz = jax.random.normal(jax.random.PRNGKey(6), (1, 1024, 3)) * 0.4
    ref, _ = decoder.apply(params, xyz, lat, training=False)
    out = nphm_sdf_pallas(
        params, cfg, xyz[0], lat[0], interpret=True, dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref[0, :, 0]), atol=5e-3
    )
