"""Checkpoint conversion round-trips: reference state-dict layout <-> ours.

The state dicts are fabricated from our own initializers (same storage
layout as the reference modules — [n_distinct, out, in] ensembled weights,
``lin{i}``/``mlp_pos.{0,2,4}``/``defDeepSDF.*`` names), so a convert ->
invert round trip plus forward-equality proves the mapping without needing
the (unavailable) published checkpoints.  A torch-saved trainer container
is exercised too since torch (cpu) is in the image.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
    make_npm_decoder,
)
from nphm_tpu.utils import torch_convert as tc


def test_nphm_round_trip_forward_equality():
    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    ma = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, ma)
    params = dec.init(jax.random.PRNGKey(0))

    sd = tc.nphm_state_dict_from_params(params)
    assert set(k.split(".")[0] for k in sd) == {"ensembled_deep_sdf", "mlp_pos"}
    params2 = tc.nphm_params_from_state_dict(sd, cfg, ma)

    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 500, 3)) * 0.4
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.lat_dim)) * 0.1
    out1, a1 = dec.apply(params, xyz, lat, training=True)
    out2, a2 = dec.apply(params2, xyz, lat, training=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_nphm_shape_mismatch_raises():
    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    ma = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, ma)
    sd = tc.nphm_state_dict_from_params(dec.init(jax.random.PRNGKey(0)))
    wrong = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=48, n_layers=4, pos_mlp_dim=32,
    )
    with pytest.raises(ValueError, match="config expects"):
        tc.nphm_params_from_state_dict(sd, wrong, ma)


def test_npm_round_trip():
    cfg = DeepSDFConfig(lat_dim=32, hidden_dim=64, n_layers=4)
    dec = make_npm_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    sd = tc.deepsdf_state_dict_from_params(params)
    params2 = tc.deepsdf_params_from_state_dict(sd, cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 3)) * 0.4
    lat = jax.random.normal(jax.random.PRNGKey(2), (2, 32)) * 0.1
    out1, _ = dec.apply(params, xyz, lat)
    out2, _ = dec.apply(params2, xyz, lat)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("mode", ["compress", "GNN", "glob_only"])
def test_deformation_round_trip(mode):
    cfg = DeformationConfig(
        mode=mode, lat_dim_glob_shape=16, lat_dim_loc_shape=8, n_loc=7,
        lat_dim_expr=8, lat_dim_id=8, hidden_dim=48, n_layers=4,
    )
    dec = make_deformation_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0))
    sd = tc.deformation_state_dict_from_params(params)
    params2 = tc.deformation_params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(1, 200, 3)).astype(np.float32)) * 0.3
    lat = jnp.asarray(
        rng.normal(size=(1, cfg.lat_dim_shape_full + cfg.lat_dim_expr)).astype(
            np.float32
        )
        * 0.1
    )
    anchors = jnp.asarray(rng.normal(size=(1, 7, 3)).astype(np.float32)) * 0.3
    out1, _ = dec.apply(params, xyz, lat, anchors)
    out2, _ = dec.apply(params2, xyz, lat, anchors)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_torch_trainer_checkpoint_container(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    ma = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, ma)
    params = dec.init(jax.random.PRNGKey(0))
    sd = {k: torch.from_numpy(v) for k, v in
          tc.nphm_state_dict_from_params(params).items()}
    table = rng.normal(size=(5, cfg.lat_dim)).astype(np.float32)
    path = str(tmp_path / "checkpoint_epoch_500.tar")
    torch.save(
        {
            "epoch": 500,
            "decoder_state_dict": sd,
            "latent_codes_state_dict": {"weight": torch.from_numpy(table)},
        },
        path,
    )
    ckpt = tc.load_torch_checkpoint(path)
    assert ckpt["epoch"] == 500
    params2 = tc.nphm_params_from_state_dict(ckpt["decoder_state_dict"], cfg, ma)
    tbl = tc.latent_table_from_state_dict(ckpt["latent_codes_state_dict"])
    np.testing.assert_array_equal(np.asarray(tbl), table)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (1, 100, 3)) * 0.4
    lat = jnp.asarray(table[:1])
    out1, _ = dec.apply(params, xyz, lat, training=True)
    out2, _ = dec.apply(params2, xyz, lat, training=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
