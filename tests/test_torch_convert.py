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


def test_reference_trainer_checkpoint_transplant_end_to_end(tmp_path):
    """VERDICT r1 item 10: build a checkpoint with the ACTUAL reference
    trainer classes (torch FastEnsembleDeepSDFMirrored + Embedding tables +
    optimizers, saved exactly as reference training.py:190-201), convert it
    with utils/torch_convert, and fit + extract from the transplanted
    weights — the advertised "bring your reference weights" path."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference/src")
    try:
        from NPHM.models.EnsembledDeepSDF import FastEnsembleDeepSDFMirrored
    except Exception as e:  # pragma: no cover - reference not present
        pytest.skip(f"reference torch classes unavailable: {e}")

    cfg = NPHMConfig(
        lat_dim_glob=8, lat_dim_loc=4, n_loc=5, n_symm_pairs=2,
        hidden_dim=32, n_layers=4, pos_mlp_dim=16,
    )
    rng = np.random.default_rng(0)
    ma = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)

    torch.manual_seed(0)
    ref = FastEnsembleDeepSDFMirrored(
        lat_dim_glob=cfg.lat_dim_glob, lat_dim_loc=cfg.lat_dim_loc,
        n_loc=cfg.n_loc, n_symm_pairs=cfg.n_symm_pairs,
        anchors=torch.from_numpy(ma), hidden_dim=cfg.hidden_dim,
        n_layers=cfg.n_layers, pos_mlp_dim=cfg.pos_mlp_dim,
    ).float()
    n_subj = 4
    latents = torch.nn.Embedding(
        n_subj, cfg.lat_dim, max_norm=1.0, sparse=True
    )
    torch.nn.init.normal_(latents.weight.data, 0.0, 0.01)
    latents_val = torch.nn.Embedding(2, cfg.lat_dim, max_norm=1.0, sparse=True)
    torch.nn.init.normal_(latents_val.weight.data, 0.0, 0.01)
    opt_enc = torch.optim.AdamW(ref.parameters(), lr=5e-4, weight_decay=0.01)
    opt_lat = torch.optim.SparseAdam(latents.parameters(), lr=1e-3)
    opt_lat_val = torch.optim.SparseAdam(latents_val.parameters(), lr=1e-3)

    # exactly the reference save format (training.py:194-201)
    path = str(tmp_path / "checkpoint_epoch_2500.tar")
    torch.save(
        {
            "epoch": 2500,
            "decoder_state_dict": ref.state_dict(),
            "optimizer_encoder_state_dict": opt_enc.state_dict(),
            "optimizer_lat_state_dict": opt_lat.state_dict(),
            "optimizer_lat_val_state_dict": opt_lat_val.state_dict(),
            "latent_codes_state_dict": latents.state_dict(),
            "latent_codes_val_state_dict": latents_val.state_dict(),
        },
        path,
    )

    ckpt = tc.load_torch_checkpoint(path)
    assert ckpt["epoch"] == 2500
    params = tc.nphm_params_from_state_dict(ckpt["decoder_state_dict"], cfg, ma)
    table = tc.latent_table_from_state_dict(ckpt["latent_codes_state_dict"])
    assert table.shape == (n_subj, cfg.lat_dim)

    # 1) forward parity against the live torch model (train mode: the eval
    #    background pin intentionally differs, see models/ensemble.py)
    dec = make_nphm_decoder(cfg, ma)
    xyz = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3)) * 0.4,
        np.float32,
    )
    lat = np.asarray(table[:1])
    ref.train()
    with torch.no_grad():
        t_out, t_anchors = ref(
            torch.from_numpy(xyz),
            torch.from_numpy(lat)[:, None, :].repeat(1, xyz.shape[1], 1),
            None,
        )
    j_out, j_anchors = dec.apply(
        params, jnp.asarray(xyz), jnp.asarray(lat), training=True
    )
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_anchors), t_anchors.numpy().reshape(1, cfg.n_loc, 3),
        atol=1e-5,
    )

    # 2) the transplanted weights drive fitting + extraction end-to-end
    from nphm_tpu.fitting import FittingConfig, fit_identity
    from nphm_tpu.reconstruction.extract import extract_mesh

    obs = [
        (rng.normal(size=(256, 3)) * 0.3).astype(np.float32) for _ in range(2)
    ]
    fc = FittingConfig(
        n_steps=5, n_obs_per_batch=2, n_points_per_obs=64, log_every=10**9
    )
    lat_fit, _anchors, _hist = fit_identity(dec, params, obs, cfg=fc, verbose=False)
    assert np.isfinite(np.asarray(lat_fit)).all()
    mesh = extract_mesh(
        dec, params, np.asarray(lat_fit).reshape(1, -1),
        (-0.7, -0.7, -0.7), (0.7, 0.7, 0.7), 24, use_pallas=False,
    )
    assert np.isfinite(mesh.vertices).all()
