"""Multi-chip data-parallel training: the mesh-sharded train/val steps must
be numerically equivalent to the single-device program.

The trainers compile a second step with the batch axis sharded over a 1-D
device mesh (params/latent tables replicated); XLA inserts the gradient
psums from the sharding annotations.  GSPMD preserves program semantics, so
single-device and 8-way-DP must agree to float-reassociation tolerance —
including the fused Pallas training kernel routed through shard_map, and
the optimizer updates (AdamW + row-Adam + max-norm renorm).

Runs on the virtual 8-device CPU mesh forced by tests/conftest.py.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from nphm_tpu.data.synthetic import (
    SyntheticDeformationDataset,
    SyntheticIdentityDataset,
)
from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
    make_npm_decoder,
)
from nphm_tpu.parallel.mesh import get_device_mesh
from nphm_tpu.utils.logging_utils import MetricsLogger


def _train_cfg(extra=None):
    cfg = {
        "training": {
            "batch_size": 8,
            "ckpt_interval": 10**9,
            "grad_clip": 0.1,
            "grad_clip_lat": 0.1,
            "lr": 0.0015,
            "lr_lat": 0.003,
            "lr_decay_factor": 0.5,
            "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": 120,
            "lr_decay_interval_lat": 120,
            "npoints_decoder": 64,
            "npoints_decoder_non": 64,
            "sigma_near": 0.01,
            "weight_decay": 0.01,
            "lambdas": {
                "lat_reg": 0.01,
                "surf_sdf": 2.0,
                "normals": 0.3,
                "space_sdf": 0.01,
                "grad": 0.1,
            },
        }
    }
    cfg["training"].update(extra or {})
    return cfg


def _batches(ds, n):
    out = []
    for b in itertools.islice(ds.batch_iter(seed=0, shuffle=False), n):
        out.append({k: jnp.asarray(v) for k, v in b.items()})
    return out


def _drive(tr, batches, lr=1e-3, lr_lat=3e-3):
    for b in batches:
        step = tr._pick(tr._train_step, tr._train_step_dp, b)
        (tr.params, tr.opt_state, tr.latents, tr.lat_state, terms) = step(
            tr.params, tr.opt_state, tr.latents, tr.lat_state, b,
            jnp.float32(lr), jnp.float32(lr_lat),
        )
    return terms


def _assert_tree_close(a, b, atol=2e-5, rtol=2e-4):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol
        )


def test_identity_trainer_dp_matches_single(tmp_path):
    from nphm_tpu.training.trainer import IdentityTrainer

    mesh = get_device_mesh()
    assert mesh.size == 8, "conftest must force 8 virtual devices"

    train_ds = SyntheticIdentityDataset(n_subjects=8, batch_size=8, seed=0)
    val_ds = SyntheticIdentityDataset(n_subjects=8, batch_size=8, seed=5)
    dec = make_npm_decoder(
        DeepSDFConfig(lat_dim=16, hidden_dim=32, n_layers=4,
                      geometric_init=True, radius_init=0.5)
    )
    params = dec.init(jax.random.PRNGKey(0))

    mk = lambda mesh_: IdentityTrainer(  # noqa: E731
        dec, jax.tree.map(jnp.array, params), _train_cfg(), train_ds, val_ds,
        "dp", exp_dir=str(tmp_path), logger=MetricsLogger(quiet=True),
        mesh=mesh_,
    )
    tr_a, tr_b = mk(None), mk(mesh)
    assert tr_a._train_step_dp is None and tr_b._train_step_dp is not None

    batches = _batches(train_ds, 3)
    terms_a = _drive(tr_a, batches)
    terms_b = _drive(tr_b, batches)

    np.testing.assert_allclose(
        float(terms_a["loss"]), float(terms_b["loss"]), rtol=1e-4
    )
    _assert_tree_close(tr_a.params, tr_b.params)
    _assert_tree_close(tr_a.latents, tr_b.latents)
    _assert_tree_close(tr_a.lat_state, tr_b.lat_state)

    # val step too
    vb = _batches(val_ds, 1)[0]
    for tr in (tr_a, tr_b):
        vstep = tr._pick(tr._val_step, tr._val_step_dp, vb)
        tr.latents_val, tr.lat_state_val, _ = vstep(
            tr.latents_val, tr.lat_state_val, tr.params, vb, jnp.float32(3e-3)
        )
    _assert_tree_close(tr_a.latents_val, tr_b.latents_val)


def test_identity_trainer_dp_fused_pallas_kernel(tmp_path):
    """The fused Pallas training kernel (interpret mode off-TPU) routed
    through shard_map on the mesh must match the single-device fused step."""
    from nphm_tpu.training.trainer import IdentityTrainer

    mesh = get_device_mesh()
    cfg = NPHMConfig(
        lat_dim_glob=8, lat_dim_loc=4, n_loc=6, n_symm_pairs=2,
        hidden_dim=16, n_layers=4, pos_mlp_dim=16,
    )
    rng = np.random.default_rng(0)
    anchors = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, anchors)
    params = dec.init(jax.random.PRNGKey(0))

    train_ds = SyntheticIdentityDataset(
        n_subjects=8, batch_size=8, n_face=32, n_non_face=32,
        n_anchors=cfg.n_loc, seed=0,
    )
    tcfg = _train_cfg({
        "fused_train_kernel": True,
        "lambdas": {
            "lat_reg": 0.01, "surf_sdf": 2.0, "normals": 0.3,
            "space_sdf": 0.01, "grad": 0.1, "anchors": 7.5,
            "symm_dist": 0.01, "middle_dist": 0.0,
        },
    })
    mk = lambda mesh_: IdentityTrainer(  # noqa: E731
        dec, jax.tree.map(jnp.array, params), tcfg, train_ds, train_ds,
        "dpf", exp_dir=str(tmp_path), logger=MetricsLogger(quiet=True),
        mesh=mesh_,
    )
    tr_a, tr_b = mk(None), mk(mesh)
    assert tr_a._fields_fn is not None
    assert tr_b._fields_fn_dp is not None

    batches = _batches(train_ds, 2)
    terms_a = _drive(tr_a, batches)
    terms_b = _drive(tr_b, batches)
    np.testing.assert_allclose(
        float(terms_a["loss"]), float(terms_b["loss"]), rtol=1e-4
    )
    _assert_tree_close(tr_a.params, tr_b.params)
    _assert_tree_close(tr_a.latents, tr_b.latents)


def test_identity_trainer_dp_ragged_batch_falls_back(tmp_path):
    from nphm_tpu.training.trainer import IdentityTrainer

    mesh = get_device_mesh()
    # 10 subjects / batch 8 -> trailing batch of 2 (not divisible by 8)
    train_ds = SyntheticIdentityDataset(n_subjects=10, batch_size=8, seed=0)
    dec = make_npm_decoder(
        DeepSDFConfig(lat_dim=16, hidden_dim=32, n_layers=4)
    )
    tr = IdentityTrainer(
        dec, dec.init(jax.random.PRNGKey(0)), _train_cfg(), train_ds,
        train_ds, "rb", exp_dir=str(tmp_path),
        logger=MetricsLogger(quiet=True), mesh=mesh,
    )
    batches = _batches(train_ds, 2)
    assert batches[0]["idx"].shape[0] == 8
    assert batches[1]["idx"].shape[0] == 2
    assert tr._pick(tr._train_step, tr._train_step_dp, batches[0]) is tr._train_step_dp
    assert tr._pick(tr._train_step, tr._train_step_dp, batches[1]) is tr._train_step
    _drive(tr, batches)  # both paths execute without error
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree_util.tree_leaves(tr.params)
    )


def test_deformation_trainer_dp_matches_single(tmp_path):
    from nphm_tpu.training.trainer_corresp import DeformationTrainer

    mesh = get_device_mesh()
    ident = SyntheticIdentityDataset(n_subjects=4, batch_size=2, seed=0)
    train_ds = SyntheticDeformationDataset(
        ident, n_expressions=2, n_points=64, batch_size=8
    )
    dcfg = DeformationConfig(
        mode="expr_only", lat_dim_expr=8, hidden_dim=32, n_layers=4
    )
    dec = make_deformation_decoder(dcfg)
    params = dec.init(jax.random.PRNGKey(0))
    shape_state = {
        "params": {},
        "latents": np.zeros((4, 4), np.float32),
        "latents_val": np.zeros((4, 4), np.float32),
    }
    cfg = {
        "training": {
            "batch_size": 8, "ckpt_interval": 10**9,
            "grad_clip": 0.025, "grad_clip_lat": 0.025,
            "lambdas": {"corresp": 100.0, "lat_reg": 5e-5, "loss_reg_zero": 5e-5},
            "lr": 0.001, "lr_lat": 0.005,
            "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": 100, "lr_decay_interval_lat": 100,
            "weight_decay": 0.0005,
        }
    }
    mk = lambda mesh_: DeformationTrainer(  # noqa: E731
        dec, jax.tree.map(jnp.array, params), None, cfg, train_ds, train_ds,
        "dpd", exp_dir=str(tmp_path), shape_state=shape_state,
        logger=MetricsLogger(quiet=True), mesh=mesh_,
    )
    tr_a, tr_b = mk(None), mk(mesh)
    assert tr_b._train_step_dp is not None

    batches = _batches(train_ds, 2)
    key = jax.random.PRNGKey(42)
    for b in batches:
        for tr in (tr_a, tr_b):
            step = tr._pick(tr._train_step, tr._train_step_dp, b)
            (tr.params, tr.opt_state, tr.latents, tr.lat_state, terms) = step(
                tr.params, tr.opt_state, tr.latents, tr.lat_state, b,
                jnp.float32(1e-3), jnp.float32(5e-3), key,
            )
    _assert_tree_close(tr_a.params, tr_b.params)
    _assert_tree_close(tr_a.latents, tr_b.latents)
