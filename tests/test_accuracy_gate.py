"""Quantitative reconstruction-quality gates (VERDICT r1 items 1 + 3).

The round-1 suite asserted that pipeline artifacts EXIST; nothing asserted
they are GOOD.  These tests close that hole with synthetic analytic geometry
(closed-form ellipsoid "heads" + affine expression warps): train the tiny
two-stage model, reconstruct/fit/deform through the production library
surfaces, and assert Chamfer-L1 (computed by the SAME ``eval_pointcloud``
the evaluation CLI uses) below calibrated thresholds.  A regression that
zeroed the deformation field, broke blending, or detuned the fit fails here.

Calibration (CPU, the suite's virtual-device config, seed-pinned): 200-epoch
identity training reaches train-subject chamfer ~0.011 and held-out fitted
chamfer ~0.006 on ellipsoids of radius ~0.45; thresholds carry 2-3x margin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.data.sampling import sample_mesh_surface
from nphm_tpu.data.synthetic import (
    SyntheticDeformationDataset,
    SyntheticIdentityDataset,
    _ellipsoid_surface,
)
from nphm_tpu.evaluation.metrics import eval_pointcloud
from nphm_tpu.fitting import FittingConfig, fit_identity
from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    make_deformation_decoder,
    make_npm_decoder,
)
from nphm_tpu.reconstruction.extract import deform_mesh, extract_mesh
from nphm_tpu.utils.logging_utils import MetricsLogger

BOX = ((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7))


def _chamfer_mesh_vs_points(mesh, gt_pts):
    pred_pts, _ = sample_mesh_surface(mesh, 20000, rng=np.random.default_rng(42))
    return eval_pointcloud(pred_pts, gt_pts, metric_space=False)["chamfer_l1"]


def _gt_surface(radii, center, n=20000, seed=42):
    return _ellipsoid_surface(radii, center, n, np.random.default_rng(seed))[0]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from nphm_tpu.training.trainer import IdentityTrainer

    tmp = str(tmp_path_factory.mktemp("gate"))
    dec = make_npm_decoder(
        DeepSDFConfig(lat_dim=16, hidden_dim=64, n_layers=4,
                      geometric_init=True, radius_init=0.5)
    )
    params = dec.init(jax.random.PRNGKey(0))
    train_ds = SyntheticIdentityDataset(n_subjects=6, batch_size=3, seed=0)
    val_ds = SyntheticIdentityDataset(n_subjects=2, batch_size=2, seed=5)
    cfg = {
        "training": {
            "batch_size": 4, "ckpt_interval": 10**9,
            "grad_clip": 0.1, "grad_clip_lat": 0.1,
            "lr": 0.0015, "lr_lat": 0.003,
            "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": 120, "lr_decay_interval_lat": 120,
            "npoints_decoder": 250, "npoints_decoder_non": 250,
            "sigma_near": 0.01, "weight_decay": 0.01,
            "lambdas": {
                "lat_reg": 0.01, "surf_sdf": 2.0, "normals": 0.3,
                "space_sdf": 0.01, "grad": 0.1,
            },
        }
    }
    tr = IdentityTrainer(
        dec, params, cfg, train_ds, val_ds, "gate", exp_dir=tmp,
        logger=MetricsLogger(quiet=True),
    )
    tr.train_model(200)
    return dec, tr, train_ds


@pytest.mark.integration
def test_trained_reconstruction_chamfer_gate(trained):
    """Auto-decoded train subject reconstructs below chamfer 0.025
    (calibrated ~0.011)."""
    dec, tr, ds = trained
    mesh = extract_mesh(
        dec, tr.params, tr.latents[0][None], *BOX, 64, use_pallas=False
    )
    ch = _chamfer_mesh_vs_points(mesh, _gt_surface(ds.radii[0], ds.centers[0]))
    assert ch < 0.025, f"train-subject chamfer {ch}"


@pytest.mark.integration
def test_fitted_heldout_chamfer_gate(trained):
    """fit_identity on point clouds of a HELD-OUT ellipsoid reconstructs it
    below chamfer 0.02 (calibrated ~0.006) — the full observe->fit->extract
    ->evaluate loop with quality asserted."""
    dec, tr, _ds = trained
    rng = np.random.default_rng(7)
    radii = np.array([0.45, 0.5, 0.4], np.float32)
    center = np.array([0.02, -0.01, 0.03], np.float32)
    obs = [_ellipsoid_surface(radii, center, 1500, rng)[0] for _ in range(3)]
    fc = FittingConfig(
        n_steps=150, n_obs_per_batch=3, n_points_per_obs=500, log_every=10**9
    )
    lat_fit, _anchors, _hist = fit_identity(
        dec, tr.params, obs, cfg=fc, verbose=False
    )
    mesh = extract_mesh(
        dec, tr.params, np.asarray(lat_fit).reshape(1, -1), *BOX, 64,
        use_pallas=False,
    )
    ch = _chamfer_mesh_vs_points(mesh, _gt_surface(radii, center))
    assert ch < 0.02, f"fitted held-out chamfer {ch}"


@pytest.mark.integration
def test_deformation_moves_mesh_toward_posed_gate(trained, tmp_path):
    """Stage 2: the trained deformation field must move the neutral mesh
    measurably toward the posed surface — deformed != neutral AND
    chamfer(deformed, posed) < chamfer(neutral, posed).  A zeroed
    deformation field (the VERDICT's example silent regression) fails."""
    from nphm_tpu.training.trainer_corresp import DeformationTrainer

    dec, tr, ident = trained
    train_ds = SyntheticDeformationDataset(
        ident, n_expressions=2, batch_size=4, warp_scale=0.08
    )
    # val warps must cover the VAL identity subjects: the trainer indexes
    # shape_state["latents_val"] (2 rows, from the fixture's 2-subject val
    # identity dataset) with the val deformation dataset's subj_ind
    ident_val = SyntheticIdentityDataset(n_subjects=2, batch_size=2, seed=5)
    val_ds = SyntheticDeformationDataset(
        ident_val, n_expressions=1, batch_size=4, seed=9
    )
    dcfg = DeformationConfig(
        mode="expr_only", lat_dim_expr=8, hidden_dim=64, n_layers=4
    )
    ddec = make_deformation_decoder(dcfg)
    dparams = ddec.init(jax.random.PRNGKey(0))
    shape_state = {
        "params": {},
        "latents": np.asarray(tr.latents[:, :4]),
        "latents_val": np.asarray(tr.latents_val[:, :4]),
    }
    cfg = {
        "training": {
            "batch_size": 4, "ckpt_interval": 10**9,
            "grad_clip": 0.025, "grad_clip_lat": 0.025,
            "lambdas": {
                "corresp": 100.0, "lat_reg": 5e-5, "loss_reg_zero": 5e-5
            },
            "lr": 0.001, "lr_lat": 0.005,
            "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": 100, "lr_decay_interval_lat": 100,
            "weight_decay": 0.0005,
        }
    }
    dtr = DeformationTrainer(
        ddec, dparams, None, cfg, train_ds, val_ds, "gate_def",
        exp_dir=str(tmp_path), shape_state=shape_state,
        logger=MetricsLogger(quiet=True),
    )
    dtr.train_model(80)

    # scan 1 = (subject 0, expression 1): a genuinely non-neutral warp
    scan = 1
    subj = train_ds.subject_steps[scan]
    mesh_neutral = extract_mesh(
        dec, tr.params, tr.latents[subj][None], *BOX, 64, use_pallas=False
    )
    mesh_def = deform_mesh(
        mesh_neutral, ddec, dtr.params, np.asarray(dtr.latents[scan])[None],
        lat_shape=np.asarray(tr.latents[subj, :4])[None],
    )
    # GT posed surface: the dataset's analytic warp of the GT ellipsoid
    gt_neutral = _gt_surface(ident.radii[subj], ident.centers[subj])
    gt_posed = train_ds.warp(scan, gt_neutral)

    moved = float(
        np.abs(np.asarray(mesh_def.vertices) - np.asarray(mesh_neutral.vertices)).max()
    )
    assert moved > 0.01, "deformation field is (near) zero"

    ch_neutral = _chamfer_mesh_vs_points(mesh_neutral, gt_posed)
    ch_def = _chamfer_mesh_vs_points(mesh_def, gt_posed)
    assert ch_def < ch_neutral, (
        f"deformed mesh no closer to posed GT ({ch_def} vs {ch_neutral})"
    )
    assert ch_def < 0.03, f"deformed chamfer {ch_def}"
