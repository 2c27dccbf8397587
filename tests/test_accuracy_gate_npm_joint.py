"""NPM-family joint-fit quality gate (VERDICT r3 item 1).

The reference publishes the NPM baseline alongside NPHM
(``/root/reference/README.md:199-209``) and ships its full pipeline: a
global DeepSDF identity (``src/NPHM/models/deepSDF.py:6-89``,
``scripts/configs/npm.yaml``), an npm-mode deformation network — a plain
DeepSDF(512+200 -> 3) offsets field (``scripts/training/train_corresp.py:71-78``)
— and NPM joint fitting (``scripts/configs/fitting_npm.yaml`` with
``local_shape: false``; the ``lat_dim_glob``-absent branches of
``src/NPHM/models/fitting.py``).  Before this module, NO test exercised
mode="npm" deformation training or ``fit_joint`` with a DeepSDF shape
decoder: a regression confined to those branches (the
``lat_dim_glob is None`` regularizers, the anchors-free conditioning, the
npm decoder wrapper in ``nphm_tpu/config.py:87-112``) would have passed the
whole suite.  This gate trains the tiny two-stage NPM model on analytic
ellipsoid heads — stage 2 through ``build_expression_decoder(cfg, "npm")``,
the exact constructor the CLIs use — joint-fits a HELD-OUT subject from
POSED observations, and asserts Chamfer-L1 below calibrated thresholds.

Calibration (CPU, this exact config, seed-pinned, 2026-08-19): recon
chamfer 0.0117, joint canonical 0.0312, joint posed 0.0356, n_valid
1384/1500; thresholds carry ~2-3x margin.
"""

import numpy as np
import pytest

import jax

from nphm_tpu.config import build_expression_decoder
from nphm_tpu.data.sampling import sample_mesh_surface
from nphm_tpu.data.synthetic import (
    SyntheticDeformationDataset,
    SyntheticIdentityDataset,
    _ellipsoid_surface,
)
from nphm_tpu.evaluation.metrics import eval_pointcloud
from nphm_tpu.fitting import FittingConfig, fit_joint
from nphm_tpu.models import DeepSDFConfig, make_npm_decoder
from nphm_tpu.reconstruction.extract import deform_mesh, extract_mesh
from nphm_tpu.utils.logging_utils import MetricsLogger

BOX = ((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7))
HELDOUT_RADII = np.array([0.46, 0.52, 0.41], np.float32)
HELDOUT_CENTER = np.array([0.02, -0.01, 0.03], np.float32)


def _chamfer(mesh, gt_pts):
    pred, _ = sample_mesh_surface(mesh, 20000, rng=np.random.default_rng(42))
    return eval_pointcloud(pred, gt_pts, metric_space=False)["chamfer_l1"]


def _gt_surface(radii, center, n=20000, seed=42):
    return _ellipsoid_surface(radii, center, n, np.random.default_rng(seed))[0]


@pytest.fixture(scope="module")
def npm_pipeline(tmp_path_factory):
    """Tiny-dims NPM pipeline: DeepSDF identity stage 1, npm-mode DeepSDF
    offsets field stage 2 (via the CLI's config constructor), joint fit of a
    held-out subject from posed clouds."""
    from nphm_tpu.training.trainer import IdentityTrainer
    from nphm_tpu.training.trainer_corresp import DeformationTrainer

    tmp = str(tmp_path_factory.mktemp("npm_joint_gate"))
    dec = make_npm_decoder(
        DeepSDFConfig(lat_dim=16, hidden_dim=64, n_layers=4,
                      geometric_init=True, radius_init=0.5)
    )
    params = dec.init(jax.random.PRNGKey(0))

    ident = SyntheticIdentityDataset(n_subjects=6, batch_size=6, seed=0)
    val = SyntheticIdentityDataset(n_subjects=2, batch_size=2, seed=5)
    epochs, def_epochs = 200, 80
    tcfg = {
        "training": {
            "batch_size": 6, "ckpt_interval": 10**9,
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
        dec, params, tcfg, ident, val, "npm_joint_gate", exp_dir=tmp,
        logger=MetricsLogger(quiet=True),
    )
    tr.train_model(epochs)

    # stage 2 through the SAME constructor the train_corresp/fitting CLIs
    # use for -mode npm (config.py:87-112): DeepSDF(id+expr -> 3 offsets)
    ddec = build_expression_decoder(
        {
            "id_decoder": {"decoder_lat_dim": 16},
            "ex_decoder": {
                "decoder_lat_dim": 8,
                "decoder_hidden_dim": 64,
                "decoder_nlayers": 4,
            },
        },
        mode="npm",
    )
    assert ddec.kind == "deformation_npm" and ddec.lat_dim == 8
    dparams = ddec.init(jax.random.PRNGKey(1))

    def_train = SyntheticDeformationDataset(
        ident, n_expressions=2, n_points=500, batch_size=6, warp_scale=0.08
    )
    def_val = SyntheticDeformationDataset(
        val, n_expressions=1, n_points=500, batch_size=2, seed=9
    )
    shape_state = {
        "params": tr.params,
        "latents": np.asarray(tr.latents),
        "latents_val": np.asarray(tr.latents_val),
    }
    dtcfg = {
        "training": {
            "batch_size": 6, "ckpt_interval": 10**9,
            "grad_clip": 0.025, "grad_clip_lat": 0.025,
            "lambdas": {
                "corresp": 100.0, "lat_reg": 5e-5, "loss_reg_zero": 5e-5,
            },
            "lr": 0.001, "lr_lat": 0.005,
            "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": def_epochs // 3,
            "lr_decay_interval_lat": def_epochs // 3,
            "weight_decay": 0.0005,
        }
    }
    dtr = DeformationTrainer(
        ddec, dparams, dec, dtcfg, def_train, def_val, "npm_joint_gate_def",
        exp_dir=tmp, shape_state=shape_state, logger=MetricsLogger(quiet=True),
    )
    dtr.train_model(def_epochs)

    # joint fit of a HELD-OUT ellipsoid from POSED observations through
    # three trained warps — the NPM analogue of the reference protocol
    warp_scans = [0, 1, 2]
    posed_obs = []
    for i, ws in enumerate(warp_scans):
        cloud = _ellipsoid_surface(
            HELDOUT_RADII, HELDOUT_CENTER, 1500, np.random.default_rng(100 + i)
        )[0]
        posed_obs.append(def_train.warp(ws, cloud).astype(np.float32))
    fc = FittingConfig(
        n_steps=150, n_obs_per_batch=3, n_points_per_obs=500, log_every=10**9
    )
    lat_e, lat_s, anchors_fit, hist = fit_joint(
        dec, tr.params, ddec, dtr.params, posed_obs, cfg=fc, verbose=False
    )
    assert anchors_fit is None  # NPM has no anchor MLP
    return dict(
        dec=dec, tr=tr, ident=ident, ddec=ddec, dtr=dtr,
        def_train=def_train, warp_scans=warp_scans,
        lat_e=lat_e, lat_s=lat_s, hist=hist,
    )


@pytest.mark.integration
def test_npm_trained_reconstruction_gate(npm_pipeline):
    """Auto-decoded DeepSDF reconstruction of a train subject below chamfer
    0.03 (calibrated 0.0117)."""
    f = npm_pipeline
    mesh = extract_mesh(
        f["dec"], f["tr"].params, np.asarray(f["tr"].latents[0])[None],
        *BOX, 64, use_pallas=False,
    )
    ch = _chamfer(mesh, _gt_surface(f["ident"].radii[0], f["ident"].centers[0]))
    assert ch < 0.03, f"NPM train-subject chamfer {ch}"


@pytest.mark.integration
def test_npm_joint_fit_canonical_gate(npm_pipeline):
    """fit_joint (Broyden + IFT through the npm-mode offsets field, global-
    latent regularizer branch) recovers the held-out canonical geometry below
    chamfer 0.08 (calibrated 0.0312), with most correspondences valid."""
    f = npm_pipeline
    mesh_can = extract_mesh(
        f["dec"], f["tr"].params, np.asarray(f["lat_s"]).reshape(1, -1),
        *BOX, 64, use_pallas=False,
    )
    ch = _chamfer(mesh_can, _gt_surface(HELDOUT_RADII, HELDOUT_CENTER))
    assert ch < 0.08, f"NPM joint-fit canonical chamfer {ch}"
    n_valid = float(np.asarray(f["hist"]["n_valid"])[-1])
    assert n_valid > 0.5 * 3 * 500, f"valid correspondences {n_valid}"


@pytest.mark.integration
def test_npm_joint_fit_posed_gate(npm_pipeline):
    """Canonical fit + fitted expression code deformed through the npm-mode
    field lands near the POSED ground truth (chamfer < 0.09, calibrated
    0.0356)."""
    f = npm_pipeline
    mesh_can = extract_mesh(
        f["dec"], f["tr"].params, np.asarray(f["lat_s"]).reshape(1, -1),
        *BOX, 64, use_pallas=False,
    )
    eval_obs = 1
    mesh_posed = deform_mesh(
        mesh_can, f["ddec"], f["dtr"].params,
        np.asarray(f["lat_e"][eval_obs])[None],
        lat_shape=np.asarray(f["lat_s"]).reshape(1, -1),
    )
    gt_posed = f["def_train"].warp(
        f["warp_scans"][eval_obs], _gt_surface(HELDOUT_RADII, HELDOUT_CENTER)
    )
    ch = _chamfer(mesh_posed, gt_posed)
    assert ch < 0.09, f"NPM joint-fit posed chamfer {ch}"
