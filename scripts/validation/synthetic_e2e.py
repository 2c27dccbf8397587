"""Production-dims end-to-end quality run on synthetic analytic geometry.

The CPU test suite gates reconstruction quality at TINY dims
(tests/test_accuracy_gate.py).  This harness runs the same
observe -> train -> fit -> extract -> deform -> evaluate loop at FULL
production dims (NPHM 39-anchor ensemble, 1344-d latents; compress-mode
deformation net) on whatever backend is available — on a real TPU it
exercises the fused training kernel, the Pallas extraction kernel, and the
warm-started fit engine end to end — and prints ONE JSON line of measured
Chamfer-L1 numbers (reconstruction of a train subject, fit of a HELD-OUT
subject, deformation toward a posed surface) plus wall times.

Real-data accuracy parity (BASELINE.md's published mm numbers) cannot be
reproduced without the license-gated NPHM dataset; this harness is the
strongest substitute: closed-form ground truth, the production model sizes,
the production code paths, real hardware.

Usage:  python scripts/validation/synthetic_e2e.py [--epochs 1500]
        [--def_epochs 300] [--resolution 128] [--fit_steps 500] [--tiny]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402

from nphm_tpu.data.sampling import sample_mesh_surface  # noqa: E402
from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
from nphm_tpu.data.synthetic import (  # noqa: E402
    SyntheticDeformationDataset,
    SyntheticIdentityDataset,
    _ellipsoid_surface,
)
from nphm_tpu.evaluation.metrics import eval_pointcloud  # noqa: E402
from nphm_tpu.fitting import FittingConfig, fit_identity  # noqa: E402
from nphm_tpu.models import (  # noqa: E402
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
)
from nphm_tpu.reconstruction.extract import (  # noqa: E402
    deform_mesh,
    extract_mesh,
)
from nphm_tpu.training.trainer import IdentityTrainer  # noqa: E402
from nphm_tpu.training.trainer_corresp import DeformationTrainer  # noqa: E402
from nphm_tpu.utils.logging_utils import MetricsLogger  # noqa: E402

BOX = ((-0.7, -0.7, -0.7), (0.7, 0.7, 0.7))


def _chamfer(mesh, gt_pts):
    pred, _ = sample_mesh_surface(mesh, 20000, rng=np.random.default_rng(42))
    return float(
        eval_pointcloud(pred, gt_pts, metric_space=False)["chamfer_l1"]
    )


def _gt_surface(radii, center, n=20000, seed=42):
    return _ellipsoid_surface(radii, center, n, np.random.default_rng(seed))[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--def_epochs", type=int, default=300)
    ap.add_argument("--subjects", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--fit_steps", type=int, default=500)
    ap.add_argument(
        "--tiny", action="store_true",
        help="tiny dims for a quick smoke run (CI/CPU)",
    )
    args = ap.parse_args()

    out = {"backend": jax.default_backend(), "production_dims": not args.tiny}
    t_all = time.time()

    if args.tiny:
        cfg_m = NPHMConfig(
            lat_dim_glob=8, lat_dim_loc=4, n_loc=7, n_symm_pairs=3,
            hidden_dim=16, n_layers=4, pos_mlp_dim=16,
        )
        dcfg = DeformationConfig(
            mode="compress", lat_dim_expr=8, lat_dim_id=8,
            lat_dim_glob_shape=cfg_m.lat_dim_glob,
            lat_dim_loc_shape=cfg_m.lat_dim_loc, n_loc=cfg_m.n_loc,
            hidden_dim=32, n_layers=4,
        )
    else:
        cfg_m = NPHMConfig()       # flagship: 39 anchors, 1344-d latent
        dcfg = DeformationConfig()  # compress mode, 512 x 6 trunk

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(cfg_m.n_loc, 3))
    mean_anchors = (
        0.45 * dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    ).astype(np.float32)
    dec = make_nphm_decoder(cfg_m, mean_anchors)
    params = dec.init(jax.random.PRNGKey(0))

    # --- stage 1: identity training on analytic ellipsoids ---------------
    ident = SyntheticIdentityDataset(
        n_subjects=args.subjects, n_face=750, n_non_face=250,
        batch_size=args.subjects, n_anchors=cfg_m.n_loc, seed=0,
    )
    val = SyntheticIdentityDataset(
        n_subjects=2, n_face=750, n_non_face=250, batch_size=2,
        n_anchors=cfg_m.n_loc, seed=5,
    )
    tcfg = {
        "training": {
            "batch_size": args.subjects, "ckpt_interval": 10**9,
            "grad_clip": 0.1, "grad_clip_lat": 0.1,
            "lr": 0.0008, "lr_lat": 0.002,
            "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
            "lr_decay_interval": max(args.epochs // 3, 1),
            "lr_decay_interval_lat": max(args.epochs // 3, 1),
            "npoints_decoder": 750, "npoints_decoder_non": 250,
            "sigma_near": 0.01, "weight_decay": 0.01,
            "lambdas": {
                "lat_reg": 0.01, "surf_sdf": 2.0, "normals": 0.3,
                "space_sdf": 0.01, "grad": 0.1, "anchors": 7.5,
                "symm_dist": 0.01, "middle_dist": 0.0,
            },
        }
    }
    with tempfile.TemporaryDirectory() as tmp:
        tr = IdentityTrainer(
            dec, params, tcfg, ident, val, "synth_e2e", exp_dir=tmp,
            logger=MetricsLogger(quiet=True),
        )
        t0 = time.time()
        tr.train_model(args.epochs)
        out["train_s"] = round(time.time() - t0, 1)
        out["train_steps"] = args.epochs  # one batch per epoch

        # --- reconstruction quality of a train subject -------------------
        t0 = time.time()
        mesh0 = extract_mesh(
            dec, tr.params, np.asarray(tr.latents[0])[None], *BOX,
            args.resolution,
        )
        out["recon_extract_s"] = round(time.time() - t0, 2)
        out["recon_chamfer"] = round(
            _chamfer(mesh0, _gt_surface(ident.radii[0], ident.centers[0])), 5
        )

        # --- fit a HELD-OUT ellipsoid from point clouds -------------------
        radii = np.array([0.46, 0.52, 0.41], np.float32)
        center = np.array([0.02, -0.01, 0.03], np.float32)
        obs_rng = np.random.default_rng(7)
        obs = [
            _ellipsoid_surface(radii, center, 2500, obs_rng)[0]
            for _ in range(3)
        ]
        fc = FittingConfig(
            n_steps=args.fit_steps, n_obs_per_batch=3, n_points_per_obs=1000,
            log_every=10**9,
        )
        t0 = time.time()
        lat_fit, _anchors, _h = fit_identity(
            dec, tr.params, obs, cfg=fc, verbose=False
        )
        out["fit_s"] = round(time.time() - t0, 2)
        mesh_fit = extract_mesh(
            dec, tr.params, np.asarray(lat_fit).reshape(1, -1), *BOX,
            args.resolution,
        )
        out["heldout_fit_chamfer"] = round(
            _chamfer(mesh_fit, _gt_surface(radii, center)), 5
        )

        # --- stage 2: deformation field (compress mode) -------------------
        def_train = SyntheticDeformationDataset(
            ident, n_expressions=2, n_points=1000,
            batch_size=min(args.subjects, 8), warp_scale=0.08,
        )
        # val warps must be over the VAL identity dataset: the trainer
        # conditions val batches on shape_state["latents_val"], whose rows
        # are that dataset's subjects
        def_val = SyntheticDeformationDataset(
            val, n_expressions=1, n_points=1000,
            batch_size=2, seed=9,
        )
        ddec = make_deformation_decoder(dcfg)
        dparams = ddec.init(jax.random.PRNGKey(1))
        shape_state = {
            "params": tr.params,
            "latents": np.asarray(tr.latents),
            "latents_val": np.asarray(tr.latents_val),
        }
        dtcfg = {
            "training": {
                "batch_size": min(args.subjects, 8), "ckpt_interval": 10**9,
                "grad_clip": 0.025, "grad_clip_lat": 0.025,
                "lambdas": {
                    "corresp": 100.0, "lat_reg": 5e-5, "loss_reg_zero": 5e-5,
                },
                "lr": 0.0005, "lr_lat": 0.0025,
                "lr_decay_factor": 0.5, "lr_decay_factor_lat": 0.5,
                "lr_decay_interval": max(args.def_epochs // 3, 1),
                "lr_decay_interval_lat": max(args.def_epochs // 3, 1),
                "weight_decay": 0.0005,
            }
        }
        dtr = DeformationTrainer(
            ddec, dparams, dec, dtcfg, def_train, def_val, "synth_e2e_def",
            exp_dir=tmp, shape_state=shape_state,
            logger=MetricsLogger(quiet=True),
        )
        t0 = time.time()
        dtr.train_model(args.def_epochs)
        out["def_train_s"] = round(time.time() - t0, 1)

        scan = 1  # (subject 0, expression 1): a genuinely non-neutral warp
        subj = def_train.subject_steps[scan]
        mesh_neutral = extract_mesh(
            dec, tr.params, np.asarray(tr.latents[subj])[None], *BOX,
            args.resolution,
        )
        import jax.numpy as jnp

        _, anchors = dec.apply(
            tr.params, jnp.zeros((1, 1, 3)),
            np.asarray(tr.latents[subj])[None], training=False,
        )
        mesh_def = deform_mesh(
            mesh_neutral, ddec, dtr.params,
            np.asarray(dtr.latents[scan])[None],
            anchors=None if anchors is None else np.asarray(anchors[0]),
            lat_shape=np.asarray(tr.latents[subj])[None],
        )
        gt_neutral = _gt_surface(ident.radii[subj], ident.centers[subj])
        gt_posed = def_train.warp(scan, gt_neutral)
        out["def_neutral_chamfer_vs_posed"] = round(
            _chamfer(mesh_neutral, gt_posed), 5
        )
        out["def_deformed_chamfer_vs_posed"] = round(
            _chamfer(mesh_def, gt_posed), 5
        )

        # --- the FULL protocol: joint identity+expression fit of a
        # HELD-OUT subject from POSED observations (Broyden correspondence
        # search through the trained warp + IFT gradients), then canonical
        # extraction and per-expression deformation — the reference's
        # fitting_pointclouds.py pipeline end to end ----------------------
        from nphm_tpu.fitting import fit_joint

        n_scans = len(def_train.subject_steps)
        warp_scans = [i % n_scans for i in range(3)]  # 3 trained warps
        eval_obs = 1 % len(warp_scans)  # the observation evaluated below
        posed_obs = []
        for i, ws in enumerate(warp_scans):
            cloud = _ellipsoid_surface(
                radii, center, 2500, np.random.default_rng(100 + i)
            )[0]
            posed_obs.append(def_train.warp(ws, cloud).astype(np.float32))
        t0 = time.time()
        lat_e, lat_s, anchors_fit, _h = fit_joint(
            dec, tr.params, ddec, dtr.params, posed_obs, cfg=fc,
            verbose=False,
        )
        out["joint_fit_s"] = round(time.time() - t0, 2)
        mesh_can = extract_mesh(
            dec, tr.params, np.asarray(lat_s).reshape(1, -1), *BOX,
            args.resolution,
        )
        out["joint_canonical_chamfer"] = round(
            _chamfer(mesh_can, _gt_surface(radii, center)), 5
        )
        mesh_posed_eval = deform_mesh(
            mesh_can, ddec, dtr.params, np.asarray(lat_e[eval_obs])[None],
            anchors=None if anchors_fit is None else np.asarray(anchors_fit[0]),
            lat_shape=np.asarray(lat_s).reshape(1, -1),
        )
        gt_posed_heldout = def_train.warp(
            warp_scans[eval_obs], _gt_surface(radii, center)
        )
        out["joint_posed_chamfer"] = round(
            _chamfer(mesh_posed_eval, gt_posed_heldout), 5
        )

    out["total_s"] = round(time.time() - t_all, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
