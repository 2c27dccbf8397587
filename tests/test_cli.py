"""End-to-end CLI integration: dummy data -> two-stage training -> demo fit.

This is the framework's equivalent of the reference's dummy-data smoke test
(fitting_pointclouds.py -demo): every stage runs as a real subprocess through
the public scripts, on a generated synthetic dataset tree.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dummy_root(tmp_path_factory):
    from nphm_tpu.data.dummy import generate_dummy_data

    root = str(tmp_path_factory.mktemp("dummy"))
    generate_dummy_data(root, subjects=(351, 365, 199), n_expressions=2)
    return root


def _env(root):
    from _subproc import cpu_subprocess_env

    from nphm_tpu.data.dummy import dummy_env

    return cpu_subprocess_env(
        dummy_env(root), xla_flags="--xla_force_host_platform_device_count=2"
    )


def _run(args, env):
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"CLI failed: {' '.join(args)}\nSTDOUT:\n{proc.stdout[-4000:]}"
            f"\nSTDERR:\n{proc.stderr[-4000:]}"
        )
    return proc.stdout


TINY_ID_CFG = {
    "decoder": {
        "decoder_lat_dim_glob": 8,
        "decoder_lat_dim_loc": 4,
        "decoder_hidden_dim": 16,
        "decoder_nlayers": 2,
        "decoder_nloc": 39,
        "decoder_nsymm_pairs": 16,
        "pos_mlp_dim": 16,
    },
    "training": {
        "batch_size": 2,
        "ckpt_interval": 1,
        "grad_clip": 0.1,
        "grad_clip_lat": 0.1,
        "lr": 0.0005,
        "lr_lat": 0.001,
        "lr_decay_factor": 0.5,
        "lr_decay_factor_lat": 0.5,
        "lr_decay_interval": 5000,
        "lr_decay_interval_lat": 5000,
        "npoints_decoder": 100,
        "npoints_decoder_non": 50,
        "sigma_near": 0.01,
        "weight_decay": 0.01,
        "nepochs": 2,
        "lambdas": {
            "lat_reg": 0.01, "surf_sdf": 2.0, "normals": 0.3,
            "space_sdf": 0.01, "grad": 0.1, "anchors": 7.5,
            "symm_dist": 0.01, "middle_dist": 0.0,
        },
    },
}

TINY_DEF_CFG = {
    "ex_decoder": {
        "decoder_hidden_dim": 64,
        "decoder_lat_dim_expr": 8,
        "decoder_lat_dim_id": 8,
        "decoder_nlayers": 2,
    },
    "id_decoder": dict(TINY_ID_CFG["decoder"]),
    "training": {
        "batch_size": 2,
        "ckpt_interval": 1,
        "grad_clip": 0.025,
        "grad_clip_lat": 0.025,
        "lambdas": {"corresp": 100.0, "lat_reg": 5.0e-05, "loss_reg_zero": 5.0e-05},
        "lr": 0.0001,
        "lr_decay_factor": 0.5,
        "lr_decay_factor_lat": 0.5,
        "lr_decay_interval": 600,
        "lr_decay_interval_lat": 600,
        "lr_lat": 0.0005,
        "npoints_decoder": 200,
        "shape_ckpt": 1,
        "shape_exp_name": "tiny_id",
        "sigma_near": 0.01,
        "weight_decay": 0.0005,
        "nepochs": 2,
    },
}


@pytest.mark.integration
def test_full_cli_pipeline(dummy_root, tmp_path):
    env = _env(dummy_root)
    exp_dir = env["NPHM_EXPERIMENT_DIR"]

    # rename id_decoder key for the stage-2 builder (schema uses id_decoder)
    id_cfg_path = str(tmp_path / "tiny_id.yaml")
    with open(id_cfg_path, "w") as f:
        yaml.safe_dump(TINY_ID_CFG, f)
    def_cfg_path = str(tmp_path / "tiny_def.yaml")
    with open(def_cfg_path, "w") as f:
        yaml.safe_dump(TINY_DEF_CFG, f)

    # --- stage 1: identity training -------------------------------------
    out = _run(
        ["scripts/training/train.py", "-exp_name", "tiny_id",
         "-cfg_file", id_cfg_path, "-local"],
        env,
    )
    assert "Epoch     0" in out or "Epoch" in out
    assert os.path.exists(
        os.path.join(exp_dir, "tiny_id", "checkpoints", "checkpoint_epoch_1.pkl")
    )
    # config snapshot semantics: rerunning ignores the passed config
    assert os.path.exists(os.path.join(exp_dir, "tiny_id", "configs.yaml"))

    # --- stage 2: deformation training ----------------------------------
    out = _run(
        ["scripts/training/train_corresp.py", "-exp_name", "tiny_def",
         "-cfg_file", def_cfg_path, "-mode", "compress"],
        env,
    )
    assert os.path.exists(
        os.path.join(exp_dir, "tiny_def", "checkpoints", "checkpoint_epoch_1.pkl")
    )

    # --- fitting: -sample (random heads from prior) ----------------------
    # needs latent prior assets sized for the tiny model
    lat_dim = 8 + 40 * 4
    np.save(os.path.join(env["NPHM_ASSETS"], "nphm_lat_mean.npy"),
            np.zeros(lat_dim, np.float32))
    np.save(os.path.join(env["NPHM_ASSETS"], "nphm_lat_std.npy"),
            np.full(lat_dim, 0.1, np.float32))

    fit_cfg = {
        "exp_name_shape": "tiny_id", "checkpoint_shape": 1,
        "mode": "compress", "local_shape": True, "local_expr": False,
        "exp_name_expr": "tiny_def", "checkpoint_expr": 1,
    }
    fit_cfg_path = str(tmp_path / "fitting_tiny.yaml")
    with open(fit_cfg_path, "w") as f:
        yaml.safe_dump(fit_cfg, f)

    _run(
        ["scripts/fitting/fitting_pointclouds.py", "-cfg_file", fit_cfg_path,
         "-exp_name", "tiny", "-exp_tag", "sample", "-sample",
         "-n_samples", "2", "-resolution", "32", "-batch_points", "4096"],
        env,
    )
    assert os.path.exists(os.path.join(REPO, "nphm_shape_space_samples_085",
                                       "mesh_0001.ply"))
    # screenshot parity (reference pyvista capture, step_{:04d}.png)
    assert os.path.exists(os.path.join(REPO, "nphm_shape_space_samples_085",
                                       "step_0001.png"))

    # --- fitting: -demo (joint fit on dummy single-view clouds) ----------
    _run(
        ["scripts/fitting/fitting_pointclouds.py", "-cfg_file", fit_cfg_path,
         "-exp_name", "tiny", "-exp_tag", "demo", "-demo",
         "-n_steps", "10", "-resolution", "32", "-batch_points", "4096"],
        env,
    )
    out_dir = os.path.join(env["NPHM_FITTING_DIR"], "forward_tiny", "demo")
    meshes = [f for f in os.listdir(out_dir) if f.endswith(".ply")]
    lats = [f for f in os.listdir(out_dir) if f.endswith("_lat_shape.npy")]
    assert len(meshes) >= 4, meshes  # 2 subjects x 2 expressions
    assert len(lats) >= 4

    # --- fitting: -batch_subjects (vmapped group fit, auto subject-mesh
    # over the 2 virtual devices) ------------------------------------------
    _run(
        ["scripts/fitting/fitting_pointclouds.py", "-cfg_file", fit_cfg_path,
         "-exp_name", "tiny", "-exp_tag", "demo_batch", "-demo",
         "-batch_subjects", "2", "-n_steps", "10", "-resolution", "32",
         "-batch_points", "4096"],
        env,
    )
    batch_dir = os.path.join(env["NPHM_FITTING_DIR"], "forward_tiny",
                             "demo_batch")
    assert len([f for f in os.listdir(batch_dir) if f.endswith(".ply")]) >= 4

    # --- evaluation: render-sample + metrics + gather ---------------------
    _run(
        ["scripts/evaluation/eval.py", "--result_dir", out_dir,
         "--num_samps", "2000", "--subjects", "351", "365"],
        env,
    )
    eval_dir = os.path.join(out_dir, "evaluation")
    jsons = [
        os.path.join(r, f)
        for r, _, fs in os.walk(eval_dir)
        for f in fs
        if f == "metrics.json"
    ]
    assert jsons, f"no metrics.json under {eval_dir}"

    out = _run(
        ["scripts/evaluation/gather.py", "--result_dir", out_dir,
         "--subjects", "351", "365"],
        env,
    )
    assert os.path.exists(os.path.join(eval_dir, "total_merics.csv"))  # (sic)
    assert os.path.exists(os.path.join(eval_dir, "total_metrics_face.csv"))
