"""Data-prep CLI tests: regenerate supervision from raw dummy meshes and
verify the outputs feed the training datasets."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    """Dummy tree with supervision dirs REMOVED (scripts must rebuild them)."""
    from nphm_tpu.data.dummy import generate_dummy_data

    # 3: train split; 341: test split (single-view obs); 199: eval split
    root = str(tmp_path_factory.mktemp("raw"))
    generate_dummy_data(root, subjects=(3, 341, 199), n_expressions=2)
    shutil.rmtree(os.path.join(root, "supervision_identity"))
    shutil.rmtree(os.path.join(root, "supervision_deformation"))
    shutil.rmtree(os.path.join(root, "single_view"))
    return root


def _env(root):
    from _subproc import cpu_subprocess_env

    from nphm_tpu.data.dummy import dummy_env

    return cpu_subprocess_env(dummy_env(root))


def _run(args, env):
    p = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    return p.stdout


@pytest.mark.integration
def test_data_processing_pipeline(raw_root):
    env = _env(raw_root)

    # --- identity supervision -------------------------------------------
    _run(
        ["scripts/data_processing/sample_surface.py", "--n_samples", "200000",
         "--n_samples_off", "20000", "--n_workers", "1"],
        env,
    )
    face_chunk = os.path.join(
        env["NPHM_SUPERVISION_IDENTITY"], "341", "0_0_face.npy"
    )
    assert os.path.exists(face_chunk)
    data = np.load(face_chunk)
    assert data.shape[1] == 6 and len(data) > 1000
    # normals approximately unit
    nrm = np.linalg.norm(data[:, 3:], axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-3)
    # face chunks are in the z>0 region (dummy face mask) modulo threshold
    assert (data[:, 2] > -0.25).mean() > 0.95

    # --- deformation supervision -----------------------------------------
    _run(
        ["scripts/data_processing/sample_deformation_field.py",
         "--n_samples", "20000", "--n_workers", "1"],
        env,
    )
    corresp_path = os.path.join(
        env["NPHM_SUPERVISION_DEFORMATION"], "341", "001", "corresp_0.npy"
    )
    assert os.path.exists(corresp_path)
    corresp = np.load(corresp_path)
    assert corresp.shape[1] == 6
    # dummy expression 1 is a pure translation of the neutral: the
    # correspondence offsets must be (nearly) constant
    delta = corresp[:, 3:] - corresp[:, :3]
    assert delta.std(axis=0).max() < 0.02, delta.std(axis=0)

    # --- single-view observations ----------------------------------------
    _run(
        ["scripts/data_processing/generate_single_view_observations.py",
         "--subjects", "341", "--n_points", "1000"],
        env,
    )
    obs_path = os.path.join(env["NPHM_DATA_SINGLE_VIEW"], "341", "0", "obs.npy")
    back_path = os.path.join(
        env["NPHM_DATA_SINGLE_VIEW"], "341", "0", "obs_back.npy"
    )
    assert os.path.exists(obs_path) and os.path.exists(back_path)
    obs = np.load(obs_path)
    assert obs.shape == (1000, 3)
    # observed points lie on the subject surface (ellipsoid-ish radii)
    r = np.linalg.norm(obs, axis=-1)
    assert 0.2 < r.mean() < 0.7

    # --- outputs feed the training datasets -------------------------------
    for k, v in _env(raw_root).items():
        os.environ[k] = v
    import importlib

    import nphm_tpu.env_paths as ep

    importlib.reload(ep)
    import nphm_tpu.data.manager as mgr
    import nphm_tpu.data.datasets as ds

    importlib.reload(mgr)
    importlib.reload(ds)
    try:
        train = ds.IdentityDataset(
            "train", 100, 50, batch_size=1, sigma_near=0.01, has_anchors=True
        )
        batch = next(train.batch_iter(seed=0))
        assert batch["points_face"].shape == (1, 100, 3)
        assert batch["gt_anchors"].shape == (1, 39, 3)

        dtrain = ds.DeformationDataset("train", 200, batch_size=2)
        dbatch = next(dtrain.batch_iter(seed=0))
        assert dbatch["points_neutral"].shape == (2, 200, 3)
    finally:
        importlib.reload(ep)
        importlib.reload(mgr)
        importlib.reload(ds)


@pytest.mark.integration
def test_example_usage_cli(raw_root):
    env = _env(raw_root)
    out = _run(
        ["scripts/dataset/example_usage.py", "--max_subjects", "2"], env
    )
    assert "landmarks (68, 3)" in out
    assert "anchors (39, 3)" in out


def test_nonrigid_expression_mode(tmp_path):
    """expression_mode="nonrigid" produces spatially-varying warps: the
    posed scan is NOT a translation of the neutral (pairwise distances
    change), the registration stays in shared topology under the same warp,
    and the deformation supervision carries the non-constant displacement
    the compress-mode field must learn."""
    from nphm_tpu.data.dummy import generate_dummy_data
    from nphm_tpu.utils.mesh_io import read_ply

    root = str(tmp_path / "nr")
    generate_dummy_data(
        root, subjects=(3,), n_expressions=2, n_supervision=2000,
        expression_mode="nonrigid",
    )
    d = os.path.join(root, "dataset", "003")
    m0 = read_ply(os.path.join(d, "000", "scan.ply"))
    m1 = read_ply(os.path.join(d, "001", "scan.ply"))
    assert np.array_equal(m0.faces, m1.faces)
    disp = m1.vertices - m0.vertices
    assert np.linalg.norm(disp, axis=-1).max() > 0.02  # it moved
    # translation would give a spatially-constant displacement
    spread = disp.std(axis=0).max()
    assert spread > 5e-3, spread

    r0 = read_ply(os.path.join(d, "000", "registration.ply"))
    r1 = read_ply(os.path.join(d, "001", "registration.ply"))
    assert r0.vertices.shape == r1.vertices.shape  # shared topology preserved

    # supervision correspondences carry the same non-rigid displacement
    c = np.load(
        os.path.join(root, "supervision_deformation", "003", "001",
                     "corresp_0.npy")
    )
    pn, pp = c[:, :3], c[:, 3:6]
    cd = pp - pn
    assert np.linalg.norm(cd, axis=-1).max() > 0.02
    assert cd.std(axis=0).max() > 5e-3

    # neutral expression is untouched in both modes
    c0 = np.load(
        os.path.join(root, "supervision_deformation", "003", "000",
                     "corresp_0.npy")
    )
    np.testing.assert_allclose(c0[:, :3], c0[:, 3:6], atol=1e-5)
