"""Numerical parity against the PyTorch reference implementation.

These tests load the reference model definitions (read-only, from the
REFERENCE_NPHM path if present), transplant our JAX parameters into the torch
modules, and require outputs to agree to float32 tolerance.  They are the
ground truth for "same model family"; they skip cleanly when the reference
checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REFERENCE_SRC = os.environ.get("REFERENCE_NPHM", "/root/reference/src")
if not os.path.isdir(REFERENCE_SRC):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, REFERENCE_SRC)

try:
    from NPHM.models.deepSDF import DeepSDF as TorchDeepSDF  # noqa: E402
    from NPHM.models.deepSDF import DeformationNetwork as TorchDeformation  # noqa: E402
    from NPHM.models.EnsembledDeepSDF import (  # noqa: E402
        FastEnsembleDeepSDFMirrored as TorchNPHM,
    )
except Exception:  # pragma: no cover
    pytest.skip("reference modules not importable", allow_module_level=True)

from nphm_tpu.models import (  # noqa: E402
    DeepSDFConfig,
    DeformationConfig,
    NPHMConfig,
    apply_deepsdf,
    apply_deformation,
    apply_nphm,
    init_deepsdf,
    init_deformation,
    init_nphm,
)


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


def set_linear(mod, p):
    with torch.no_grad():
        mod.weight.copy_(t(p["w"]))
        mod.bias.copy_(t(p["b"]))


def test_deepsdf_parity():
    cfg = DeepSDFConfig(lat_dim=512, hidden_dim=1024, n_layers=8, geometric_init=True)
    params = init_deepsdf(jax.random.PRNGKey(0), cfg)

    torch_model = TorchDeepSDF(lat_dim=512, hidden_dim=1024, nlayers=8, geometric_init=True)
    for i in range(len(params["layers"])):
        set_linear(getattr(torch_model, f"lin{i}"), params["layers"][i])
    torch_model.eval()

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    lat = (rng.normal(size=(2, 512)) * 0.1).astype(np.float32)

    ours = np.asarray(apply_deepsdf(params, cfg, jnp.asarray(xyz), jnp.asarray(lat)))
    with torch.no_grad():
        theirs, _ = torch_model(
            t(xyz), t(lat)[:, None, :].repeat(1, xyz.shape[1], 1)
        )
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


# Only training mode is compared exactly: in eval mode the reference's
# "background member = 1" hack (EnsembledDeepSDF.py:261) indexes the
# pre-permute [members, batch, points, out] tensor and therefore pins the
# last *point* instead of the background member.  We implement the documented
# intent (pin the background member), so eval-mode outputs legitimately differ
# wherever the background weight is non-negligible.
@pytest.mark.parametrize("training", [True])
def test_nphm_parity(training):
    cfg = NPHMConfig()
    rng = np.random.default_rng(1)
    mean_anchors = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    params = init_nphm(jax.random.PRNGKey(0), cfg, mean_anchors)

    torch_model = TorchNPHM(
        lat_dim_glob=cfg.lat_dim_glob,
        lat_dim_loc=cfg.lat_dim_loc,
        n_loc=cfg.n_loc,
        n_symm_pairs=cfg.n_symm_pairs,
        anchors=t(mean_anchors)[None, None],
        hidden_dim=cfg.hidden_dim,
        n_layers=cfg.n_layers,
        pos_mlp_dim=cfg.pos_mlp_dim,
    )
    for i in range(len(params["ensemble"])):
        set_linear(
            getattr(torch_model.ensembled_deep_sdf, f"lin{i}"), params["ensemble"][i]
        )
    for j, seq_idx in enumerate([0, 2, 4]):
        set_linear(torch_model.mlp_pos[seq_idx], params["mlp_pos"][j])
    torch_model.train(training)

    xyz = (rng.normal(size=(2, 50, 3)) * 0.4).astype(np.float32)
    lat = (rng.normal(size=(2, cfg.lat_dim)) * 0.1).astype(np.float32)

    sdf, anchors = apply_nphm(
        params, cfg, jnp.asarray(xyz), jnp.asarray(lat), training=training
    )
    with torch.no_grad():
        sdf_t, anchors_t = torch_model(t(xyz), t(lat)[:, None, :], None)
    np.testing.assert_allclose(
        np.asarray(anchors), anchors_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sdf), sdf_t.numpy(), rtol=1e-3, atol=1e-5)


def test_deformation_compress_parity():
    cfg = DeformationConfig(
        mode="compress", lat_dim_expr=200, lat_dim_id=32, lat_dim_glob_shape=64,
        lat_dim_loc_shape=32, n_loc=39, hidden_dim=512, n_layers=6,
    )
    params = init_deformation(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    mean_anchors = (rng.normal(size=(39, 3)) * 0.3).astype(np.float32)

    torch_model = TorchDeformation(
        mode="compress", lat_dim_expr=200, lat_dim_id=32, lat_dim_glob_shape=64,
        lat_dim_loc_shape=32, n_loc=39, anchors=t(mean_anchors)[None, None],
        hidden_dim=512, nlayers=6, input_dim=3, out_dim=3,
    )
    for i in range(len(params["trunk"]["layers"])):
        set_linear(getattr(torch_model.defDeepSDF, f"lin{i}"), params["trunk"]["layers"][i])
    set_linear(torch_model.compressor[0], params["compressor"])
    torch_model.eval()

    xyz = (rng.normal(size=(2, 40, 3)) * 0.4).astype(np.float32)
    lat = (rng.normal(size=(2, cfg.lat_dim_shape_full + cfg.lat_dim_expr)) * 0.1).astype(np.float32)
    anchors = (rng.normal(size=(2, 39, 3)) * 0.3).astype(np.float32)

    delta, extra = apply_deformation(
        params, cfg, jnp.asarray(xyz), jnp.asarray(lat), jnp.asarray(anchors)
    )
    with torch.no_grad():
        delta_t, extra_t = torch_model(
            t(xyz), t(lat)[:, None, :].repeat(1, xyz.shape[1], 1), t(anchors)
        )
    np.testing.assert_allclose(np.asarray(delta), delta_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(extra), extra_t.numpy(), rtol=1e-4, atol=1e-5)
