"""PyTorch-reference checkpoint conversion.

Lets a user of the reference implementation transplant trained weights into
this framework.  Handles the three decoder families and the trainer
checkpoint container:

- NPHM ensemble (``FastEnsembleDeepSDFMirrored``, reference
  EnsembledDeepSDF.py:153): keys ``ensembled_deep_sdf.lin{i}.{weight,bias}``
  with shapes ``[n_distinct, out, in]`` / ``[n_distinct, out]`` (identical
  storage layout to ours — symmetric members first, one slot per pair) and
  ``mlp_pos.{0,2,4}.{weight,bias}``.
- NPM / expression DeepSDF (deepSDF.py:6): keys ``lin{i}.{weight,bias}``.
- DeformationNetwork (deepSDF.py:118): trunk under ``defDeepSDF.lin{i}.*``
  plus per-mode conditioning heads (``compressor.0.*``, GNN combiners).
- Trainer checkpoints (training.py:190-201): a dict with
  ``decoder_state_dict`` and ``latent_codes[_val]_state_dict``
  (``Embedding.weight`` tables).

All functions accept either numpy arrays or cpu torch tensors as values.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from nphm_tpu.models.deepsdf import DeepSDFConfig
from nphm_tpu.models.deformation import DeformationConfig
from nphm_tpu.models.ensemble import NPHMConfig


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> Dict:
    return {"w": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _strip_prefix(sd: Mapping, prefix: str) -> Dict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference trainer checkpoint ``.tar`` into plain dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {"epoch": int(ckpt.get("epoch", 0))}
    if "decoder_state_dict" in ckpt:
        out["decoder_state_dict"] = {
            k: _np(v) for k, v in ckpt["decoder_state_dict"].items()
        }
    for key in ("latent_codes_state_dict", "latent_codes_val_state_dict"):
        if key in ckpt:
            out[key] = {k: _np(v) for k, v in ckpt[key].items()}
    return out


def latent_table_from_state_dict(sd: Mapping) -> jnp.ndarray:
    """``Embedding.weight`` -> [n_rows, lat_dim] table."""
    return jnp.asarray(_np(sd["weight"]))


def nphm_params_from_state_dict(
    sd: Mapping, cfg: NPHMConfig, mean_anchors
) -> Dict:
    """FastEnsembleDeepSDFMirrored state dict -> our parameter pytree.

    mean_anchors: [n_loc, 3] (the reference holds them as a plain attribute
    loaded from assets/anchors_39.npy, so they are NOT in the state dict).
    """
    shapes, _ = cfg.layer_shapes
    ensemble = []
    for i in range(len(shapes)):
        w = _np(sd[f"ensembled_deep_sdf.lin{i}.weight"])
        b = _np(sd[f"ensembled_deep_sdf.lin{i}.bias"])
        expect_w = (cfg.n_distinct, shapes[i][1], shapes[i][0])
        if w.shape != expect_w:
            raise ValueError(
                f"lin{i}.weight has shape {w.shape}, config expects {expect_w}"
            )
        ensemble.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    mlp_pos = [_linear(sd, f"mlp_pos.{j}") for j in (0, 2, 4)]
    return {
        "ensemble": ensemble,
        "mlp_pos": mlp_pos,
        "mean_anchors": jnp.asarray(
            _np(mean_anchors).reshape(cfg.n_loc, 3)
        ),
    }


def deepsdf_params_from_state_dict(
    sd: Mapping, cfg: DeepSDFConfig, prefix: str = ""
) -> Dict:
    """DeepSDF state dict (``lin{i}.*``) -> our parameter pytree."""
    shapes, _ = cfg.layer_shapes
    layers = []
    for i in range(len(shapes)):
        lin = _linear(sd, f"{prefix}lin{i}")
        expect = (shapes[i][1], shapes[i][0])
        if lin["w"].shape != expect:
            raise ValueError(
                f"{prefix}lin{i}.weight has shape {lin['w'].shape}, "
                f"config expects {expect}"
            )
        layers.append(lin)
    return {"layers": layers}


def deformation_params_from_state_dict(
    sd: Mapping, cfg: DeformationConfig
) -> Dict:
    """DeformationNetwork state dict -> our parameter pytree."""
    params = {
        "trunk": deepsdf_params_from_state_dict(
            sd, cfg.trunk_cfg, prefix="defDeepSDF."
        )
    }
    if cfg.mode == "compress":
        params["compressor"] = _linear(sd, "compressor.0")
    elif cfg.mode == "GNN":
        params["pos_enc"] = [_linear(sd, f"pos_enc.{j}") for j in (0, 2)]
        params["local_combiner"] = [
            _linear(sd, f"local_combiner.{j}") for j in (0, 2)
        ]
        params["global_combiner"] = [
            _linear(sd, f"global_combiner.{j}") for j in (0, 2)
        ]
    return params


def nphm_state_dict_from_params(params) -> Dict[str, np.ndarray]:
    """Inverse mapping (ours -> reference layout), for round-trips/export."""
    sd = {}
    for i, lin in enumerate(params["ensemble"]):
        sd[f"ensembled_deep_sdf.lin{i}.weight"] = _np(lin["w"])
        sd[f"ensembled_deep_sdf.lin{i}.bias"] = _np(lin["b"])
    for j, lin in zip((0, 2, 4), params["mlp_pos"]):
        sd[f"mlp_pos.{j}.weight"] = _np(lin["w"])
        sd[f"mlp_pos.{j}.bias"] = _np(lin["b"])
    return sd


def deepsdf_state_dict_from_params(params, prefix: str = "") -> Dict:
    sd = {}
    for i, lin in enumerate(params["layers"]):
        sd[f"{prefix}lin{i}.weight"] = _np(lin["w"])
        sd[f"{prefix}lin{i}.bias"] = _np(lin["b"])
    return sd


def deformation_state_dict_from_params(params) -> Dict:
    sd = deepsdf_state_dict_from_params(params["trunk"], prefix="defDeepSDF.")
    if "compressor" in params:
        sd["compressor.0.weight"] = _np(params["compressor"]["w"])
        sd["compressor.0.bias"] = _np(params["compressor"]["b"])
    for name in ("pos_enc", "local_combiner", "global_combiner"):
        if name in params:
            for j, lin in zip((0, 2), params[name]):
                sd[f"{name}.{j}.weight"] = _np(lin["w"])
                sd[f"{name}.{j}.bias"] = _np(lin["b"])
    return sd
