"""YAML config handling and model builders shared by the CLI scripts.

Reproduces the reference's experiment-dir config snapshotting semantics
(scripts/training/train.py:33-43): the first run of an experiment name
snapshots the passed config into ``{exp_dir}/configs.yaml``; re-running the
same name IGNORES the passed config and reloads the snapshot.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import yaml

from nphm_tpu import env_paths
from nphm_tpu.models import (
    DeepSDFConfig,
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
    make_npm_decoder,
)


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def snapshot_or_reload_config(exp_dir: str, cfg: Optional[dict]) -> dict:
    """First run: snapshot cfg into the experiment dir.  Later runs: reload
    the snapshot and ignore the passed cfg."""
    fname = os.path.join(exp_dir, "configs.yaml")
    if not os.path.exists(exp_dir) or not os.path.exists(fname):
        assert cfg is not None, "new experiment requires a config file"
        os.makedirs(exp_dir, exist_ok=True)
        with open(fname, "w") as f:
            yaml.safe_dump(cfg, f, default_flow_style=False)
        print(f"Snapshotted config to {fname}")
        return cfg
    print(f"Loading config snapshot from {fname}")
    return load_yaml(fname)


def print_cfg(cfg: dict, title: str = ""):
    if title:
        print(f"#### {title} ####")
    print(json.dumps(cfg, sort_keys=True, indent=4))


def load_mean_anchors() -> np.ndarray:
    return np.load(env_paths.ANCHOR_MEAN_PATH).astype(np.float32)


def build_identity_decoder(cfg_decoder: dict, local: bool):
    """Build NPHM (local=True) or NPM identity decoder from a YAML 'decoder'
    (or 'id_decoder') block."""
    if local:
        mcfg = NPHMConfig(
            lat_dim_glob=cfg_decoder["decoder_lat_dim_glob"],
            lat_dim_loc=cfg_decoder["decoder_lat_dim_loc"],
            hidden_dim=cfg_decoder["decoder_hidden_dim"],
            n_loc=cfg_decoder["decoder_nloc"],
            n_symm_pairs=cfg_decoder["decoder_nsymm_pairs"],
            n_layers=cfg_decoder["decoder_nlayers"],
            pos_mlp_dim=cfg_decoder.get("pos_mlp_dim", 256),
        )
        return make_nphm_decoder(mcfg, load_mean_anchors())
    mcfg = DeepSDFConfig(
        lat_dim=cfg_decoder["decoder_lat_dim"],
        hidden_dim=cfg_decoder["decoder_hidden_dim"],
        n_layers=cfg_decoder.get("decoder_nlayers", 8),
        geometric_init=True,
        out_dim=1,
    )
    return make_npm_decoder(mcfg)


def build_expression_decoder(cfg: dict, mode: str):
    """Build the stage-2 expression decoder from a full config (ex_decoder +
    id_decoder blocks).  mode == 'npm' selects the global DeepSDF offsets
    network (reference train_corresp.py:71-90)."""
    if mode == "npm":
        mcfg = DeepSDFConfig(
            lat_dim=cfg["id_decoder"]["decoder_lat_dim"]
            + cfg["ex_decoder"]["decoder_lat_dim"],
            hidden_dim=cfg["ex_decoder"].get("decoder_hidden_dim", 1024),
            n_layers=cfg["ex_decoder"].get("decoder_nlayers", 8),
            geometric_init=False,
            out_dim=3,
        )
        base = make_npm_decoder(mcfg)

        # conform to the expression-decoder interface: lat_dim == expr dim
        import dataclasses

        def apply(params, xyz, lat, anchors=None, **kw):
            kw.pop("training", None)
            kw.pop("rng", None)
            pred, _ = base.apply(params, xyz, lat)
            return pred, None

        return dataclasses.replace(
            base,
            kind="deformation_npm",
            apply=apply,
            lat_dim=cfg["ex_decoder"]["decoder_lat_dim"],
        )
    mcfg = DeformationConfig(
        mode=mode,
        lat_dim_expr=cfg["ex_decoder"]["decoder_lat_dim_expr"],
        lat_dim_id=cfg["ex_decoder"]["decoder_lat_dim_id"],
        lat_dim_glob_shape=cfg["id_decoder"]["decoder_lat_dim_glob"],
        lat_dim_loc_shape=cfg["id_decoder"]["decoder_lat_dim_loc"],
        n_loc=cfg["id_decoder"].get("decoder_nloc", 39),
        hidden_dim=cfg["ex_decoder"]["decoder_hidden_dim"],
        n_layers=cfg["ex_decoder"]["decoder_nlayers"],
        out_dim=3,
    )
    return make_deformation_decoder(mcfg)


def fitting_overrides_from_cfg(cfg: dict):
    """Joint-fit (lambdas, schedule) overrides from a fitting YAML.

    The reference ships a ``lambdas_shape`` block in its fitting config
    (scripts/configs/fitting_nphm.yaml:15-21) but hardcodes the joint-fit
    weights in code (fitting_pointclouds.py:253-266) — the YAML block is
    dead there.  Here the config surface is live: a ``lambdas`` (alias
    ``lambdas_expr``) mapping overrides ``default_joint_lambdas`` term by
    term, and a ``schedule`` mapping of ``{term: {step: divisor}}`` (plus
    the ``lr`` row) overrides ``default_joint_schedule``.  Returns
    ``(lambdas | None, schedule | None)`` ready for ``fit_joint``.
    """
    from nphm_tpu.fitting.inference import default_joint_lambdas

    lambdas = cfg.get("lambdas") or cfg.get("lambdas_expr")
    if lambdas is not None:
        merged = default_joint_lambdas()
        unknown = set(lambdas) - set(merged)
        if unknown:
            raise ValueError(f"unknown fitting lambdas: {sorted(unknown)}")
        merged.update({k: float(v) for k, v in lambdas.items()})
        lambdas = merged

    schedule = cfg.get("schedule")
    if schedule is not None:
        schedule = {
            str(term): {int(step): float(div) for step, div in rows.items()}
            for term, rows in schedule.items()
        }
    return lambdas, schedule
