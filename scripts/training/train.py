#!/usr/bin/env python
"""Stage-1 training entry point (identity SDF space).

CLI-compatible with reference scripts/training/train.py:
  python scripts/training/train.py -exp_name EXP -cfg_file configs/nphm.yaml -local
"""

import argparse
import os

import jax
import numpy as np

import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

from nphm_tpu import env_paths
from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
from nphm_tpu.config import (
    build_identity_decoder,
    load_yaml,
    print_cfg,
    snapshot_or_reload_config,
)
from nphm_tpu.data.datasets import IdentityDataset
from nphm_tpu.training.trainer import IdentityTrainer
from nphm_tpu.utils.logging_utils import MetricsLogger


def main():
    parser = argparse.ArgumentParser(description="Run Model")
    parser.add_argument("-exp_name", required=True, type=str)
    parser.add_argument("-cfg_file", type=str)
    parser.add_argument("-closed", action="store_true")
    parser.add_argument("-local", action="store_true")
    parser.add_argument("-wandb", action="store_true")
    parser.add_argument("-seed", type=int, default=0)
    args, _ = parser.parse_known_args()

    cfg = load_yaml(args.cfg_file) if args.cfg_file else None
    exp_dir = os.path.join(env_paths.EXPERIMENT_DIR, args.exp_name)
    cfg = snapshot_or_reload_config(exp_dir, cfg)
    print_cfg(cfg)

    kwargs = dict(
        n_supervision_points_face=cfg["training"]["npoints_decoder"],
        n_supervision_points_non_face=cfg["training"]["npoints_decoder_non"],
        batch_size=cfg["training"]["batch_size"],
        sigma_near=cfg["training"]["sigma_near"],
        has_anchors=args.local,
        is_closed=args.closed,
    )
    train_dataset = IdentityDataset(mode="train", **kwargs)
    val_dataset = IdentityDataset(mode="val", **kwargs)
    print(f"Train dataset: {len(train_dataset)} subjects; "
          f"val: {len(val_dataset)} subjects")

    decoder = build_identity_decoder(cfg["decoder"], local=args.local)
    params = decoder.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"Number of parameters in decoder: {n_params}")

    logger = MetricsLogger(
        log_dir=exp_dir, use_wandb=args.wandb, project="shape_space", config=cfg
    )
    # multi-chip: shard the batch axis over all local devices (DP); the
    # trainer falls back to the single-device step for ragged batches
    mesh = None
    if cfg["training"].get("data_parallel", True) and len(jax.devices()) > 1:
        from nphm_tpu.parallel.mesh import get_device_mesh

        mesh = get_device_mesh()
        print(f"Data-parallel training over {mesh.size} devices")

    trainer = IdentityTrainer(
        decoder, params, cfg, train_dataset, val_dataset, args.exp_name,
        logger=logger, seed=args.seed, mesh=mesh,
        recon_resolution=cfg["training"].get("recon_resolution", 256),
    )
    trainer.train_model(cfg["training"].get("nepochs", 30001))


if __name__ == "__main__":
    main()
