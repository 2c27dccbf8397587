#!/usr/bin/env python
"""Stage-2 training entry point (forward deformation / expression space).

CLI-compatible with reference scripts/training/train_corresp.py:
  python scripts/training/train_corresp.py -exp_name EXP \
      -cfg_file configs/nphm_def.yaml -mode compress
"""

import argparse
import os

import jax

import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

from nphm_tpu import env_paths
from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
from nphm_tpu.config import (
    build_expression_decoder,
    build_identity_decoder,
    load_yaml,
    print_cfg,
    snapshot_or_reload_config,
)
from nphm_tpu.data.datasets import DeformationDataset
from nphm_tpu.training.trainer_corresp import DeformationTrainer
from nphm_tpu.utils.logging_utils import MetricsLogger


def main():
    parser = argparse.ArgumentParser(description="Run Model")
    parser.add_argument("-exp_name", required=True, type=str)
    parser.add_argument("-cfg_file", type=str)
    parser.add_argument("-ckpt", type=int)
    parser.add_argument("-mode", required=True, type=str)
    parser.add_argument("-wandb", action="store_true")
    parser.add_argument("-seed", type=int, default=0)
    args, _ = parser.parse_known_args()

    cfg = load_yaml(args.cfg_file) if args.cfg_file else None
    if cfg is not None:
        cfg.setdefault("ex_decoder", {})["mode"] = args.mode
    exp_dir = os.path.join(env_paths.EXPERIMENT_DIR, args.exp_name)
    cfg = snapshot_or_reload_config(exp_dir, cfg)
    print_cfg(cfg)
    if args.ckpt is not None:
        cfg["training"]["ckpt"] = args.ckpt

    train_dataset = DeformationDataset(
        "train", cfg["training"]["npoints_decoder"], cfg["training"]["batch_size"]
    )
    val_dataset = DeformationDataset(
        "val", cfg["training"]["npoints_decoder"], cfg["training"]["batch_size"]
    )
    print(f"Train dataset: {len(train_dataset)} scans; val: {len(val_dataset)}")

    decoder = build_expression_decoder(cfg, args.mode)
    params = decoder.init(jax.random.PRNGKey(args.seed))

    decoder_shape = None
    if "shape_exp_name" in cfg["training"]:
        decoder_shape = build_identity_decoder(
            cfg["id_decoder"], local=(args.mode != "npm")
        )

    logger = MetricsLogger(
        log_dir=exp_dir, use_wandb=args.wandb,
        project="scanner_deformations", config=cfg,
    )
    # multi-chip: shard the batch axis over all local devices (DP); the
    # trainer falls back to the single-device step for ragged batches
    mesh = None
    if cfg["training"].get("data_parallel", True) and len(jax.devices()) > 1:
        from nphm_tpu.parallel.mesh import get_device_mesh

        mesh = get_device_mesh()
        print(f"Data-parallel training over {mesh.size} devices")

    trainer = DeformationTrainer(
        decoder, params, decoder_shape, cfg, train_dataset, val_dataset,
        args.exp_name, logger=logger, seed=args.seed, mesh=mesh,
        recon_resolution=cfg["training"].get("recon_resolution", 256),
    )
    trainer.train_model(cfg["training"].get("nepochs", 8000))


if __name__ == "__main__":
    main()
