"""Checkpointing.

Single-file checkpoints containing the epoch, decoder params, optimizer
states, and train+val latent tables — the same content and directory layout
as the reference (training.py:190-247: ``{exp}/checkpoints/checkpoint_epoch_N``,
latest-epoch autodiscovery by filename parse, ``val_min=EPOCH`` marker files).

Format: a pickled pytree with all jax arrays converted to numpy.  Checkpoints
are local trusted artifacts (the reference uses torch.save, also pickle).
"""

from __future__ import annotations

import glob
import os
import pickle
import re

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_checkpoint(checkpoint_dir: str, epoch: int, tree) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"checkpoint_epoch_{epoch}.pkl")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"epoch": epoch, **_to_numpy(tree)}, f, protocol=4)
        os.replace(tmp, path)
    return path


def checkpoint_path(checkpoint_dir: str, epoch: int) -> str:
    return os.path.join(checkpoint_dir, f"checkpoint_epoch_{epoch}.pkl")


def latest_checkpoint_epoch(checkpoint_dir: str):
    epochs = []
    for p in glob.glob(os.path.join(checkpoint_dir, "checkpoint_epoch_*.pkl")):
        m = re.search(r"checkpoint_epoch_(\d+)\.pkl$", p)
        if m:
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def load_checkpoint(checkpoint_dir: str, epoch=None):
    """Load a checkpoint dict; epoch=None loads the latest. Returns None if
    no checkpoint exists."""
    if epoch is None:
        epoch = latest_checkpoint_epoch(checkpoint_dir)
        if epoch is None:
            return None
    path = checkpoint_path(checkpoint_dir, epoch)
    with open(path, "rb") as f:
        return pickle.load(f)


def update_val_min(exp_path: str, epoch: int, val_loss: float):
    """Maintain the best-val marker files (reference training.py:166-173)."""
    for p in glob.glob(os.path.join(exp_path, "val_min=*")):
        os.remove(p)
    np.save(os.path.join(exp_path, f"val_min={epoch}.npy"), [epoch, val_loss])


def read_val_min(exp_path: str):
    files = glob.glob(os.path.join(exp_path, "val_min=*"))
    if not files:
        return None
    arr = np.load(files[0])
    return int(arr[0]), float(arr[1])
