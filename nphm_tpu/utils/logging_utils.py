"""Pluggable metrics logging: stdout + JSONL file, optional wandb.

Replaces the reference's hard wandb dependency (training.py:73,90,159,187)
with a logger that always works offline and forwards to wandb when available
and requested.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        use_wandb: bool = False,
        project: Optional[str] = None,
        config: Optional[dict] = None,
        quiet: bool = False,
    ):
        self.quiet = quiet
        self._jsonl = None
        self._wandb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(project=project, config=config)
                self._wandb = wandb
            except Exception as e:  # pragma: no cover
                print(f"[logger] wandb unavailable ({e}); falling back to JSONL")

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            rec["step"] = step
        rec["t"] = time.time()
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def print(self, msg: str):
        if not self.quiet:
            print(msg, flush=True)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
