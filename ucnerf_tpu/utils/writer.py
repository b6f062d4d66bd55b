"""Pluggable metric writer (SURVEY.md §5.5): stdout always; TensorBoard when
available (torch.utils.tensorboard); wandb when installed and --log set
(the reference gates wandb the same way, train.py:429-432)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, logdir: Optional[str] = None, use_wandb: bool = False,
                 jsonl: bool = True):
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                pass
            if jsonl:
                self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb
                wandb.init(project="ucnerf_tpu")
                self._wandb = wandb
            except Exception:
                pass

    def write(self, step: int, metrics: Dict[str, float]):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, "t": time.time(),
                 **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
