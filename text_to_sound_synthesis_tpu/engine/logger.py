"""Run logger: rank-0 text log + JSONL metrics + config snapshot.

Parity target: ``Logger`` (``Diffsound/sound_synthesis/engine/logger.py:22-93``)
— creates the run directory layout, saves the merged config and args, appends
a text log, and streams scalar metrics (JSONL here instead of TensorBoard
protobufs; TensorBoard is attached when available).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Mapping, Optional

import jax

from ..utils.config import save_config_to_yaml

__all__ = ["Logger"]


class Logger:
    def __init__(self, output_dir: str, name: str = "run", is_primary: Optional[bool] = None):
        self.is_primary = (
            is_primary if is_primary is not None else jax.process_index() == 0
        )
        self.run_dir = os.path.join(output_dir, name)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoint")
        self.config_dir = os.path.join(self.run_dir, "configs")
        if self.is_primary:
            os.makedirs(self.ckpt_dir, exist_ok=True)
            os.makedirs(self.config_dir, exist_ok=True)
            self._text = open(os.path.join(self.run_dir, "log.txt"), "a")
            self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        else:
            self._text = self._jsonl = None
        self._tb = None
        if self.is_primary:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(self.run_dir, "tb"))
            except Exception:
                self._tb = None

    def save_config(self, config: Mapping[str, Any], name: str = "config.yaml") -> None:
        if self.is_primary:
            save_config_to_yaml(dict(config), os.path.join(self.config_dir, name))

    def log_info(self, msg: str, check_primary: bool = True) -> None:
        if self.is_primary or not check_primary:
            stamp = time.strftime("%Y-%m-%d %H:%M:%S")
            line = f"{stamp}: {msg}"
            print(line, file=sys.stderr)
            if self._text:
                self._text.write(line + "\n")
                self._text.flush()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._jsonl:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        for f in (self._text, self._jsonl):
            if f:
                f.close()
        if self._tb is not None:
            self._tb.close()
