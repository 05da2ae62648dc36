"""Training logger: TensorBoard (when available) + JSONL fallback.

reference: src/Utils/Utils.py:1005-1023 (thin SummaryWriter wrapper).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class Logger:
    def __init__(self, config=None, log_dir: str | None = None):
        self.log_dir = log_dir or (config.LOG_DIR if config is not None else "log")
        os.makedirs(self.log_dir, exist_ok=True)
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(self.log_dir)
        except Exception:  # noqa: BLE001 — jsonl only
            pass
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")

    def log_vars(self, name, iter, **kwargs):
        rec = {"tag": name, "iter": int(iter), "t": time.time()}
        for key, value in kwargs.items():
            if isinstance(value, (list, tuple)):
                if not len(value):
                    continue
                value = float(np.mean(value))
            value = float(value)
            rec[key] = value
            if self.writer is not None:
                self.writer.add_scalar(f"{name}_{key}", value, iter)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_loss(self, loss, name, iter):
        self.log_vars(name, iter, loss=float(loss))

    def close(self):
        if self.writer is not None:
            self.writer.close()
        self._jsonl.close()
