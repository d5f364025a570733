"""Training observability.

Parity + upgrade over the reference's TensorBoard writer and stdout epoch
prints (ref model/mpnnlstm.py:179, :317, :369, :376-377): scalars stream to
a JSONL file (host-side, no heavy deps) and to TensorBoard when torch's
SummaryWriter is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, run_dir: str = "runs", name: str = "experiment"):
        stamp = time.strftime("%Y%m%d_%H_%M_%S")
        self.dir = os.path.join(run_dir, f"{name}_{stamp}")
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "scalars.jsonl"), "a")
        self._tb = None
        try:  # optional TensorBoard (same surface the reference exposes)
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step)})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
