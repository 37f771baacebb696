"""TensorBoard metric writer.

Rebuilds ``utils/metric_logger.py:115-185`` (TensorboardLogger): three
writer namespaces — last value, windowed average, windowed median — over a
MetricLogger's meters.  Uses ``torch.utils.tensorboard`` when available
(torch-cpu is in the image); otherwise falls back to JSONL event files with
the same triple so training runs stay observable anywhere.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from multimodal_context_reasoning_tpu.utils.metrics import MetricLogger


class TensorboardLogger:
    def __init__(self, log_dir: str, start_step: int = 0):
        self.step = start_step
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._last = SummaryWriter(os.path.join(log_dir, "last"))
            self._avg = SummaryWriter(os.path.join(log_dir, "avg"))
            self._med = SummaryWriter(os.path.join(log_dir, "median"))
        except Exception:
            self._last = self._avg = self._med = None
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log_scalar(self, name: str, value: float,
                   step: Optional[int] = None) -> None:
        step = self.step if step is None else step
        if self._last is not None:
            self._last.add_scalar(name, value, step)
        else:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "step": step, name: float(value)}
            ) + "\n")

    def log_meters(self, meters: MetricLogger,
                   step: Optional[int] = None) -> None:
        step = self.step if step is None else step
        for name, m in meters.meters.items():
            if self._last is not None:
                self._last.add_scalar(name, m.last, step)
                self._avg.add_scalar(name, m.avg, step)
                self._med.add_scalar(name, m.median, step)
            else:
                self._jsonl.write(json.dumps({
                    "t": time.time(), "step": step, "name": name,
                    "last": m.last, "avg": m.avg, "median": m.median,
                }) + "\n")
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        for w in (self._last, self._avg, self._med):
            if w is not None:
                w.close()
        if self._jsonl is not None:
            self._jsonl.close()
