"""Metrics/observability: TensorBoard-compatible scalars + JSONL log.

Scalar-name parity with the reference (reference `train.py:149-152`):
Train/Train-Loss, Train/Train-Reduced-Loss, Train/Gradient-Norm,
Train/learning-rate — plus per-loss-term scalars the reference computed but
never logged (`util.py:243-250`) and eval metrics (RTF, SI-SDR).

TensorBoard events are written via torch.utils.tensorboard when available
(a host-side logging dependency, not a compute dependency); the JSONL
stream is always written so headless runs keep observability.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricsWriter:
    def __init__(self, directory: str, use_tensorboard: bool = True):
        os.makedirs(directory, exist_ok=True)
        self._jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(directory, "tensorboard"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Mapping[str, float]):
        record = {"step": step, "time": time.time()}
        record.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
