"""Metrics logging.

The reference's metrics interface is the loss dict (key schemas asserted by
its tests; reference: models/losses.py:324-330, 920-997) with TensorBoard
wiring only sketched in demo comments
(reference: demo_feature_matching_loss.py:156-180).  Here: a JSONL metric
writer (machine-readable, append-only) + console summary, with device_get
happening exactly once per log interval at the host boundary — never inside
the jitted step.  `tensorboard=True` additionally mirrors every scalar into
TensorBoard event files (the reference's intended wiring), via torch's
SummaryWriter when available; silently off otherwise — JSONL remains the
source of truth.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, name: str = "train", tensorboard: bool = False):
        self.path = Path(log_dir)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = self.path / f"{name}_metrics.jsonl"
        self._t0 = time.monotonic()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.path / f"tb_{name}"))
            except Exception:  # noqa: BLE001 - TB is best-effort, JSONL is canonical
                self._tb = None

    def write(self, step: int, metrics: Mapping[str, Any], **extra) -> Dict[str, float]:
        """device_get + append one JSONL record; returns the host-side dict."""
        host = {
            k: float(np.asarray(jax.device_get(v))) for k, v in metrics.items()
        }
        record = {
            "step": int(step),
            "wall_time_s": round(time.monotonic() - self._t0, 3),
            **host,
            **extra,
        }
        with open(self.file, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in host.items():
                self._tb.add_scalar(k, v, int(step))
        return host

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()

    def summary_line(self, step: int, host_metrics: Mapping[str, float],
                     keys: Optional[list] = None) -> str:
        keys = keys or sorted(host_metrics)
        parts = " ".join(f"{k}={host_metrics[k]:.4f}" for k in keys if k in host_metrics)
        return f"step {step}: {parts}"
