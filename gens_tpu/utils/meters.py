"""Scalar logging utilities (reference utils/tools.py:93-139): running
averages + jsonl/TensorBoard sinks."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def tensor2float(d: Dict) -> Dict[str, float]:
    return {k: float(v) for k, v in d.items()
            if hasattr(v, "__float__") or isinstance(v, (int, float))}


class DictAverageMeter:
    """Running mean of scalar dicts (reference utils/tools.py:120-139)."""

    def __init__(self):
        self.sum: Dict[str, float] = {}
        self.count = 0

    def update(self, scalars: Dict[str, float]):
        self.count += 1
        for k, v in scalars.items():
            self.sum[k] = self.sum.get(k, 0.0) + float(v)

    @property
    def avg_data(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.sum.items()}

    def reset(self):
        self.sum = {}
        self.count = 0


class MetricsLogger:
    """Writes scalars to a jsonl file and, when tensorboardX is available,
    to TensorBoard (reference save_scalars, utils/tools.py:109-117)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def log(self, mode: str, scalars: Dict[str, float], step: int):
        rec = {"mode": mode, "step": step, "time": time.time(), **scalars}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{mode}/{k}", v, step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
