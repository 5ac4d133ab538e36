"""Metrics logging: console meters, JSONL stats, optional TensorBoard.

Reference: /root/reference/util/misc.py:41-276 (SmoothedValue/MetricLogger),
util/logger.py (TensorboardLogger), main.py:241-253 (JSONL `log.txt`).
Cross-rank meter sync is unnecessary here: metrics come out of the jitted
SPMD program already globally reduced.
"""

from __future__ import annotations

import collections
import json
import time
from pathlib import Path
from typing import Dict, Optional


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(value)
        self.total += value
        self.count += 1

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricMeter:
    def __init__(self, window: int = 20):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(
            lambda: SmoothedValue(window))

    def update(self, values: Dict[str, float]):
        for k, v in values.items():
            self.meters[k].update(float(v))

    def averages(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self) -> str:
        return " ".join(f"{k}={m.avg:.4f}" for k, m in self.meters.items())


class JSONLLogger:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, record: Dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class TensorBoardLogger:
    """Thin wrapper over tf.summary (tensorflow is in the image); no-op if absent."""

    def __init__(self, logdir: Optional[str]):
        self.writer = None
        if logdir:
            try:
                import tensorflow as tf

                self.writer = tf.summary.create_file_writer(str(logdir))
            except Exception:
                self.writer = None

    def scalars(self, step: int, values: Dict[str, float]):
        if self.writer is None:
            return
        import tensorflow as tf

        with self.writer.as_default():
            for k, v in values.items():
                tf.summary.scalar(k, float(v), step=step)
