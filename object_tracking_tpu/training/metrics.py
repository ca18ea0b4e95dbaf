"""Scalar metric logging: TensorBoard event files + JSONL.

Replaces the reference's graph-side `tf.Print` telemetry
(/root/reference/models_detection/KerasYOLO.py:216-233) and the Keras
TensorBoard callback with numbered run dirs
(MultiObjDetTracker.py:268-272, KerasYOLO.py:488-492). Losses/recall are
returned from the jitted step as an aux dict (functional, psum-safe);
this logger writes them out host-side.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def numbered_run_dir(base: str, prefix: str = 'run') -> str:
    """Reference behavior: logs/<prefix>_<n> with n = #existing + 1
    (MultiObjDetTracker.py:268-269)."""
    os.makedirs(base, exist_ok=True)
    n = len([d for d in os.listdir(base)
             if os.path.isdir(os.path.join(base, d))]) + 1
    path = os.path.join(base, f'{prefix}_{n}')
    os.makedirs(path, exist_ok=True)
    return path


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: Optional[str] = None) -> None:
        scalars = {
            (f'{prefix}/{k}' if prefix else k): float(v)
            for k, v in scalars.items()}
        rec = {'step': int(step), 'time': time.time(), **scalars}
        self._jsonl.write(json.dumps(rec) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
