"""Scalar logging: JSONL always (checkpoints/<ts>/scalars.jsonl), plus
TensorBoard event files — covering the reference's SummaryWriter usage
(train.py:167, 100-110, 355-356). TB events are written by the
dependency-free writer in utils/tbevents.py (no torch/tensorboard needed;
files load in stock TensorBoard)."""

import json
import os
import time

from .tbevents import TFEventWriter


class ScalarWriter:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = TFEventWriter(log_dir)

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({
            "tag": tag, "value": float(value), "step": int(step),
            "time": time.time()
        }) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
