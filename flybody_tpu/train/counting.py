"""Hierarchical step counters (counterpart of reference
flybody/agents/counting.py, minus the Ray serialization machinery: in the
single-program TPU topology counters are plain host-side state)."""

from __future__ import annotations

import threading
import time


class Counter:
    """Thread-safe hierarchical counter with periodic parent sync."""

    def __init__(self, parent: 'Counter | None' = None, prefix: str = '',
                 time_delta: float = 1.0):
        self._parent = parent
        self._prefix = prefix
        self._time_delta = time_delta
        self._counts: dict = {}
        self._cache: dict = {}
        self._last_sync = 0.0
        self._lock = threading.Lock()

    def increment(self, **counts) -> dict:
        with self._lock:
            for k, v in counts.items():
                self._counts[k] = self._counts.get(k, 0) + v
            if (self._parent is not None
                    and time.time() - self._last_sync > self._time_delta):
                to_sync = {f'{self._prefix}_{k}' if self._prefix else k: v
                           for k, v in self._counts.items()}
                self._cache = self._parent.increment(**to_sync)
                self._counts = {}
                self._last_sync = time.time()
            return self.get_counts()

    def get_counts(self) -> dict:
        result = dict(self._cache)
        prefix = f'{self._prefix}_' if self._prefix else ''
        for k, v in self._counts.items():
            result[prefix + k] = result.get(prefix + k, 0) + v
        return result

    def save(self) -> dict:
        return {'counts': dict(self._counts), 'cache': dict(self._cache)}

    def restore(self, state: dict):
        self._counts = dict(state.get('counts', {}))
        self._cache = dict(state.get('cache', {}))
