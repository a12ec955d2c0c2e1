"""Tracing / profiling / metrics logging.

The reference has no profiler at all — progress is tqdm postfix text
(`Train_Orignal.py:274,316-318`; SURVEY.md §5). TPU-native replacements:

* ``trace_context`` — jax.profiler trace (view in TensorBoard/XProf) around
  any region; no-ops cleanly if profiling is unavailable.
* ``StepTimer`` — EMA'd steps/sec + examples/sec without forcing a device
  sync (call .tick() after the host-side dispatch; combine with periodic
  block_until_ready for exact numbers).
* ``MetricsLogger`` — append-only JSONL metrics file (the structured
  replacement for print-based logging).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace around a region; None → no-op."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last: Optional[float] = None
        self.steps_per_sec: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            inst = 1.0 / max(now - self._last, 1e-9)
            self.steps_per_sec = (
                inst
                if self.steps_per_sec is None
                else self.ema * self.steps_per_sec + (1 - self.ema) * inst
            )
        self._last = now
        return self.steps_per_sec


class MetricsLogger:
    """Append-only JSONL metrics sink."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, **kv) -> None:
        kv.setdefault("ts", time.time())
        self._f.write(json.dumps(kv, default=float) + "\n")

    def close(self) -> None:
        self._f.close()
