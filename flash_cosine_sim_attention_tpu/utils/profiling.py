"""Tracing / profiling helpers (SURVEY.md §5: the reference has only its
CUDA-event timer; TPU-native equivalent is the jax profiler + xplane
traces, viewable in TensorBoard / Perfetto)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fcsa_trace") -> Iterator[None]:
    """Capture a device trace around a block:

        with trace("/tmp/t"):
            step(...)
        # then: tensorboard --logdir /tmp/t  (or upload the .pb to Perfetto)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling tokens/sec + step-time tracker for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def tokens_per_sec(self, tokens_per_step: int) -> float:
        s = self.mean_step_s
        return tokens_per_step / s if s else 0.0
