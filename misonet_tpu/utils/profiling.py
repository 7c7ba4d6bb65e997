"""Tracing / profiling utilities.

The reference's only performance instrumentation is wall-clock ms/batch
prints (trainer.py:216-221).  Here: jax.profiler trace capture around any
code region (viewable in TensorBoard/Perfetto/XProf), a step timer that
reports the north-star audio-seconds/s metric, and device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace for the enclosed region:

        with profiling.trace("logs/profile"):
            state, metrics = train_step(state, mix, ref)
            jax.block_until_ready(metrics)
    """
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput tracker: feed (seconds_of_audio) per step, read
    audio-seconds/s/chip (BASELINE.json north-star metric)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.samples: list[tuple[float, float]] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.samples.append((dt, audio_seconds))
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    def discard(self) -> float:
        """Stop timing WITHOUT adding a sample to the throughput window
        (for steps with unknown audio content, which would otherwise
        deflate audio_seconds_per_second)."""
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        return dt

    @property
    def audio_seconds_per_second(self) -> float:
        if not self.samples:
            return 0.0
        dt = sum(s[0] for s in self.samples)
        au = sum(s[1] for s in self.samples)
        return au / dt if dt > 0 else 0.0


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
