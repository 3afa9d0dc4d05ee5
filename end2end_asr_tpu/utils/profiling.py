"""Profiling / throughput counters (SURVEY.md §5.1: the reference has
only tqdm bars; this adds step-time + utterances/sec/chip counters and
optional jax.profiler trace capture)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional


@dataclass
class ThroughputMeter:
    """Accumulates per-step wall time / utterances / audio seconds."""
    steps: int = 0
    utts: int = 0
    audio_seconds: float = 0.0
    step_time: float = 0.0
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, utts: int, audio_seconds: float = 0.0) -> float:
        if self._t0 is None:
            # stop() without a prior start() (e.g. a deferred drain
            # arriving before the first start of an epoch): don't count
            # the batch at ~zero elapsed time — that inflates the first
            # logged utt/s by orders of magnitude
            return 0.0
        dt = time.time() - self._t0
        self.steps += 1
        self.utts += utts
        self.audio_seconds += audio_seconds
        self.step_time += dt
        return dt

    @property
    def utts_per_sec(self) -> float:
        return self.utts / max(self.step_time, 1e-9)

    @property
    def rtf_x(self) -> float:
        """Realtime factor: audio seconds processed per wall second."""
        return self.audio_seconds / max(self.step_time, 1e-9)

    def summary(self) -> Dict[str, float]:
        return {"steps": self.steps,
                "utts_per_sec": round(self.utts_per_sec, 2),
                "audio_rtf_x": round(self.rtf_x, 2),
                "mean_step_ms": round(
                    self.step_time / max(self.steps, 1) * 1000, 2)}


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace around a block when log_dir is set
    (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
