"""Observability: per-stage throughput/drop counters + JAX profiler hooks.

The reference's only diagnostics are stdout warnings on queue timeouts and
buffer anomalies (SURVEY.md §5). Here metrics are first-class: a registry of
counters/rates any stage can tick, a snapshot API for status lines, and a
context manager wrapping jax.profiler for kernel-level traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StreamStats:
    samples_in: int = 0
    blocks_in: int = 0
    samples_dropped: int = 0
    t_start: float = field(default_factory=time.monotonic)
    t_last: float = field(default_factory=time.monotonic)

    def tick(self, n_samples: int, dropped: int = 0):
        self.samples_in += n_samples
        self.blocks_in += 1
        self.samples_dropped += dropped
        self.t_last = time.monotonic()

    @property
    def elapsed(self) -> float:
        return max(self.t_last - self.t_start, 1e-9)

    @property
    def msps(self) -> float:
        return self.samples_in / self.elapsed / 1e6

    def snapshot(self) -> dict:
        return {
            "samples": self.samples_in,
            "blocks": self.blocks_in,
            "dropped": self.samples_dropped,
            "msps": round(self.msps, 3),
        }


class Metrics:
    """Process-wide named stats registry."""

    def __init__(self):
        self.stats: dict[str, StreamStats] = defaultdict(StreamStats)
        self.notes: dict[str, object] = {}

    def tick(self, name: str, n_samples: int, dropped: int = 0):
        self.stats[name].tick(n_samples, dropped)

    def note(self, key: str, value):
        """Latest-value observability (device counters, last errors)."""
        self.notes[key] = value

    def snapshot(self) -> dict:
        out = {k: v.snapshot() for k, v in self.stats.items()}
        if self.notes:
            out["notes"] = dict(self.notes)
        return out

    def status_line(self) -> str:
        parts = [f"{k}: {v.msps:.2f} MS/s"
                 + (f" (dropped {v.samples_dropped})"
                    if v.samples_dropped else "")
                 for k, v in self.stats.items()]
        return " | ".join(parts)


metrics = Metrics()     # default global registry


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX profiler trace (view with tensorboard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
