"""Lightweight runtime telemetry: stage timers, counters, health checks.

The reference's observability is colored couts, a GBA chrono print
(Optimizer.cpp:796-801), per-module line-number checkpoints and a 30s
deadlock watchdog thread (estd::mylog, estd.h:206-438).  The functional
runtime cannot deadlock, so the watchdog's job becomes *progress* checking:
`Watchdog.beat(module)` timestamps each module's last step and
`Watchdog.stalled()` reports modules silent for longer than the threshold.

`StageTimer` aggregates wall-clock per pipeline stage (tracking, mapping,
GBA, ...) with jax-aware synchronization, and `Counters` is a plain bag of
monotonic counters (keyframes created, landmarks culled, messages sent...).
Everything is stdlib-only and thread-safe enough for the host orchestrator.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))
    sync: bool = False  # block_until_ready around stages (accurate, slower)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }


@dataclass
class Counters:
    values: dict = field(default_factory=lambda: defaultdict(int))

    def bump(self, name: str, n: int = 1):
        self.values[name] += n

    def get(self, name: str) -> int:
        return self.values[name]

    def summary(self) -> dict:
        return dict(sorted(self.values.items()))


@dataclass
class Watchdog:
    """Module progress monitor (the mylog watchdog re-imagined: no locks to
    deadlock, so it reports stalled *pipelines* instead)."""

    threshold_s: float = 30.0
    last_beat: dict = field(default_factory=dict)

    def beat(self, module: str):
        self.last_beat[module] = time.monotonic()

    def stalled(self) -> list:
        now = time.monotonic()
        return [
            (m, round(now - t, 1))
            for m, t in self.last_beat.items()
            if now - t > self.threshold_s
        ]
