"""Timing + render progress — the Clock / GPU_Clock / ETA analog.

Parity targets: KIRK::Clock stopwatch (/root/reference/src/libraries/KIRK/
Utils/Clock.h:48-60), its BVH-build timing use (CPU_BVH.cpp:18,37), and the
per-sample render %/ETA logging (CPU_PathTracer.cpp:28-41). The GL
timer-query GPU clock maps to jax.block_until_ready-bracketed wall timing
(device work is async under XLA, so the host stopwatch must sync).
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from . import log


class Clock:
    """Clock<chrono> analog: construct to start, .elapsed()/.restart()."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def restart(self) -> float:
        dt = self.elapsed()
        self._t0 = time.perf_counter()
        return dt


class DeviceClock(Clock):
    """GPU_Clock analog: blocks on `value` before reading the stopwatch."""

    def stop(self, value=None) -> float:
        if value is not None:
            jax.block_until_ready(value)
        return self.elapsed()


class RenderProgress:
    """Per-sample progress %/ETA logging (CPU_PathTracer.cpp:28-41) plus a
    rays/s counter (the rebuild's first-class metric, SURVEY §5)."""

    def __init__(self, total_samples: int, rays_per_sample: int,
                 log_every: int = 1):
        self.total = total_samples
        self.rays = rays_per_sample
        self.log_every = log_every
        self.clock = Clock()
        self.done = 0

    def update(self, n: int = 1, value=None) -> None:
        if value is not None:
            jax.block_until_ready(value)
        self.done += n
        if self.done % self.log_every:
            return
        el = self.clock.elapsed()
        frac = self.done / self.total
        eta = el / frac - el if frac > 0 else float("inf")
        rps = self.done * self.rays / max(el, 1e-9)
        log.log_info("render %/% samples (% pct)  % s elapsed, ETA % s, % Mrays/s",
                     self.done, self.total, round(100 * frac, 1),
                     round(el, 1), round(eta, 1), round(rps / 1e6, 2))
