"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints
(``scvae/utilities.py:36-60`` used throughout).  Here (SURVEY.md §5.1):

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution;
* :class:`StepTimer` — host-side step timing with log-spaced reporting
  like the reference's 11-points-per-epoch prints
  (``variational_autoencoder.py:868-870``) plus cells/s throughput;
* :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import numpy as np

from scvae_tpu.utils.strings import format_duration


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_spaced_indices(n: int, count: int = 11) -> np.ndarray:
    """≤``count`` log-spaced indices in [0, n) — the reference's step-
    duration printing pattern."""
    if n <= 0:
        return np.array([], np.int64)
    raw = np.unique(
        np.round(np.logspace(0, np.log10(max(n, 1)), count)).astype(np.int64)
        - 1
    )
    return raw[(raw >= 0) & (raw < n)]


class StepTimer:
    """Per-step host timing with throughput summary."""

    def __init__(self, items_per_step: int = 0, report_steps=None,
                 verbose: bool = False):
        self.items_per_step = items_per_step
        self.durations: list[float] = []
        self._started: float | None = None
        self._report = set(
            np.asarray(report_steps).tolist() if report_steps is not None else []
        )
        self.verbose = verbose

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def start(self) -> None:
        self._started = time.perf_counter()

    def stop(self) -> None:
        if self._started is None:
            return
        duration = time.perf_counter() - self._started
        self.durations.append(duration)
        step = len(self.durations) - 1
        if self.verbose and step in self._report:
            print(
                f"    step {step + 1}: {format_duration(duration)}"
            )
        self._started = None

    @property
    def total_seconds(self) -> float:
        return float(np.sum(self.durations))

    @property
    def mean_seconds(self) -> float:
        return float(np.mean(self.durations)) if self.durations else 0.0

    @property
    def items_per_second(self) -> float:
        total = self.total_seconds
        if total <= 0:
            return 0.0
        return self.items_per_step * len(self.durations) / total

    def summary(self) -> str:
        return (
            f"{len(self.durations)} steps, mean "
            f"{format_duration(self.mean_seconds)}/step"
            + (
                f", {self.items_per_second:,.0f} items/s"
                if self.items_per_step
                else ""
            )
        )


def device_memory_stats() -> list[dict]:
    """Per-device memory statistics where the backend exposes them."""
    import jax

    stats = []
    for device in jax.devices():
        try:
            memory = device.memory_stats()
        except Exception:
            memory = None
        stats.append(
            {
                "device": str(device),
                "bytes_in_use": (memory or {}).get("bytes_in_use"),
                "bytes_limit": (memory or {}).get("bytes_limit"),
            }
        )
    return stats


def summarize_trace(trace_directory: str, top: int = 15) -> list[dict]:
    """Aggregate a captured :func:`trace` into per-op total durations.

    Parses the ``*.trace.json.gz`` Chrome-trace file jax.profiler writes
    and returns the ``top`` entries as dictionaries with ``name``,
    ``total_ms``, and ``count`` — the round-3 step-decomposition workflow
    (find the slowest kernels without TensorBoard; e.g. the fused
    likelihood backward, forward, and gather custom calls of one
    training step).
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(
            os.path.join(trace_directory, "**", "*.trace.json.gz"),
            recursive=True,
        )
    )
    if not paths:
        raise FileNotFoundError(
            f"No *.trace.json.gz under {trace_directory}"
        )
    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    with gzip.open(paths[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    for event in events:
        if event.get("ph") == "X":
            name = event.get("name", "")
            totals[name] += event.get("dur", 0) / 1e3
            counts[name] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [
        {"name": name, "total_ms": round(ms, 3), "count": counts[name]}
        for name, ms in ranked
    ]
