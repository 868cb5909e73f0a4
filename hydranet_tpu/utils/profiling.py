"""Profiling / tracing utilities.

The reference has only ad-hoc wall-clock prints with cuda synchronize
(demo.py:201-203, model.py:280-285, regnet.py:87-106). Here:

- `Timer`: per-stage wall-clock accumulation with device sync (the moral
  equivalent of the reference's chrono prints in hydranet_model.cpp:356-364).
- `trace`: context manager around jax.profiler for real XLA traces viewable
  in TensorBoard/XProf.
- `benchmark_fn`: warmup + timed-iteration protocol (Demo.cpp:27-28) for any
  jitted callable, reporting mean/p50.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import numpy as np


class Timer:
    """Accumulates per-stage wall-clock with optional device sync."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if self.sync and out.get("result") is not None:
            jax.block_until_ready(out["result"])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in self.totals:
            n = max(self.counts[name], 1)
            lines.append(f"{name}: {1000 * self.totals[name] / n:.2f} ms/call "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hydranet_trace"):
    """XLA profiler trace (open with xprof / TensorBoard profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable, *args, warmup: int = 10, iters: int = 20,
                 sync_result: Optional[Callable] = None) -> Dict[str, float]:
    """Warmup + timed iterations; returns {mean_ms, p50_ms, fps_per_call}."""
    def run():
        out = fn(*args)
        jax.block_until_ready(out)
        if sync_result is not None:
            sync_result(out)
        return out

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return dict(mean_ms=float(times.mean() * 1000),
                p50_ms=float(np.median(times) * 1000),
                calls_per_sec=float(1.0 / np.median(times)))
