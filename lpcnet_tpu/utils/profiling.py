"""Profiling & observability utilities.

The reference has no tracing at all (PRINT_MIPS is an empty stub,
src/arch.h:90); this is green-field per SURVEY.md section 5:

* ``trace``        -- context manager around jax.profiler for TensorBoard/
                      Perfetto traces of device execution.
* ``time_fn``      -- robust wall-clock timing of a jitted callable
                      (block_until_ready, warmup, median-of-k).
* ``MetricsLogger``-- JSONL training/serving metrics sink.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, host: bool = False):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Median/min wall time of fn(*args) with device sync."""
    def run():
        out = fn(*args, **kwargs)
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out)
        return out

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"median_s": times[len(times) // 2], "min_s": times[0],
            "mean_s": sum(times) / len(times), "iters": iters}


class MetricsLogger:
    """Append-only JSONL metrics log (training curves, bench history)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._pending = []

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"ts": time.time(), "step": step}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def log_async(self, step: int, **metrics: Any) -> None:
        """Queue a record holding device scalars WITHOUT fetching them (a
        per-step host fetch serializes the training dispatch pipeline --
        2.4x step-rate loss measured in bench.py's train mode). Call
        flush_async() at log intervals to materialize queued records."""
        self._pending.append((time.time(), step, metrics))

    def flush_async(self) -> None:
        for ts, step, metrics in self._pending:
            rec = {"ts": ts, "step": step}
            rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                        for k, v in metrics.items()})
            self._f.write(json.dumps(rec) + "\n")
        self._pending = []
        self._f.flush()

    def close(self):
        self.flush_async()
        self._f.close()


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
