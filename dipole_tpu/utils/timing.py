"""Stage timers — the framework's wall-clock profiling facade.

Capability parity with the reference's stage-timer (util.py:612-649): named
stages print on entry/exit and accumulate into a run total. The design is
original: each call to timer_factory() returns an independent clock bound to
its own accumulator (the reference mutates a class attribute shared by every
instance of a closure-defined class), and durations are rendered by a single
humanizer instead of a minutes/seconds split.

Also provides jax_trace, an optional jax.profiler hook for TPU-level traces.
"""
from __future__ import annotations

import contextlib
import os
import time


def _humanize(seconds: float) -> str:
    if seconds < 60.0:
        return f"{seconds:.2f}s"
    m, s = divmod(seconds, 60.0)
    return f"{int(m)}m {s:04.1f}s"


class _StageClock:
    """Context manager for one named stage; created through a factory so
    every pipeline run gets a private accumulated total."""

    def __init__(self, ledger: dict, label: str = "", count: bool = True):
        self._ledger = ledger
        self.label = label
        self._accumulate = count
        self.duration = 0.0

    def __enter__(self):
        if self.label:
            print(f"started: {self.label}")
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self._t0
        if self._accumulate:
            self._ledger["total"] += self.duration
        if self.label:
            print(f"finished: {self.label} [{_humanize(self.duration)}]")
        return False


def timer_factory():
    """Returns a stage-clock constructor with a fresh accumulator.

    Usage mirrors the pipelines: ``T = timer_factory(); with T("stage"): ...;
    T.print_total_time()``. Stages created with ``count=False`` print but do
    not add to the total.
    """
    ledger = {"total": 0.0}

    def make(label: str = "", count: bool = True) -> _StageClock:
        return _StageClock(ledger, label, count)

    def print_total_time() -> None:
        print(f"\ntotal time: {_humanize(ledger['total'])}")

    make.print_total_time = print_total_time
    make.total = lambda: ledger["total"]
    return make


@contextlib.contextmanager
def jax_trace(log_dir: str | None = None):
    """Optionally wrap a region in a jax.profiler trace.

    Enabled when log_dir is given or DIPOLE_TPU_TRACE_DIR is set; otherwise a
    no-op, so pipelines can call it unconditionally.
    """
    log_dir = log_dir or os.environ.get("DIPOLE_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
