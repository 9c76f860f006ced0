"""Stage timers — the framework's profiling facade.

Reproduces the reference's context-manager stage timer with accumulated
total (reference util.py:612-649) and adds an optional jax.profiler trace
hook for TPU-level profiling.
"""
from __future__ import annotations

import contextlib
import os
import time


def timer_factory():
    class MyTimer:
        total_count = 0.0

        def __init__(self, msg: str = "", count: bool = True):
            self.msg = msg
            self.count = count
            self.duration = 0.0

        def __enter__(self):
            self.start = time.perf_counter()
            if self.msg:
                print(f"started: {self.msg}")
            return self

        def __exit__(self, typ, value, traceback):
            self.duration = time.perf_counter() - self.start
            if self.count:
                MyTimer.total_count += self.duration
            if self.msg:
                print(
                    f"finished: {self.msg}. duration: "
                    f"{MyTimer.convert_to_time_format(self.duration)}"
                )

        @staticmethod
        def print_total_time():
            print("\n ----- \n")
            print(f"total time: {MyTimer.convert_to_time_format(MyTimer.total_count)}")

        @staticmethod
        def convert_to_time_format(sec: float) -> str:
            sec = round(sec, 2)
            if sec < 60:
                return f"{sec} [sec]"
            minutes = int(sec / 60)
            remaining = round(sec - minutes * 60, 2)
            return f"{minutes}:{remaining} [min:sec]"

    return MyTimer


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
