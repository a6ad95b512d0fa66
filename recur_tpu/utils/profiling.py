"""Tracing / profiling helpers (SURVEY.md §5.1): the reference's
START_TIMER/DEBUG_TIMER wall-clock macros and perf targets become a timer
context manager plus a jax profiler trace hook."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class Timer:
    """START_TIMER / READ_TIMER (recur-common.h:159-180)."""

    def __init__(self, name: str = "timer", log=None):
        self.name = name
        self.log = log
        self.start = time.monotonic()

    def read(self) -> float:
        return time.monotonic() - self.start

    def debug(self, msg: str = "") -> float:
        el = self.read()
        line = f"{self.name}: {el * 1e6:.0f} us {msg}"
        if self.log is not None:
            self.log.log_float(self.name, el)
        else:
            print(line)
        return el


@contextlib.contextmanager
def timer(name: str = "block", quiet: bool = False):
    t = Timer(name)
    yield t
    if not quiet:
        t.debug()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/recur-tpu-trace"):
    """Capture a jax profiler trace (view with TensorBoard/Perfetto) — the
    TPU equivalent of the reference's callgrind/perf targets
    (Makefile:292-294, 503-505)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    """FP-exception trapping (text-predict.c:754-765, §5.2): the JAX
    equivalent re-runs NaN-producing ops eagerly and raises."""
    import jax
    jax.config.update("jax_debug_nans", bool(enable))
