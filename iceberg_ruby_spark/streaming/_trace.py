"""TEMPORARY (r14 measurement): env-gated wall-clock trace of the
streaming source/sink lifecycle across driver + python-worker processes.

Set SPARK_GRAFT_STREAM_TRACE=/path/to/file; every traced point appends
``t_epoch pid tag`` so worker spawns (new pids), import costs, and
per-method durations can be aligned with the Spark job timeline.
No-op (one dict lookup) when the env var is unset.
"""

from __future__ import annotations

import functools
import os
import time

_PATH = os.environ.get("SPARK_GRAFT_STREAM_TRACE")


def trace(tag: str) -> None:
    if not _PATH:
        return
    try:
        with open(_PATH, "a") as fh:
            fh.write(f"{time.time():.6f} {os.getpid()} {tag}\n")
    except OSError:
        # diagnostics must never fail the traced streaming query (the
        # path may not exist on every process that imports this)
        pass


def traced(fn):
    if not _PATH:
        return fn

    @functools.wraps(fn)
    def wrap(*a, **kw):
        t0 = time.time()
        trace(f"{fn.__qualname__}:enter")
        try:
            return fn(*a, **kw)
        finally:
            trace(f"{fn.__qualname__}:exit dt={time.time()-t0:.4f}")

    return wrap


trace("module-import:_trace")
