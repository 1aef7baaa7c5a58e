"""Tracing / profiling utilities.

The reference's only instrumentation is ``@elapsed`` self-timing of
``fit!``/``fit_naive!`` (``fit.jl:88,121,299,303``). Here timing is a
first-class return (``fit`` returns wall-clock seconds) plus:

* :class:`PhaseTimer` — named per-phase wall-clock accumulation, for
  build/fit/update/predict/train breakdowns.
* :func:`trace` — context manager around ``jax.profiler`` emitting an XLA
  trace viewable in TensorBoard/Perfetto (no-op if profiling unavailable).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class PhaseTimer:
    """Accumulate wall-clock per named phase.

    >>> t = PhaseTimer()
    >>> with t.phase("fit"):
    ...     ...
    >>> t.timings()  # {'fit': 0.0123}
    """

    def __init__(self):
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def timings(self) -> Dict[str, float]:
        return dict(self._acc)

    def counts(self) -> Dict[str, int]:
        return dict(self._count)

    def report(self) -> str:
        lines = [
            f"{k:>16s}: {v:9.4f}s  (x{self._count[k]})"
            for k, v in sorted(self._acc.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace around the enclosed block."""
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
