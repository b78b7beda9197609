"""Per-stage timing + device tracing.

The reference's only observability is tqdm progress bars and log lines
(SURVEY.md §5). Here every pipeline driver can wrap its stages in a
StageTimer (wall-clock histogram per stage, logged summary) and
``trace_annotation`` hooks into ``jax.profiler`` so device traces carry
pipeline-stage names.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger("saguaro_tpu.timing")

__all__ = ["StageTimer", "trace_annotation"]


def trace_annotation(name: str):
    """Named region in jax.profiler device traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; prints a summary table."""

    def __init__(self):
        self.total: dict[str, float] = defaultdict(float)
        self.count: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        with trace_annotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.total[name] += dt
                self.count[name] += 1

    def summary(self) -> str:
        lines = ["stage timings:"]
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            t, c = self.total[name], self.count[name]
            lines.append(f"  {name:<30s} {t:8.2f}s total  {t / max(c, 1):8.3f}s/call  x{c}")
        return "\n".join(lines)

    def log_summary(self) -> None:
        logger.info("%s", self.summary())
