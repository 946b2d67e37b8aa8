"""Host-side stage timing + metrics.

TicToc / LOG_STEP_TIME analog (``/root/reference/src/common/tic_toc.h:10-30``),
plus per-stage budget warnings like the reference's >100 ms alarms
(``msf_loam_node.cc:376-377``, ``laser_odometry.cc:93-94``). Device work is
profiled separately with ``jax.profiler``; these timers measure wall-clock
around dispatch+block boundaries.
"""

from __future__ import annotations

import collections
import contextlib
import logging
import time
from typing import Dict

logger = logging.getLogger("msf_loam_tpu")


class TicToc:
    def __init__(self) -> None:
        self.tic()

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


class StageTimers:
    """Accumulates per-stage wall-clock stats across frames."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        self.budgets_ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, module: str, describe: str):
        key = f"{module}/{describe}"
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            self.totals[key] += ms
            self.counts[key] += 1
            budget = self.budgets_ms.get(key)
            logger.debug("[%s] %s cost %.2f ms", module, describe, ms)
            if budget is not None and ms > budget:
                logger.warning("[%s] %s over budget: %.1f ms > %.1f ms",
                               module, describe, ms, budget)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_ms": self.totals[k],
                "count": self.counts[k],
                "mean_ms": self.totals[k] / max(self.counts[k], 1),
            }
            for k in sorted(self.totals)
        }

    def log_summary(self) -> None:
        for k, v in self.summary().items():
            logger.info("%-40s mean %8.2f ms  x%d", k, v["mean_ms"], v["count"])
