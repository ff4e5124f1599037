"""Structured logging + per-stage timing.

Replaces the reference's `Logger` wrapper and manual `time.time()` bracketing
(`Util.py:38-62`, `main.py:433-444`) with one module-level logger and a
`stage_timer` context manager that records wall-clock into a run-wide
metrics dict (exported by the pipeline driver for observability).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

logger = logging.getLogger("hite_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

STAGE_TIMES: Dict[str, float] = {}
COUNTERS: Dict[str, int] = {}


STAGE_PEAK_RSS: Dict[str, int] = {}


def _rss_kb() -> int:
    """Current max RSS (KB) — replaces the reference's memusg.py sampler."""
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    except Exception:
        return 0


@contextlib.contextmanager
def stage_timer(name: str):
    t0 = time.perf_counter()
    logger.info("stage %s: start", name)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        STAGE_TIMES[name] = STAGE_TIMES.get(name, 0.0) + dt
        STAGE_PEAK_RSS[name] = max(STAGE_PEAK_RSS.get(name, 0), _rss_kb())
        logger.info("stage %s: done in %.2fs", name, dt)


def count(name: str, inc: int = 1) -> None:
    COUNTERS[name] = COUNTERS.get(name, 0) + inc
