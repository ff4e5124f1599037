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

# Observers called as hook(stage_name, wall_seconds) after every stage
# completes — bench.py uses this to emit incremental JSON records so a
# driver timeout mid-run still leaves parsed output (round-3 lesson:
# nothing printed until a whole phase finished meant rc=124 + parsed=null).
STAGE_HOOKS: list = []

# XLA compile budget as a first-class metric (VERDICT r3 #1b): every
# backend compile (persistent-cache misses; cache hits skip this event)
# bumps the count and adds its duration.  STAGE_COMPILE attributes the
# deltas to the enclosing stage_timer stage.
COMPILE_STATS: Dict[str, float] = {"count": 0, "secs": 0.0}
STAGE_COMPILE: Dict[str, float] = {}
_COMPILE_LISTENER_ON = False


def install_compile_listener() -> None:
    """Idempotently subscribe to jax's backend-compile duration events."""
    global _COMPILE_LISTENER_ON
    if _COMPILE_LISTENER_ON:
        return
    try:
        from jax import monitoring

        def _on_event(event: str, duration: float, **_kw) -> None:
            if event == "/jax/core/compile/backend_compile_duration":
                COMPILE_STATS["count"] += 1
                COMPILE_STATS["secs"] += duration

        monitoring.register_event_duration_secs_listener(_on_event)
        _COMPILE_LISTENER_ON = True
    except Exception:
        pass


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
    c0 = COMPILE_STATS["secs"]
    logger.info("stage %s: start", name)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        STAGE_TIMES[name] = STAGE_TIMES.get(name, 0.0) + dt
        STAGE_PEAK_RSS[name] = max(STAGE_PEAK_RSS.get(name, 0), _rss_kb())
        dcompile = COMPILE_STATS["secs"] - c0
        if dcompile > 0:
            STAGE_COMPILE[name] = STAGE_COMPILE.get(name, 0.0) + dcompile
        logger.info("stage %s: done in %.2fs", name, dt)
        for hook in STAGE_HOOKS:
            try:
                hook(name, dt)
            except Exception:
                logger.exception("stage hook failed for %s", name)


def count(name: str, inc: int = 1) -> None:
    COUNTERS[name] = COUNTERS.get(name, 0) + inc
