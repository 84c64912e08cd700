"""Connect-safe plan statistics.

Catalyst's plan-side size estimate (file sizes for scans, propagated
through the plan) gates several operators' small-vs-distributed
cutover — the same statistic AQE and the broadcast threshold
consult. Reading it runs NO job, but the accessor chain
(``_jdf.queryExecution()``) only exists on classic-mode DataFrames;
under Spark Connect there is no JVM handle, so callers get their
``fallback`` instead. Every gate in this codebase passes a LARGE
fallback, which routes Connect sessions onto the fully-distributed
path — the side that is always correct, merely not the small-input
shortcut.
"""

from __future__ import annotations

LARGE = 1 << 62  # "assume big": pick the distributed/scale path


def plan_size_bytes(sdf, fallback: int = LARGE) -> int:
    try:
        return int(
            sdf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # Spark Connect: no _jdf / py4j handle
        return fallback
