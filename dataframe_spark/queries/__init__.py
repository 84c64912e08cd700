"""Driver-contract query registry.

Each submodule defines QUERIES (name → (spark, sf_dir) → DataFrame)
and ORACLES (name → equivalent DuckDB SQL). Column names/aliases are
identical on both sides; every float aggregate is rounded on both
sides (the driver hash-compares values order-insensitively).
"""

from . import dedup_q, exprs_q, ml_q, relational, stats_q, text_q, windows_q

MODULES = [relational, stats_q, windows_q, dedup_q, text_q, exprs_q, ml_q]


def all_queries():
    out = {}
    for m in MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLES)
    return out
