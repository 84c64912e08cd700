"""Produce BASELINE.md: DuckDB wall-times for every headline query's
oracle SQL on the same sf parquet files bench.py uses.

DuckDB is the single-node columnar baseline: it runs the semantically
identical SQL (the driver-verified oracle text) on all cores against
the same files, so ratio = spark_sec / duck_sec is a like-for-like
"would a user lose throughput by switching" number at this scale.

Headline queries whose result is engine-specific (no oracle entry:
minhash permutations, seeded sampling) are benchmarked with a
semantically comparable DuckDB formulation where one exists, else
skipped and listed as such.

Usage: python tools/baseline.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# comparable DuckDB work for headline queries with no exact oracle:
# q_dedup_minhash's job is "find near-dup pairs above 0.5 Jaccard";
# the exact n-gram formulation is the fair single-node comparison
# (it is also what our q_dedup_ngram_jaccard oracle runs).
FALLBACK_TO = {"q_dedup_minhash": "q_dedup_ngram_jaccard"}

# Headline queries whose oracle is an INVARIANT CHECK, not a
# re-computation: the Spark side fits the model (Cox Newton passes,
# SemDeDup k-means) while the DuckDB SQL only validates scaffolding
# (constant TRUE columns + row counts, single-digit ms). A
# spark_sec/duck_sec ratio would compare a model fit against a
# COUNT(*) — recorded separately, excluded from vs_baseline, their
# Spark wall still tracked in the bench headline.
INVARIANT_ONLY = {"q_cox_check", "q_semdedup_check"}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from bench import HEADLINE

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    times: dict[str, float] = {}
    invariant: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        sql_name = name if name in oracles else FALLBACK_TO.get(name)
        if sql_name is None or sql_name not in oracles:
            skipped.append(name)
            continue
        sql = oracles[sql_name]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            el = time.monotonic() - t0
            best = el if best is None else min(best, el)
        if name in INVARIANT_ONLY:
            invariant[name] = round(best, 3)
        else:
            times[name] = round(best, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    payload = {
        "engine": f"duckdb {duckdb.__version__}",
        "sf": sf,
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
        "invariant_oracles": invariant,
        "skipped": skipped,
    }

    lines = [
        "# BASELINE — single-node DuckDB wall-times",
        "",
        f"DuckDB {duckdb.__version__}, all cores, parquet at `{sf_dir}`,",
        "best-of-2 per query, full materialization (`fetchall`). The SQL",
        "is each query's driver-verified `oracle_sql()` text, so both",
        "engines compute the identical result on the identical files.",
        "",
        "`bench.py` reads the JSON block below and emits",
        "`spark_sec / duck_sec` per query in `vs_baseline`.",
        "",
        "| query | duckdb sec |",
        "|---|---|",
    ]
    for name, sec in times.items():
        note = " (via q_dedup_ngram_jaccard SQL)" if name in FALLBACK_TO else ""
        lines.append(f"| {name}{note} | {sec} |")
    lines += [
        f"| **total** | **{payload['total_sec']}** |",
        "",
        "Invariant-only oracles (the DuckDB SQL validates scaffolding —",
        "constant TRUE columns — while Spark fits the actual model, so a",
        "ratio would compare a Cox/k-means fit against a COUNT(*); Spark",
        "wall still tracked in the bench headline, excluded from",
        "vs_baseline): "
        + (", ".join(f"{k} ({v}s)" for k, v in invariant.items()) or "none")
        + ".",
        "",
        f"Skipped (engine-specific, no comparable SQL): {', '.join(skipped) or 'none'}.",
        "",
        "Model-holding asymmetry: q_bpe is measured TRAIN-INCLUSIVE on",
        "both engines (bench clears the Spark model cache per pass; the",
        "SQL replays the full merge loop). q_bpe_encode's Spark side",
        "applies a held trained model (deployed-tokenizer posture)",
        "while its SQL must retrain first — SQL cannot hold state — so",
        "that one ratio overstates Spark by the training cost.",
        "",
        "Interpretation: at sf0.1 (~100 MB) every Spark query carries",
        "a fixed ~0.2-0.5 s of planning/scheduling/task-launch that",
        "DuckDB does not, so ratios here are an upper bound dominated",
        "by constant overhead, not by plan quality; the per-query",
        "ratio TREND across rounds (and any query whose ratio is an",
        "outlier vs its peers) is the signal. At cluster scale the",
        "fixed overhead amortizes to zero and shuffle/scan shape — ",
        "what the plan assertions in tests/test_plans.py pin — decides",
        "throughput.",
        "",
        "```json",
        json.dumps(payload),
        "```",
        "",
    ]
    with open("BASELINE.md", "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
