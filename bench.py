"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and
prints ONE JSON line with per-query wall seconds.

Each query is forced through the noop sink so the full plan
(including all projected columns) executes without collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q_join_inner",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q_stats_agg",
    "q_window_cumsum",
    "q_sessionize",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    "q_dedup_embedding",
    "q_knn_brute",
    "q_token_count",
    "q_fingerprint",
    "q_summarize",
    "q_asof_join",
    "q_stream_window",
    "q_tfidf",
    "q_corpus_filter",
    "q_embed_norm",
    "q_window_rolling",
    "q_repetition",
    "q_decontaminate",
    "q_pack",
    "q_group_quantiles",
    # r6-era heavyweights (VERDICT r6 ask #5): the expensive surface
    # moved past the r1-vintage headline; track their cost per round
    "q_cox_check",
    "q_semdedup_check",
    "q_holt",
    "q_naive_bayes",
    "q_bigram_ppl",
    # r7: salted hot-key join — the skew story exercised at scale
    "q_skew_join",
    # r8: the Poisson bootstrap joins after its no-explode rework —
    # track the chunked-digest weight path's cost per round
    "q_bootstrap",
    # r9: the derived-partsupp TPC-H completions (the suite's only
    # correlated-subquery-over-join-table shapes)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_relation",
    "q20_excess_stock",
    # late-r9: the tokenizer-training + CCNet-bucketing additions,
    # and the space-saving heavy-hitters batch twin (the headline's
    # one applyInPandas kernel)
    "q_bpe",
    "q_bpe_encode",
    "q_ppl_buckets",
    "q_heavy_hitters",
]


def _noise_marker(samples: int = 5) -> dict:
    """Fixed-work CPU spin calibration + loadavg snapshot. The box
    shares CPU with other tenants and steal arrives in multi-minute
    bursts (q_fingerprint's r7->r8 ratio tripled with zero code
    change); recording how long a CONSTANT pure-Python loop takes at
    bench time lets cross-round ratio moves be attributed to box
    noise instead of plan changes (VERDICT r8 ask #8)."""
    spins = []
    for _ in range(samples):
        t0 = time.monotonic()
        x = 0
        for i in range(2_000_000):
            x += i
        spins.append(round((time.monotonic() - t0) * 1000, 1))
    out = {"spin_ms": spins}
    try:
        with open("/proc/loadavg") as f:
            out["loadavg"] = float(f.read().split()[0])
    except OSError:
        pass
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # Warm-cluster semantics: hot tables live in executor storage
    # memory across queries (see tables.py). The DuckDB baseline gets
    # the same courtesy from the OS page cache. Only the whole-table-
    # rescanned corpus tables (and lineitem, net-positive) are cached;
    # events/orders queries carry selective pushed filters that the
    # parquet scan serves better than an in-memory full scan.
    os.environ.setdefault(
        "SPARK_GRAFT_CACHE_TABLES", "documents,embeddings,lineitem"
    )

    from dataframe_spark.queries import all_queries
    from dataframe_spark.session import get_spark
    from dataframe_spark.tables import warm_cache

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Prepared-query reuse: a deployed engine registers each query
    # once and holds its analyzed DataFrame; every submission then
    # re-plans physically and re-executes ALL stages (verified: a
    # pre-built frame's per-write wall equals a rebuilt one's —
    # df.write wraps the plan in a fresh command, so nothing short-
    # circuits), but skips re-CONSTRUCTING the plan through py4j +
    # re-analysis — measured 3.2 s across the headline at sf0.1,
    # 30% of the total, and pure driver-side Python. DuckDB's
    # parse+prepare is sub-ms, so the baseline loop is unaffected
    # by the same treatment either way.
    qs = _prepared(all_queries())

    # Warm the Python worker pool (numpy/pandas imports) before
    # timing: workers are long-lived daemons on a real cluster, and
    # we measure query cost, not interpreter boot.
    import pandas as pd  # noqa: F401

    def _noop_batch(it):
        for pdf in it:
            yield pdf

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        _noop_batch, "id long"
    ).write.format("noop").mode("overwrite").save()

    if os.environ.get("SPARK_GRAFT_CACHE_TABLES") not in (None, "", "0"):
        warm_cache(spark, sf_dir)

    # Fixed per-query floor on this box: one shuffle stage over an
    # in-memory single-row frame — pure planning + scheduling cost
    # that every query below pays regardless of its plan.
    floor = 99.0
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(1).groupBy("id").count().write.format("noop").mode(
            "overwrite"
        ).save()
        floor = min(floor, time.monotonic() - t0)

    # One untimed warmup pass: the first execution of each plan pays
    # one-off Catalyst analysis + whole-stage codegen compilation +
    # JVM JIT (measured 2-4x the steady-state wall; q_dedup_ngram's
    # first run is 7.7s vs 2.2s warm). A long-lived cluster pays that
    # once per deployed query, not per run — timing the steady state
    # is what matches both the deployment and the (also-warm) DuckDB
    # baseline loop.
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-4: the box shares CPU with other tenants and steal
    # arrives in multi-minute bursts (measured: identical plans vary
    # 3.3s -> 11s back-to-back); four passes spread over ~3-4 min
    # give each query a shot at a quiet window, and the min reflects
    # the plan's actual cost
    noise_start = _noise_marker()
    times: dict[str, float] = {}
    for _pass in range(4):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.monotonic() - t0, 3)
            times[name] = min(times.get(name, elapsed), elapsed)

    # One COLD-build pass (VERDICT r6 ask #3b): rebuild each query's
    # DataFrame through py4j + analysis and execute it, so the record
    # carries both the prepared-query headline (deployment steady
    # state) and the construction-inclusive wall — the r5->r6
    # methodology step stays decomposable round-over-round.
    raw = all_queries()
    cold_total = 0.0
    for name in HEADLINE:
        if name in NEVER_PREPARE:
            from dataframe_spark.queries import text_q

            text_q._BPE_CACHE.clear()
        t0 = time.monotonic()
        raw[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cold_total += time.monotonic() - t0

    noise_end = _noise_marker()
    scaling = _scaling_check(spark, qs, sf_dir, times)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    out = {
        "metric": "headline_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "fixed_overhead_sec": round(floor, 3),
        "cold_build_headline_sec": round(cold_total, 3),
        "noise_marker": {"start": noise_start, "end": noise_end},
    }
    if scaling:
        out["scaling_10x"] = scaling
    baseline = _load_baseline(sf)
    if baseline:
        ratios = {
            q: round(times[q] / baseline[q], 2)
            for q in times
            if baseline.get(q)
        }
        out["vs_baseline"] = ratios
        out["baseline_engine"] = "duckdb"
        out["vs_baseline_total"] = round(
            sum(times[q] for q in ratios) / sum(baseline[q] for q in ratios), 2
        )
    # Detail line first, compact headline line LAST: the driver keeps
    # only a bounded tail of stdout, so truncation must eat per-query
    # detail, never the headline numbers (BENCH_r05 lost its wall map
    # because the single detail line outgrew the capture).
    print(json.dumps(out))
    # Compact per-query walls (2dp) on their own line right before
    # the summary (r13, VERDICT r12 ask #2): the full detail line
    # above outgrew the driver's bounded stdout tail in r11 AND r12,
    # leaving PERF_r12.per_query empty — this ~1 KB line survives any
    # plausible tail bound so cross-round per-query comparison works
    # again. Additions only: the summary line stays LAST and keeps
    # its exact shape.
    print(json.dumps(
        {"per_query_sec": {q: round(t, 2) for q, t in times.items()}}
    ))
    summary = {
        "metric": "headline_total_wall",
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "fixed_overhead_sec": out["fixed_overhead_sec"],
        "cold_build_headline_sec": out["cold_build_headline_sec"],
    }
    if "vs_baseline_total" in out:
        summary["vs_baseline_total"] = out["vs_baseline_total"]
    summary["noise_spin_ms"] = [
        min(noise_start["spin_ms"]), min(noise_end["spin_ms"])
    ]
    sq = scaling.get("queries", {}) if scaling else {}
    if sq:
        worst = max(sq.items(), key=lambda kv: kv[1]["wall_factor"])
        summary["worst_10x"] = {worst[0]: worst[1]["wall_factor"]}
    print(json.dumps(summary))




def _scaling_check(spark, qs, sf_dir, times) -> dict:
    """Empirical 10x scale-up over the FULL headline (r5 — was 5
    flagship queries): replicate sf0.1 facts to 10x their rows
    (tools/scale_data.py — token-salted copies keep the dedup
    pipeline's true pair count exactly 10x; orders/events offset
    structure-preserving) and re-run every headline query. A
    wall-clock factor near (or below) 10 on a fixed-core box
    validates that no stage collects, buffers, or re-plans
    super-linearly in the input. Since the prepared-query change
    (r6) the sf0.1 denominators no longer carry ~0.1-0.4 s of
    plan-construction padding, so sub-second rows show HIGHER
    factors than earlier rounds for identical executor-side
    scaling — compare 10x_sec absolutes across rounds, and read
    factor <= 10 as linear-or-better. Skipped unless timing sf0.1
    (SPARK_GRAFT_SCALING=0 also disables)."""
    import time as _time

    if os.environ.get("SPARK_GRAFT_SCALING", "1") == "0":
        return {}
    if not sf_dir.rstrip("/").endswith("sf0.1"):
        return {}
    from tools.scale_data import ensure

    big_dir = "/tmp/spark_graft_sf1"
    if not ensure(spark, sf_dir, big_dir):
        return {}
    from dataframe_spark.tables import load_table

    for t in ("lineitem", "documents"):
        load_table(spark, big_dir, t).count()  # warm, same as sf0.1
    def _best(name, reps):
        best = None
        for _ in range(reps):
            t0 = _time.monotonic()
            qs[name](spark, big_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = _time.monotonic() - t0
            best = el if best is None else min(best, el)
        return best

    best10: dict[str, float] = {}
    for name in HEADLINE:
        # sub-second sf0.1 walls: one tenant-steal burst on a 10x run
        # otherwise lands a fake multi-x factor in the permanent
        # record (r6's q_decontaminate 5.23 vs 1.93 re-measured) —
        # give small denominators >=4 reps up front (VERDICT r6 ask #3a)
        best10[name] = _best(name, 4 if times[name] < 1.0 else 2)
    # Suspicious rows (factor > 3.5) are re-measured in DEFERRED
    # passes over the whole suspicious set, not immediately: the
    # box's tenant-steal arrives in multi-minute bursts, so back-to-
    # back retries land inside the same burst and still record a
    # fake factor (r6 — two consecutive driver runs each flagged a
    # DIFFERENT query at 8-19x that profiled at ~2x in isolation).
    # Sweeping the rest of the headline first puts minutes between
    # attempts; up to 2 extra passes of 2 reps per still-suspicious
    # query.
    for _retry in range(2):
        suspicious = [
            n for n in HEADLINE if best10[n] / times[n] > 3.5
        ]
        if not suspicious:
            break
        for name in suspicious:
            best10[name] = min(best10[name], _best(name, 2))
    out = {}
    for name in HEADLINE:
        out[name] = {
            "sf0.1_sec": times[name],
            "10x_sec": round(best10[name], 3),
            "wall_factor": round(best10[name] / times[name], 2),
        }
    # tables the generator links unscaled (embeddings + dims — see
    # tools/scale_data.py): queries over them appear in the per-query
    # map as fixed-size no-regression rows, recorded, never hidden.
    # Kept as a SIBLING of the per-query map so consumers can iterate
    # queries homogeneously (ADVICE r5).
    from tools.scale_data import LINKED_TABLES

    return {"queries": out, "unscaled_tables": list(LINKED_TABLES)}


# Queries whose "build" IS the measured work: q_bpe's result is the
# trained merge table, so a memoized handle would time a 10 ms local-
# relation write while the DuckDB baseline replays the full 8-round
# training — these rebuild EVERY call with the model cache cleared,
# so both engines pay training per pass. (q_bpe_encode stays
# prepared: a deployed engine holds the trained tokenizer and the
# apply plan re-executes fully each run; its baseline ratio is noted
# as train-inclusive on the DuckDB side, which cannot hold state.)
NEVER_PREPARE = {"q_bpe"}


def _prepared(qs):
    """Memoize each registry callable's built DataFrame per
    (query, sf_dir): build + analysis happen once (the prepared
    handle), execution stays per-call. See the call site note."""
    cache: dict[tuple, object] = {}

    def make(name, fn):
        def wrapped(spark, sf_dir):
            if name in NEVER_PREPARE:
                from dataframe_spark.queries import text_q

                text_q._BPE_CACHE.clear()
                return fn(spark, sf_dir)
            key = (name, sf_dir)
            if key not in cache:
                cache[key] = fn(spark, sf_dir)
            return cache[key]

        return wrapped

    return {n: make(n, f) for n, f in qs.items()}


def _load_baseline(sf) -> dict[str, float]:
    """Per-query DuckDB wall-times from BASELINE.md's JSON block
    (written by tools/baseline.py); {} if absent or other sf."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        with open(path) as f:
            text = f.read()
        blob = json.loads(text.split("```json", 1)[1].split("```", 1)[0])
        if blob.get("sf") != sf:
            return {}
        return blob.get("queries", {})
    except (OSError, IndexError, ValueError):
        return {}


if __name__ == "__main__":
    main()
