"""In-pytest DuckDB-oracle parity (SURVEY §5): a fast subset of the
driver's correctness gate at sf0.001. The full sweep lives in
tools/parity.py; this keeps a regression tripwire inside `pytest
tests/` for the most load-bearing query shapes."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# cheap-but-representative: agg, join, window, dedup, text, embedding
SUBSET = [
    "q1_pricing_summary",
    "q_join_semi_anti",
    "q_window_rolling",
    "q_dedup_exact",
    "q_corpus_filter",
    "q_embed_norm",
    "q_resample",
]


def _normalize(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if v != v:
                    vals.append("nan")
                elif v == int(v) and abs(v) < 1e15:
                    vals.append(str(int(v)))
                else:
                    vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(entry.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, spark_cols) == _normalize(duck_rows, duck_cols)


# session-config-sensitive shapes: epoch/tz arithmetic, ANSI-risky
# division/casts, md5 ordering, window sums (the driver's session may
# run ANSI-on in a non-UTC timezone — r2/r3 lesson)
HOSTILE_SUBSET = [
    "q_sessionize",
    "q_stream_window",
    "q_asof_join",
    "q_sample_group",
    "q_winsorize",
    "q_pack",
    "q_token_budget",
    "q_mixture",
]


@pytest.mark.parametrize("name", HOSTILE_SUBSET)
def test_query_matches_oracle_hostile_session(spark, duck, name):
    """Same oracle compare, but under ANSI=true and a DST-observing
    session timezone — any dependence on the builder's session
    defaults shows up here before the driver sees it."""
    import __spark_entry__ as entry

    prev_ansi = spark.conf.get("spark.sql.ansi.enabled")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        sdf = entry.queries()[name](spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = sdf.columns
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev_ansi)
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    res = duck.execute(entry.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, spark_cols) == _normalize(duck_rows, duck_cols)


@pytest.mark.slow
def test_full_registry_parity(spark, duck):
    """Full-registry pre-flight: every oracle-backed queries() entry
    against its DuckDB oracle at sf0.001 in ONE sweep. The driver's
    per-round window covers 50 entries; with a 96-entry registry
    this is the only per-round all-queries signal (VERDICT r3 #6).
    Runs on the shared session/connection to amortize startup."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            continue  # rows-only by design
        try:
            sdf = fn(spark, SF_DIR)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
            res = duck.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            if sorted(spark_cols) != sorted(duck_cols):
                failures.append(f"{name}: cols {sorted(spark_cols)} != {sorted(duck_cols)}")
            elif len(spark_rows) != len(duck_rows):
                failures.append(f"{name}: rows {len(spark_rows)} != {len(duck_rows)}")
            elif _normalize(spark_rows, spark_cols) != _normalize(duck_rows, duck_cols):
                failures.append(f"{name}: value hash mismatch")
        except Exception as e:  # noqa: BLE001 - collect, report all at once
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
