"""Local replica of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")


def normalize(rows, columns):
    """Sort columns by name, stringify values, sort rows."""
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


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_parity(spark, sf_dir, only=(), results=None):
    """Reusable gate: run each queries() entry vs its DuckDB oracle
    at ``sf_dir``; prints one line per query and returns
    (n_pass, n_fail, n_rowsonly). ``results`` (optional dict) gets a
    per-query status string — certify.py records it as an artifact."""
    import __spark_entry__ as entry

    only = set(only)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if results is None:
        results = {}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            results[name] = f"fail: spark {type(e).__name__}"[:300]
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            results[name] = f"rows-only ({len(srows)} rows)"
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = "fail: duckdb error"
            n_fail += 1
            continue
        # our stringifying compare hides value-TYPE mismatches that a
        # type-sensitive driver hasher can still flag (r2 lesson:
        # DuckDB SUM yields HUGEINT vs Spark bigint — local parity
        # green, driver hash red). Surface risky oracle types loudly.
        risky = {
            c: t
            for c, t in zip(dcols, dtypes)
            if any(k in t.upper() for k in ("HUGEINT", "INT128", "DECIMAL", "UINT"))
        }
        if risky:
            print(f"WARN  {name}: oracle emits driver-risky types {risky} "
                  "— CAST them (e.g. AS BIGINT/DOUBLE) in the oracle SQL")
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            s_n = normalize([tuple(r) for r in srows], scols)
            d_n = normalize(drows, dcols)
            if s_n != d_n:
                diff = [
                    (a, b) for a, b in zip(s_n, d_n) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            results[name] = f"fail: {'; '.join(problems)}"[:300]
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            results[name] = f"pass ({len(srows)} rows)"
            n_pass += 1
    return n_pass, n_fail, n_rowsonly


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from dataframe_spark.session import get_spark

    spark = get_spark("parity")
    spark.sparkContext.setLogLevel("ERROR")
    n_pass, n_fail, n_rowsonly = run_parity(spark, sf_dir, only)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
