"""Data-drift report between two corpus/event slices.

Composes the exact distributed statistics suite into one report —
the checks a production pipeline runs when a new ingest batch or
source lands:

- numeric drift: two-sample KS (shape), Mann-Whitney z (location),
  PSI over reference deciles (magnitude)
- categorical drift: chi-square + Cramér's V
- text drift: token-distribution Jensen-Shannon divergence

Every statistic is a one-row Spark plan (no SciPy on the data
path, no single-partition sorts); the report is a handful of tiny
collects at the end.

Run: python examples/drift_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import dataframe_spark as D
from dataframe_spark.operators.text import js_divergence
from dataframe_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = D.get_spark("drift_report")
    spark.sparkContext.setLogLevel("ERROR")

    ev = D.DataFrame(load_table(spark, sf_dir, "events"))
    docs = load_table(spark, sf_dir, "documents")
    g = F.col("event_type")

    ks = ev.ks_test("value", g, "click", "purchase").df.collect()[0]
    mw = ev.mann_whitney_u("value", g, "click", "purchase").df.collect()[0]
    psi = ev.psi("value", g, "click", "purchase").df.collect()[0]
    chi = ev.chi_square(
        "event_type", F.dayofweek("ts").cast("string")
    ).df.collect()[0]
    jsd = js_divergence(docs, "text", "source", "src0", "src1").collect()[0]

    print("=== drift report: click vs purchase event values ===")
    print(f"KS statistic      {ks['ks']:.4f}   (n={ks['n_a']}/{ks['n_b']})")
    print(f"Mann-Whitney z    {mw['z']:+.3f}   (U_a={mw['u_a']:.0f})")
    print(f"PSI               {psi['psi']:.4f}   (<0.1 stable, >0.25 shifted)")
    print("=== categorical: event_type vs day-of-week ===")
    print(f"chi2={chi['chi2']:.2f}  dof={chi['dof']}  V={chi['cramers_v']:.4f}")
    sp = ev.spearman_corr("value", F.hour("ts")).df.collect()[0]
    from dataframe_spark.operators.scale import bootstrap_mean_se

    bse = bootstrap_mean_se(
        ev.df.where(g.isin("click", "purchase")),
        "value",
        ["event_id"],
        ["event_type"],
        n_replicates=40,
    ).collect()
    print("=== association / uncertainty ===")
    print(f"spearman(value, hour) {sp['spearman']:+.4f} "
          f"(pearson {sp['pearson']:+.4f})")
    for r in sorted(bse, key=lambda r: r["event_type"]):
        print(f"mean value[{r['event_type']}] = {r['mean']:.2f} "
              f"+- {r['se_boot']:.3f} (poisson bootstrap, B=40)")
    print("=== text: src0 vs src1 token mix ===")
    print(
        f"JSD {jsd['jsd_bits']:.4f} bits over {jsd['vocab_union']} union tokens"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
