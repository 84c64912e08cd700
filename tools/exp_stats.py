"""Experiment: grouped percentile strategies for q_stats_agg at sf0.1.

  A) current: split decl moments + imperative F.percentile agg, join
  B) pack arrays per (group, partition) via mapInPandas -> applyInPandas np.quantile
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "documents,embeddings,lineitem")

from pyspark.sql import functions as F

from dataframe_spark.session import get_spark
from dataframe_spark.tables import load_table, warm_cache

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
warm_cache(spark, sf_dir)
li = load_table(spark, sf_dir, "lineitem")


def variant_a():
    from dataframe_spark.queries.stats_q import q_stats_agg

    return q_stats_agg(spark, sf_dir)


def variant_b():
    dec = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"),
        F.round(F.var_samp("l_quantity"), 4).alias("var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("r"),
    )

    proj = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("ep"),
        F.col("l_quantity").cast("double").alias("qt"),
    )

    def _pack(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for g, sub in pdf.groupby("l_returnflag"):
                rows.append(
                    {
                        "l_returnflag": g,
                        "ep": sub["ep"].to_numpy(),
                        "qt": sub["qt"].to_numpy(),
                    }
                )
            yield pd.DataFrame(rows)

    packed = proj.mapInPandas(
        _pack, "l_returnflag string, ep array<double>, qt array<double>"
    )

    def _q(pdf):
        import numpy as np
        import pandas as pd

        ep = np.concatenate([np.asarray(a) for a in pdf["ep"]])
        qt = np.concatenate([np.asarray(a) for a in pdf["qt"]])
        p = np.quantile(ep, [0.9, 0.25, 0.75])
        med = np.quantile(qt, 0.5)
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "p90": [round(p[0], 4)],
                "med": [round(float(med), 4)],
                "iqr": [round(p[2] - p[1], 4)],
            }
        )

    imp = packed.groupBy("l_returnflag").applyInPandas(
        _q, "l_returnflag string, p90 double, med double, iqr double"
    )
    return dec.join(imp, "l_returnflag").select(
        "l_returnflag", "sd", "var", "p90", "med", "iqr", "r"
    )


def time_it(name, fn, n=6):
    fn().write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    walls.sort()
    print(f"{name}: min={walls[0]:.3f} all={[round(w,2) for w in walls]}")


time_it("A_current", variant_a)
time_it("B_group_pack", variant_b)
