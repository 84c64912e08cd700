"""Experiment: compare quartile kernel variants for summarize at sf0.1.

Variants:
  A) current: posexplode melt -> groupBy(ci).applyInPandas (column-parallel)
  B) single-worker: narrow 8-col projection -> mapInPandas on coalesce(1)
  C) F.percentile array (imperative agg, one buffer per column)
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

NUM = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
warm_cache(spark, sf_dir)
li = load_table(spark, sf_dir, "lineitem")


def variant_a():
    pairs = li.select(
        F.posexplode(F.array(*[F.col(c).cast("double") for c in NUM])).alias("ci", "v")
    ).where(F.col("v").isNotNull() & ~F.isnan("v"))

    def _np_quartiles(pdf):
        import numpy as np
        import pandas as pd
        q = np.quantile(pdf["v"].to_numpy(), [0.25, 0.5, 0.75])
        return pd.DataFrame(
            {"ci": [pdf["ci"].iloc[0]], "q25": [q[0]], "median": [q[1]], "q75": [q[2]]}
        )

    return pairs.groupBy("ci").applyInPandas(
        _np_quartiles, "ci int, q25 double, median double, q75 double"
    )


def variant_b():
    proj = li.select(*[F.col(c).cast("double").alias(c) for c in NUM]).coalesce(1)

    def _all_quartiles(it):
        import numpy as np
        import pandas as pd
        chunks = list(it)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(columns=NUM)
        rows = []
        for i, c in enumerate(NUM):
            v = pdf[c].to_numpy()
            v = v[~np.isnan(v)]
            q = np.quantile(v, [0.25, 0.5, 0.75]) if len(v) else [None] * 3
            rows.append({"ci": i, "q25": q[0], "median": q[1], "q75": q[2]})
        yield pd.DataFrame(rows)

    return proj.mapInPandas(_all_quartiles, "ci int, q25 double, median double, q75 double")


def variant_c():
    aggs = []
    for c in NUM:
        p = F.percentile(
            F.col(c).cast("double"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        )
        aggs.append(p.alias(f"__q_{c}"))
    return li.agg(*aggs)


def time_it(name, fn, n=5):
    fn().write.format("noop").mode("overwrite").save()  # warm
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    walls.sort()
    print(f"{name}: min={walls[0]:.3f} all={[round(w,2) for w in walls]}")


time_it("A_column_parallel", variant_a)
time_it("B_single_worker", variant_b)
time_it("C_percentile_agg", variant_c)


def variant_d():
    proj = li.select(*[F.col(c).cast("double").alias(c) for c in NUM])

    def _pack(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            rows = []
            for i, c in enumerate(NUM):
                v = pdf[c].to_numpy()
                v = v[~np.isnan(v)]
                rows.append({"ci": i, "vals": v.tolist()})
            yield pd.DataFrame(rows)

    packed = proj.mapInPandas(_pack, "ci int, vals array<double>")

    def _merge_q(pdf):
        import numpy as np
        import pandas as pd
        v = np.concatenate([np.asarray(a) for a in pdf["vals"]]) if len(pdf) else np.array([])
        q = np.quantile(v, [0.25, 0.5, 0.75]) if len(v) else [None] * 3
        return pd.DataFrame(
            {"ci": [pdf["ci"].iloc[0]], "q25": [q[0]], "median": [q[1]], "q75": [q[2]]}
        )

    return packed.groupBy("ci").applyInPandas(
        _merge_q, "ci int, q25 double, median double, q75 double"
    )


time_it("D_array_packed", variant_d)
