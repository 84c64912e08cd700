"""Ad-hoc per-query profiler: run named queries N times warm and
print min/median wall, plus optionally the formatted plan.

    python tools/profile_q.py q_summarize q_tfidf [--explain] [--n 6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    explain = "--explain" in argv
    n = 6
    if "--n" in argv:
        i = argv.index("--n")
        n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = [a for a in argv if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault(
        "SPARK_GRAFT_CACHE_TABLES", "documents,embeddings,lineitem"
    )

    from dataframe_spark.queries import all_queries
    from dataframe_spark.session import get_spark
    from dataframe_spark.tables import warm_cache

    spark = get_spark("profile", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, sf_dir)
    qs = all_queries()

    for name in names:
        fn = qs[name]
        if explain:
            fn(spark, sf_dir).explain("formatted")
        walls = []
        for _ in range(n):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        walls.sort()
        print(
            f"{name}: min={walls[0]:.3f} med={walls[len(walls)//2]:.3f} "
            f"all={[round(w, 2) for w in walls]}"
        )


if __name__ == "__main__":
    main()
