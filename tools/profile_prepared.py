"""Bench-methodology profiler: build each named query's DataFrame
ONCE (the prepared handle, as bench.py times it), then report
best/median execution wall over N noop-sink passes, interleaving
queries across passes so a tenant-steal burst cannot poison one
query's whole sample.

    python tools/profile_prepared.py q_a q_b [--n 6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
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

    spark = get_spark("profile-prepared", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, sf_dir)
    qs = all_queries()

    built = {}
    for name in names:
        t0 = time.monotonic()
        built[name] = qs[name](spark, sf_dir)
        build_s = time.monotonic() - t0
        t0 = time.monotonic()
        built[name].write.format("noop").mode("overwrite").save()  # warmup
        print(
            f"{name}: build={build_s:.3f} first_exec="
            f"{time.monotonic() - t0:.3f}"
        )
    walls = {name: [] for name in names}
    for _ in range(n):
        for name in names:
            t0 = time.monotonic()
            built[name].write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.monotonic() - t0, 3))
    for name in names:
        w = sorted(walls[name])
        print(f"{name}: min={w[0]:.3f} med={w[len(w) // 2]:.3f} all={w}")


if __name__ == "__main__":
    main()
