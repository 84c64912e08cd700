"""Reproducible certification sweeps (VERDICT r7 ask #9): every
round-level claim that used to be a one-off session command is a
subcommand here, each emitting one JSON artifact at the repo root so
the next round re-runs the exact same evidence.

Usage: python tools/certify.py <sweep> [options]

  parity [sf_dir] [--ansi] [--tag NAME]
      Full-registry Spark-vs-DuckDB parity at sf_dir (default
      sf0.01), optionally under an ANSI-enabled session (the
      driver's worst-case config). -> CERT_parity_<tag>.json

  tenx
      Execute EVERY registry query against the 10x scale-up of
      sf0.1 (generated on demand via tools/scale_data.ensure) and
      record wall + row count + zero-error status.
      -> CERT_tenx.json

  vectors
      The r8 vector-scale sweep: semdedup / IVF / PageRank on the
      SYNTHETIC clustered embedding corpora at 10x (20k x 256) and
      100x (200k x 256), caches off, with the operator knobs scaled
      the way their docstrings prescribe (SemDeDup k proportional to
      corpus; IVF nlist fixed so probe cost is a constant fraction).
      Records per-decade wall factors (100x / 10x; 10 = linear).
      -> CERT_vectors.json

  decades
      The r7 two-decade flagship sweep, reproducible: ten flagship
      queries timed at 10x and 100x (chained scale_data), caches
      off, per-decade wall factors. -> CERT_decades.json

  thousandx
      THREE-decade sweep (late r9): a flagship subset timed at 10x,
      100x, AND 1000x (sf0.1 scaled to ~6 B lineitem-equivalent
      rows, ~18 GB parquet — the largest corpus this box can hold),
      caches off. Reports BOTH per-decade factors (100x/10x and
      1000x/100x); a plan that is secretly super-linear shows a
      GROWING factor across decades, which two points cannot see.
      -> CERT_thousandx.json

  barrier_ab
      The r11 cache-racing diagnosis as a committed artifact
      (VERDICT r11 ask #6): jaccard end-to-end at 1000x with the
      _materialize barriers ON vs OFF, interleaved ABBA in one
      session, identical plan and data. -> CERT_barrier_ab.json

NOISE REGIME (r12, VERDICT r11 ask #1). The box swings same-code
walls 2-9x (documented r11: virtio disk, long-lived JVM state, one
wedged 48 GB JVM that poisoned a round of measurements), so raw
single-rep walls are not evidence. Every decade-factor sweep now:
  (a) REFUSES to start while any java process is resident
      (_guard_stray_jvm; override SPARK_GRAFT_ALLOW_STRAY_JVM=1),
  (b) runs a FIXED-WORK canary (q_stats_agg on the 10x corpus)
      before and after each fresh decade process and commits
      canary-NORMALIZED factors next to the raw ones — the canary
      ratio measures how fast the box actually was while that
      decade ran,
  (c) commits EVERY rep wall (best + spread), best-of-3 at the top
      decade.

Artifacts carry the sweep parameters so a diff between rounds is
meaningful. All sweeps run on the session defaults (local[32],
shuffle.partitions 32) unless noted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SF01 = "/root/testdata/sf0.1"
DIR_10X = "/tmp/spark_graft_sf1"
DIR_100X = "/tmp/spark_graft_sf10"
DIR_1000X = "/tmp/spark_graft_sf100"

# the three-decade subset: every pipeline family with a sub-minute
# 100x wall (vector ops stay on the 2-decade CERT_vectors sweep —
# semdedup at 2M x 256 would dominate the box for no extra signal)
TX_FLAGSHIPS = [
    "q1_pricing_summary",   # full-scan relational agg
    "q_stats_agg",          # wide numeric aggregation
    "q_sessionize",         # per-user event windows
    "q_asof_join",          # range join
    "q_token_count",        # per-byte text kernel
    "q_dedup_minhash",      # LSH banding near-dup
    "q_dedup_ngram_jaccard",  # shingle-bucket near-dup
    "q_dedup_paragraphs",   # paragraph-level exact dedup
    "q_bloom_check",        # broadcast Bloom screen
    "q_bpe",                # tokenizer training (word-type table)
]

FLAGSHIPS = [
    "q1_pricing_summary", "q_stats_agg", "q_sessionize", "q_summarize",
    "q_dedup_ngram_jaccard", "q_dedup_minhash", "q_skew_join", "q_holt",
    "q_asof_join", "q_token_count",
    # r9 (VERDICT r8 ask #5): the 100 TB pitch rests on the text-dedup
    # stack — give banding/span/paragraph/bloom 100x evidence too
    "q_remove_spans", "q_dedup_paragraphs", "q_bloom_check",
    # r9 (VERDICT r8 ask #1): pin the beam-search scale story in the
    # committed artifact (memoization cleared per rep — see below)
    "q_synthesis",
]


def _spark(name, ansi=False):
    from dataframe_spark.session import get_spark

    spark = get_spark(name)
    if ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _write(path, payload):
    payload["generated_by"] = f"tools/certify.py {' '.join(sys.argv[1:])}"
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"\nwrote {path}")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _guard_stray_jvm():
    """Refuse to certify while a Spark JVM is already resident
    (VERDICT r11 ask #1c, automated): r11 found a wedged 48 GB
    certification JVM from an OOM'd sweep still alive during later
    measurements — pytest wall 98.7 s -> 569 s for the same
    selection until it was killed. Any java process at sweep start
    is by definition not ours (each sweep creates its own session
    after this check), so its presence means the walls about to be
    measured would be box-contention artifacts.

    A JUST-EXITED sweep's JVM takes a few seconds to die after its
    python parent (py4j shutdown is asynchronous), so back-to-back
    sweeps are legitimate: the guard polls for up to 45 s and only
    refuses a JVM that OUTLIVES the grace period — a wedged JVM
    never exits, a healthy teardown clears in seconds."""
    import subprocess

    if os.environ.get("SPARK_GRAFT_ALLOW_STRAY_JVM") == "1":
        return

    def resident():
        try:
            out = subprocess.run(
                ["ps", "-eo", "pid=,rss=,comm="],
                capture_output=True, text=True,
            ).stdout
        except OSError:  # no ps: cannot check, proceed
            return []
        stray = []
        for line in out.splitlines():
            parts = line.split(None, 2)
            if len(parts) == 3 and parts[2].strip() == "java":
                stray.append(
                    f"pid {parts[0]} rss {int(parts[1]) // 1024} MB"
                )
        return stray

    deadline = time.monotonic() + 45
    stray = resident()
    while stray and time.monotonic() < deadline:
        time.sleep(3)
        stray = resident()
    if stray:
        print(
            "REFUSING to certify: java process(es) still resident "
            "after a 45 s grace period: " + "; ".join(stray)
            + "\n(a stray Spark JVM poisons every wall measured next to "
            "it — kill it, or set SPARK_GRAFT_ALLOW_STRAY_JVM=1 to "
            "measure anyway)",
            file=sys.stderr,
        )
        sys.exit(3)


def _time_reps(build, reps=2, spark=None):
    """All rep walls (cold per rep — storage cache cleared like
    _time_best) so the artifact commits the SPREAD next to the
    point estimate (VERDICT r11 ask #1b): on a box whose
    same-code walls swing 2-9x, a best-of without its reps is not
    auditable."""
    walls = []
    for _ in range(reps):
        if spark is not None:
            spark.catalog.clearCache()
        t0 = time.monotonic()
        _noop(build())
        walls.append(round(time.monotonic() - t0, 3))
    return walls


def _rep_stats(walls):
    return {
        "sec": min(walls),
        "reps": walls,
        "spread": round(max(walls) / max(min(walls), 1e-9), 2),
    }


def _time_best(build, reps=3, spark=None):
    """Best-of-reps wall for a freshly built frame per rep (cold
    plan each time — certification measures the submit-to-done wall,
    not the prepared steady state).

    Pass ``spark`` to ALSO clear the storage cache before every rep:
    operators persist reusable intermediates (_reusable), and a
    rep-2 (or later-query) build of the identical logical plan hits
    that cache. At small decades the cached frames fit and rep 2
    measures warm; at the top decade they evict and the measurement
    is cold — a warm/cold asymmetry that fabricates super-linear
    decade factors (the late-r9 thousandx run read ngram-jaccard at
    46.9x/decade; cold-vs-cold it is 8.0x). Decade sweeps therefore
    clear the cache so every decade measures the same thing: the
    cold submit-to-done wall."""
    best = float("inf")
    for _ in range(reps):
        if spark is not None:
            spark.catalog.clearCache()
        t0 = time.monotonic()
        _noop(build())
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def sweep_parity(argv):
    sf_dir = "/root/testdata/sf0.01"
    ansi = False
    tag = None
    it = iter(argv)
    for a in it:
        if a == "--ansi":
            ansi = True
        elif a.startswith("--tag"):
            # accept both '--tag=NAME' and '--tag NAME'
            if "=" in a:
                tag = a.split("=", 1)[1]
            else:
                tag = next(it, None)
            if not tag:
                print("--tag requires a value (--tag=NAME or --tag NAME)",
                      file=sys.stderr)
                sys.exit(2)
        else:
            sf_dir = a
    if tag is None:
        tag = os.path.basename(sf_dir.rstrip("/")) + ("_ansi" if ansi else "")
    from tools.parity import run_parity

    spark = _spark("certify_parity", ansi=ansi)
    results = {}
    n_pass, n_fail, n_rowsonly = run_parity(spark, sf_dir, results=results)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    _write(f"CERT_parity_{tag}.json", {
        "sweep": "parity", "sf_dir": sf_dir, "ansi": ansi,
        "n_pass": n_pass, "n_fail": n_fail, "n_rows_only": n_rowsonly,
        "results": results,
    })
    # prompt JVM teardown so a back-to-back sweep's stray-JVM guard
    # sees a clean box without burning its grace period
    spark.stop()
    sys.exit(1 if n_fail else 0)


def sweep_arrow_parity(argv):
    """Oracle-backed parity with the ARROW kernels FORCED at a
    driver SF (r13, VERDICT r12 ask #3b): the engine knees resolve
    to the JVM expressions at every driver SF, so the kernels that
    run at 100x+ were otherwise covered only by pinned bit-equality
    unit tests. Forcing SPARK_GRAFT_SIG_ENGINE=arrow (the r12
    minhash signature kernel) and SPARK_GRAFT_SHINGLE_ENGINE=arrow
    (the r13 tokenize→shingle→xxhash64 kernel) routes every
    shingle-based query through the kernel plans and verifies the
    FULL registry against the DuckDB oracle on them."""
    os.environ["SPARK_GRAFT_SIG_ENGINE"] = "arrow"
    os.environ["SPARK_GRAFT_SHINGLE_ENGINE"] = "arrow"
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    tag = os.path.basename(sf_dir.rstrip("/"))
    from tools.parity import run_parity

    spark = _spark("certify_arrow_parity")
    results = {}
    n_pass, n_fail, n_rowsonly = run_parity(spark, sf_dir, results=results)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    _write(f"CERT_parity_arrow_{tag}.json", {
        "sweep": "arrow_parity", "sf_dir": sf_dir,
        "forced": {"SPARK_GRAFT_SIG_ENGINE": "arrow",
                   "SPARK_GRAFT_SHINGLE_ENGINE": "arrow"},
        "n_pass": n_pass, "n_fail": n_fail, "n_rows_only": n_rowsonly,
        "results": results,
    })
    spark.stop()
    sys.exit(1 if n_fail else 0)


def _ensure_10x(spark):
    from tools.scale_data import ensure

    if not ensure(spark, SF01, DIR_10X):
        print("10x generation failed", file=sys.stderr)
        sys.exit(1)


def _ensure_100x(spark):
    from tools.scale_data import ensure

    _ensure_10x(spark)
    if not ensure(spark, DIR_10X, DIR_100X):
        print("100x generation failed", file=sys.stderr)
        sys.exit(1)


def sweep_tenx(argv):
    import __spark_entry__ as entry

    spark = _spark("certify_tenx")
    _ensure_10x(spark)
    qs = entry.queries()
    out, n_err = {}, 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            n = fn(spark, DIR_10X).count()
            out[name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}
        except Exception as e:  # record, keep sweeping
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            n_err += 1
        print(name, out[name])
    _write("CERT_tenx.json", {
        "sweep": "tenx", "dir": DIR_10X, "n_queries": len(out),
        "n_errors": n_err, "queries": out,
    })
    sys.exit(1 if n_err else 0)


def sweep_vectors(argv):
    """Per-decade scaling of the similarity stack on the synthetic
    clustered corpora. Knobs scale per the operator contracts:

    - semdedup: k = n_rows / EMB_CLUSTER_SIZE (the paper's k ∝
      corpus setting; within-cluster pair work then grows linearly)
    - knn_ivf: nlist fixed at 64, nprobe 8 — assignment is one
      linear GEMM pass and probing scans a constant nprobe/nlist
      fraction of rows
    - pagerank: 10 power iterations over the within-cluster cosine
      edge set (planted `label` as the bucket — edge count grows
      linearly because cluster SIZE is the fixed quantity)

    Caches OFF (honest scan path): SPARK_GRAFT_CACHE_TABLES unset.
    """
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    from pyspark.sql import functions as F

    from dataframe_spark.operators import similarity
    from dataframe_spark.operators.graph import pagerank
    from tools.scale_data import EMB_CLUSTER_SIZE

    spark = _spark("certify_vectors")
    _ensure_100x(spark)
    decades = {"10x": DIR_10X, "100x": DIR_100X}
    out = {}
    for tag, d in decades.items():
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        k = max(8, n // EMB_CLUSTER_SIZE)
        row = {"rows": n, "dim": 256, "semdedup_k": k}

        row["semdedup_sec"] = _time_best(
            lambda: similarity.semdedup(
                emb, "vec_id", "embedding", k=k, tau=0.4, max_iter=3
            )
        )
        row["knn_ivf_sec"] = _time_best(
            lambda: similarity.knn_ivf(
                emb, "vec_id", "embedding", query_id=0, k=10,
                nlist=64, nprobe=8, max_iter=3,
            )
        )

        def build_pr():
            a = emb.select(
                F.col("vec_id").alias("a_id"), F.col("label"),
                F.col("embedding").alias("__ea"),
            )
            b = emb.select(
                F.col("vec_id").alias("b_id"), F.col("label"),
                F.col("embedding").alias("__eb"),
            )
            edges = (
                a.join(b, "label")
                .where(F.col("a_id") < F.col("b_id"))
                .where(
                    similarity.cosine(F.col("__ea"), F.col("__eb")) >= 0.4
                )
                .select("a_id", "b_id")
            )
            # cosine_pairs pairs are unique by construction, so the
            # setup distinct is a no-op -- skip it (r12)
            return pagerank(
                edges, "a_id", "b_id", damping=0.85, iters=10,
                symmetrize=True, assume_unique=True,
            )

        row["pagerank_sec"] = _time_best(build_pr, reps=2)
        out[tag] = row
        print(tag, row)
    factors = {
        op: round(out["100x"][f"{op}_sec"] / max(out["10x"][f"{op}_sec"], 1e-9), 2)
        for op in ("semdedup", "knn_ivf", "pagerank")
    }
    print("per-decade factors (10 = linear):", factors)
    _write("CERT_vectors.json", {
        "sweep": "vectors", "decades": out,
        "per_decade_factors": factors,
        "note": "factor 10 = linear in rows; semdedup k scales with "
                "corpus per the paper, IVF nlist fixed (constant probe "
                "fraction), pagerank edges grow linearly (fixed cluster "
                "size)",
    })


def sweep_decades(argv):
    import __spark_entry__ as entry

    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    spark = _spark("certify_decades")
    _ensure_100x(spark)
    qs = entry.queries()
    out = {}
    from dataframe_spark.queries import ml_q

    for tag, d in (("10x", DIR_10X), ("100x", DIR_100X)):
        for name in FLAGSHIPS:
            def build(name=name, d=d):
                if name == "q_synthesis":
                    # the search result is memoized per (app, sf_dir);
                    # certification must time the SEARCH, not the cache
                    ml_q._BEAM_CACHE.clear()
                return qs[name](spark, d)

            t = _time_best(build, reps=2, spark=spark)
            out.setdefault(name, {})[tag] = t
            print(tag, name, t)
    factors = {
        n: round(v["100x"] / max(v["10x"], 1e-9), 2) for n, v in out.items()
    }
    print("per-decade factors (10 = linear):", factors)
    _write("CERT_decades.json", {
        "sweep": "decades", "flagships": out, "per_decade_factors": factors,
    })


def sweep_thousandx(argv):
    """Three-decade scaling evidence (docstring above). The 1000x
    corpus materializes ~18 GB of parquet; the JVM gets a larger
    heap than the 8g default so shuffle-heavy stages at 600 M rows
    spill to disk instead of dying — on a real cluster the aggregate
    executor memory at this scale dwarfs the input.

    PROCESS ISOLATION PER DECADE (r11): without ``--decade``, this
    sweep re-execs itself once per decade in a FRESH process and
    merges the partials. Motivation, measured: a single long-lived
    local JVM accumulates heap/GC/block-manager state across the
    ~60 query executions of the full sweep, and the top decade —
    measured last — paid for it erratically (same plan, same box,
    minutes apart: an untouched scan-agg canary read 68.1 s inside
    the accumulated session vs 24.8-34.7 s in a fresh one; jaccard
    stage walls swung 2-9x). A fresh engine per decade is also the
    honest model of production: each scale runs as its own cluster
    submit.

    Noise regime (r12, VERDICT r11 ask #1): stray-JVM guard before
    anything runs; each decade child measures a FIXED-WORK canary
    (q_stats_agg on the 10x corpus) before and after its flagship
    walls, and the merged artifact carries canary-normalized
    factors (raw_factor / canary_ratio) next to the raw ones; reps
    are best-of-3 at the top decade (best-of-SPARK_GRAFT_CERT_REPS,
    default 2, below), with every rep wall and the max/min spread
    committed. Partials exchange through a private mkdtemp dir
    passed to each child (ADVICE r11 #4 — the old fixed /tmp paths
    let concurrent sweeps clobber each other silently)."""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

    decades = {"10x": DIR_10X, "100x": DIR_100X, "1000x": DIR_1000X}
    opts = dict(
        a.split("=", 1) for a in argv if a.startswith("--") and "=" in a
    )
    if "--decade" not in opts:
        import shutil
        import subprocess
        import tempfile

        _guard_stray_jvm()
        partdir = tempfile.mkdtemp(prefix="cert_thousandx_")
        try:
            for tag in decades:
                rc = subprocess.call(
                    [sys.executable, os.path.abspath(__file__), "thousandx",
                     f"--decade={tag}", f"--partdir={partdir}"],
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))
                    ),
                )
                if rc:
                    print(f"decade {tag} failed (rc {rc})", file=sys.stderr)
                    sys.exit(rc)
            out = {}
            stage_profile = {}
            canary = {}
            for tag in decades:
                with open(f"{partdir}/{tag}.part.json") as f:
                    part = json.load(f)
                for name, w in part["walls"].items():
                    out.setdefault(name, {})[tag] = w
                stage_profile.update(part.get("stage_profile", {}))
                canary[tag] = part["canary"]
        finally:
            shutil.rmtree(partdir, ignore_errors=True)
        # canary ratio between two decade PROCESSES = how much slower
        # the box ran while the bigger decade measured (the canary's
        # work is identical in every process); dividing it out of the
        # raw factor removes box drift, not plan cost
        c_ratio = {
            pair: canary[hi]["mean_sec"] / max(canary[lo]["mean_sec"], 1e-9)
            for pair, lo, hi in (
                ("100x_over_10x", "10x", "100x"),
                ("1000x_over_100x", "100x", "1000x"),
            )
        }
        factors = {}
        for n, v in out.items():
            raw = {
                "100x_over_10x": round(
                    v["100x"]["sec"] / max(v["10x"]["sec"], 1e-9), 2
                ),
                "1000x_over_100x": round(
                    v["1000x"]["sec"] / max(v["100x"]["sec"], 1e-9), 2
                ),
            }
            raw["canary_normalized"] = {
                pair: round(raw[pair] / c_ratio[pair], 2)
                for pair in c_ratio
            }
            factors[n] = raw
        print("per-decade factors (10 = linear):", factors)
        print("canary:", canary, "ratios:", c_ratio)
        _write("CERT_thousandx.json", {
            "sweep": "thousandx", "flagships": out,
            "per_decade_factors": factors,
            "canary": canary,
            "canary_ratio": {k: round(v, 3) for k, v in c_ratio.items()},
            "stage_profile": stage_profile,
            "reps": int(os.environ.get("SPARK_GRAFT_CERT_REPS", "2")),
            "reps_top_decade": 3,
            "process_per_decade": True,
            "note": "factor 10 = linear in rows per decade; "
                    "canary_normalized divides out the fixed-work "
                    "canary's drift between decade processes "
                    "(q_stats_agg on the 10x corpus, measured before "
                    "and after each decade's flagships); every rep "
                    "wall is committed with its max/min spread; "
                    "stage_profile stages are cumulatively warm "
                    "(each reuses upstream persisted frames), so "
                    "they sum to ~one end-to-end run",
        })
        return

    tag = opts["--decade"]
    partdir = opts["--partdir"]
    d = decades[tag]
    reps = int(os.environ.get("SPARK_GRAFT_CERT_REPS", "2"))
    if tag == "1000x":
        reps = max(reps, 3)
    _guard_stray_jvm()
    import __spark_entry__ as entry

    from tools.scale_data import ensure

    spark = _spark(f"certify_thousandx_{tag}")
    _ensure_100x(spark)
    if not ensure(spark, DIR_100X, DIR_1000X):
        print("1000x generation failed", file=sys.stderr)
        sys.exit(1)
    # BPE fits are memoized per sf_dir; certification times the fit
    from dataframe_spark.queries import text_q

    qs = entry.queries()

    def canary_reps():
        return _time_reps(
            lambda: qs["q_stats_agg"](spark, DIR_10X), reps=2, spark=spark
        )

    canary_pre = canary_reps()
    print(tag, "canary_pre", canary_pre, flush=True)
    walls = {}
    for name in TX_FLAGSHIPS:
        def build(name=name, d=d):
            if name == "q_bpe":
                text_q._BPE_CACHE.clear()
            return qs[name](spark, d)

        w = _rep_stats(_time_reps(build, reps=reps, spark=spark))
        walls[name] = w
        print(tag, name, w, flush=True)
    canary_post = canary_reps()
    print(tag, "canary_post", canary_post, flush=True)
    part = {
        "walls": walls,
        "canary": {
            "pre": canary_pre,
            "post": canary_post,
            "mean_sec": round((min(canary_pre) + min(canary_post)) / 2, 3),
        },
    }
    if tag == "1000x":
        print("jaccard stage profile at 1000x:", flush=True)
        part["stage_profile"] = {
            "q_dedup_ngram_jaccard@1000x": _jaccard_stage_profile(
                spark, DIR_1000X
            )
        }
        print("minhash stage profile at 1000x:", flush=True)
        part["stage_profile"]["q_dedup_minhash@1000x"] = (
            _minhash_stage_profile(spark, DIR_1000X)
        )
    with open(f"{partdir}/{tag}.part.json", "w") as f:
        json.dump(part, f)
    print(f"wrote {partdir}/{tag}.part.json")


def sweep_dedup_stages(argv):
    """Focused top-decade dedup evidence (r12): the two 1000x stage
    profiles plus a minhash e2e best-of-2, each section in a FRESH
    process with its own fixed-work canary bracket — cheap to re-run
    after a plan change without paying the full three-decade
    thousandx sweep. Written for the r12 signature-kernel change:
    CERT_thousandx's committed minhash profile describes the
    pre-kernel plan, and its signatures stage carried an unexplained
    278 s reading (vs 57 s in the r11 window) that only a
    quiet-window re-read can adjudicate.

    PROCESS ISOLATION PER SECTION: the first draft ran all three
    sections in one 48g JVM and reproduced the accumulated-session
    pathology the thousandx sweep's per-decade re-exec exists for —
    the jaccard prefix stage read 187 s in section 2 of the shared
    process vs 36.3 s in the committed fresh-process profile, while
    the small fixed-work canary stayed flat (2.5 s): heap/GC/block-
    manager accumulation hits the big stages, not the canary. Same
    fix as thousandx: re-exec per section, merge partials.

    r13: two jaccard e2e sections (100x and 1000x, each its own
    fresh process + canary bracket, best-of-2/3) join the sweep so
    the shingle-kernel change's TOP-DECADE FACTOR is committed with
    spread, not just the stage delta — the merge computes
    1000x/100x raw and canary-normalized. Output moves to
    CERT_dedup_stages_r13.json (the r12 artifact stays as the
    pre-kernel record)."""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    sections = ("minhash_profile", "jaccard_profile", "minhash_e2e",
                "jaccard_e2e_100x", "jaccard_e2e_1000x")
    opts = dict(
        a.split("=", 1) for a in argv if a.startswith("--") and "=" in a
    )
    if "--section" not in opts:
        import subprocess
        import tempfile

        _guard_stray_jvm()
        partdir = tempfile.mkdtemp(prefix="cert_dedup_stages_")
        for tag in sections:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), "dedup_stages",
                 f"--section={tag}", f"--partdir={partdir}"],
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            )
            if rc:
                print(f"section {tag} failed (rc {rc})", file=sys.stderr)
                sys.exit(rc)
        merged = {"sweep": "dedup_stages", "dir": DIR_1000X,
                  "stage_profile": {}, "canary": {}}
        for tag in sections:
            with open(f"{partdir}/{tag}.part.json") as f:
                part = json.load(f)
            merged["stage_profile"].update(part.get("stage_profile", {}))
            for k in ("minhash_e2e_1000x", "jaccard_e2e_100x",
                      "jaccard_e2e_1000x"):
                if k in part:
                    merged[k] = part[k]
            merged["canary"][tag] = part["canary"]
        if ("jaccard_e2e_100x" in merged
                and "jaccard_e2e_1000x" in merged):
            raw = (merged["jaccard_e2e_1000x"]["sec"]
                   / max(merged["jaccard_e2e_100x"]["sec"], 1e-9))
            c_ratio = (merged["canary"]["jaccard_e2e_1000x"]["mean_sec"]
                       / max(merged["canary"]["jaccard_e2e_100x"]
                             ["mean_sec"], 1e-9))
            merged["jaccard_factor_1000x_over_100x"] = {
                "raw": round(raw, 2),
                "canary_normalized": round(raw / c_ratio, 2),
                "canary_ratio": round(c_ratio, 3),
            }
            print("jaccard top-decade factor:",
                  merged["jaccard_factor_1000x_over_100x"])
        merged["note"] = (
            "fresh process per section; stage_profile stages are "
            "cumulatively warm (each reuses upstream persisted "
            "frames), so they sum to ~one end-to-end run"
        )
        _write("CERT_dedup_stages_r13.json", merged)
        return

    tag = opts["--section"]
    partdir = opts["--partdir"]
    _guard_stray_jvm()
    import __spark_entry__ as entry

    from tools.scale_data import ensure

    spark = _spark(f"certify_dedup_{tag}")
    _ensure_100x(spark)
    if not ensure(spark, DIR_100X, DIR_1000X):
        print("1000x generation failed", file=sys.stderr)
        sys.exit(1)
    qs = entry.queries()

    def canary_reps():
        return _time_reps(
            lambda: qs["q_stats_agg"](spark, DIR_10X), reps=2, spark=spark
        )

    canary_pre = canary_reps()
    print(tag, "canary_pre", canary_pre, flush=True)
    part = {}
    if tag == "minhash_profile":
        print("minhash stage profile at 1000x:", flush=True)
        part["stage_profile"] = {
            "q_dedup_minhash@1000x": _minhash_stage_profile(
                spark, DIR_1000X
            )
        }
    elif tag == "jaccard_profile":
        print("jaccard stage profile at 1000x:", flush=True)
        part["stage_profile"] = {
            "q_dedup_ngram_jaccard@1000x": _jaccard_stage_profile(
                spark, DIR_1000X
            )
        }
    elif tag == "jaccard_e2e_100x":
        e2e = _rep_stats(
            _time_reps(
                lambda: qs["q_dedup_ngram_jaccard"](spark, DIR_100X),
                reps=2,
                spark=spark,
            )
        )
        print("jaccard e2e 100x", e2e, flush=True)
        part["jaccard_e2e_100x"] = e2e
    elif tag == "jaccard_e2e_1000x":
        e2e = _rep_stats(
            _time_reps(
                lambda: qs["q_dedup_ngram_jaccard"](spark, DIR_1000X),
                reps=3,
                spark=spark,
            )
        )
        print("jaccard e2e 1000x", e2e, flush=True)
        part["jaccard_e2e_1000x"] = e2e
    else:
        e2e = _rep_stats(
            _time_reps(
                lambda: qs["q_dedup_minhash"](spark, DIR_1000X),
                reps=2,
                spark=spark,
            )
        )
        print("minhash e2e", e2e, flush=True)
        part["minhash_e2e_1000x"] = e2e
    canary_post = canary_reps()
    print(tag, "canary_post", canary_post, flush=True)
    part["canary"] = {
        "pre": canary_pre, "post": canary_post,
        "mean_sec": round((min(canary_pre) + min(canary_post)) / 2, 3),
    }
    with open(f"{partdir}/{tag}.part.json", "w") as f:
        json.dump(part, f)
    print(f"wrote {partdir}/{tag}.part.json")
    spark.stop()


def _jaccard_stage_profile(spark, d, threshold=0.8):
    """Stage decomposition of the hash-order jaccard_pairs plan at
    one sf_dir (VERDICT r10 ask #7 — the r10 session-only
    chain/prefix/candidates/verify split was the round's best
    diagnostic; committing it makes future walls attributable
    without re-deriving). Stages time CUMULATIVELY WARM — each stage
    reuses its predecessors' persisted frames, so the walls are the
    decomposition of one end-to-end run, and their sum approximates
    the query wall (plus scheduling)."""
    import dataframe_spark.operators.dedup as dd
    from dataframe_spark.tables import load_table

    docs = load_table(spark, d, "documents")
    spark.catalog.clearCache()
    prof = {}

    def stage(name, df):
        t0 = time.monotonic()
        _noop(df)
        prof[name] = round(time.monotonic() - t0, 3)
        print(f"  stage {name}: {prof[name]}", flush=True)
        return df

    arrs = stage(
        "chain_persist", dd.hashed_shingle_arrays(docs, "doc_id", "text", 3)
    )
    prefix = stage(
        "prefix",
        dd._hash_order_prefix(arrs, docs, "doc_id", "text", 3, threshold,
                              None),
    )
    cands = stage("candidates", dd._prefix_candidates(prefix, threshold))
    pruned = stage(
        "truncated_bound", dd._truncated_bound_filter(cands, arrs, threshold)
    )
    out = stage("verify", dd._verify_jaccard(pruned, arrs, threshold))
    prof["n_candidates"] = cands.count()
    prof["n_after_truncated_bound"] = pruned.count()
    prof["n_pairs"] = out.count()
    return prof


def _minhash_stage_profile(
    spark, d, n=3, num_perm=64, bands=16, threshold=0.8
):
    """Stage decomposition of minhash_dedup_pairs at one sf_dir
    (VERDICT r11 ask #2 — jaccard's committed profile is why its
    e2e overhang is arguable; minhash's 11.93x/decade had no such
    attribution). Mirrors the operator's internal pipeline with the
    q_dedup_minhash defaults; stages time CUMULATIVELY WARM like
    _jaccard_stage_profile, so their sum approximates one
    end-to-end run (the final member-list expansion is a narrow
    projection of the verify output — sub-second, not staged)."""
    from pyspark.sql import functions as F

    import dataframe_spark.operators.dedup as dd
    from dataframe_spark.tables import load_table

    docs = load_table(spark, d, "documents")
    spark.catalog.clearCache()
    prof = {}

    def stage(name, df):
        t0 = time.monotonic()
        _noop(df)
        prof[name] = round(time.monotonic() - t0, 3)
        print(f"  stage {name}: {prof[name]}", flush=True)
        return df

    arrs_h = stage(
        "chain_persist",
        dd.hashed_shingle_arrays(docs, "doc_id", "text", n),
    )
    gstats = stage(
        "group_collapse",
        dd._reusable(
            arrs_h.select(
                "id", F.xxhash64(F.array_sort("sh_arr")).alias("__g")
            )
            .groupBy("__g")
            .agg(
                F.min("id").alias("id"),
                F.sort_array(F.collect_list("id")).alias("__mids"),
            )
        ),
    )
    sigs = stage(
        "signatures",
        dd._reusable(
            # the operator's shipped default path (r12: the arrow
            # signature kernel) so the profile measures the plan
            # minhash_dedup_pairs actually runs
            dd._minhash_sigs_frame(
                arrs_h.join(gstats.select("id"), "id"), num_perm, "arrow"
            )
        ),
    )
    # persist_bands=True mirrors minhash_dedup_pairs above its
    # 128 MB gate (r13) — every profiled corpus is far above it.
    # The banded materialization is EAGER (it runs at call time,
    # not first action), so the construction is timed explicitly:
    # stage()'s argument-evaluation shape would leave the banding
    # pass outside the timed region and under-count the stage.
    t0 = time.monotonic()
    cands = dd.lsh_candidate_pairs(
        sigs, bands, num_perm // bands, None, persist_bands=True
    )
    _noop(cands)
    prof["band_candidates"] = round(time.monotonic() - t0, 3)
    print(f"  stage band_candidates: {prof['band_candidates']}", flush=True)
    out = stage(
        "verify",
        dd._verify_jaccard(cands, arrs_h, threshold, broadcast_pairs=None),
    )
    prof["n_candidates"] = cands.count()
    prof["n_pairs"] = out.count()
    return prof


def _semdedup_stage_profile(spark, d, tau=0.4, max_iter=3, seed=42):
    """Phase decomposition of semdedup at one sf_dir (r13, VERDICT
    r12 ask #4: 659 s at 1000x is the largest wall in any cert and
    nobody knew whether the k-means fit, the within-cluster pair
    join, or connected components dominates). Mirrors the operator's
    internals with the vectors-sweep knobs (k ∝ corpus ⇒ the
    hierarchical fit path at cert scale); stages time CUMULATIVELY
    WARM like _jaccard_stage_profile, so their sum approximates one
    end-to-end run."""
    from pyspark.sql import functions as F

    from dataframe_spark.operators import similarity as sim
    from dataframe_spark.operators.dedup import _reusable
    from dataframe_spark.operators.graph import connected_components
    from tools.scale_data import EMB_CLUSTER_SIZE

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    k = max(8, n // EMB_CLUSTER_SIZE)
    spark.catalog.clearCache()
    prof = {"rows": n, "k": k}

    def stage(name, df):
        t0 = time.monotonic()
        _noop(df)
        prof[name] = round(time.monotonic() - t0, 3)
        print(f"  stage {name}: {prof[name]}", flush=True)
        return df

    t0 = time.monotonic()
    if k > sim.HIER_KMEANS_MIN_K:
        C1u, Su = sim.kmeans_fit_hierarchical(
            emb, "vec_id", "embedding", k=k, max_iter=max_iter, seed=seed
        )
        assign = sim._assign_hier_udf(C1u, Su)
    else:
        centroids = sim.kmeans_fit(
            emb, "vec_id", "embedding", k=k, max_iter=max_iter, seed=seed
        )
        assign = sim._assign_udf(sim._unit_rows(centroids))
    prof["fit"] = round(time.monotonic() - t0, 3)
    print(f"  stage fit: {prof['fit']}", flush=True)
    sides = stage(
        "assign_persist",
        _reusable(
            emb.where(F.col("embedding").isNotNull())
            .select(F.col("vec_id").alias("id"),
                    sim._dvec("embedding").alias("__v"))
            .withColumn("__cid", assign(F.col("__v")))
            .withColumn("__nrm", sim.norm(F.col("__v")))
        ),
    )
    # mirror the operator's r13 edge-engine gate (the GEMM kernel at
    # cert scale, the expression join below the knee)
    from dataframe_spark.plans.stats import plan_size_bytes

    if plan_size_bytes(emb) > sim._SEMDEDUP_GEMM_KNEE:
        prof["edge_engine"] = "gemm"
        edges = stage(
            "pair_join_persist",
            _reusable(
                sim.bucketed_cosine_pairs(
                    sides, "id", "__v", "__cid",
                    threshold=tau, round_to=None,
                ).select("a_id", "b_id")
            ),
        )
    else:
        prof["edge_engine"] = "jvm"
        a = sides.select(F.col("id").alias("a_id"), "__cid",
                         F.col("__v").alias("__va"),
                         F.col("__nrm").alias("__na"))
        b = sides.select(F.col("id").alias("b_id"), "__cid",
                         F.col("__v").alias("__vb"),
                         F.col("__nrm").alias("__nb"))
        s = sim.dot(F.col("__va"), F.col("__vb")) / F.nullif(
            F.col("__na") * F.col("__nb"), F.lit(0.0)
        )
        edges = stage(
            "pair_join_persist",
            _reusable(
                a.join(b, "__cid")
                .where(F.col("a_id") < F.col("b_id"))
                .where(s >= tau)
                .select("a_id", "b_id")
            ),
        )
    comp = stage("connected_components",
                 connected_components(edges, "a_id", "b_id"))
    stage(
        "final_join",
        sides.join(comp, sides["id"] == comp["node"], "left").select(
            F.col("id"), F.col("__cid").alias("cluster"),
            (F.coalesce(F.col("component"), F.col("id"))
             == F.col("id")).alias("keep"),
        ),
    )
    prof["n_edges"] = edges.count()
    return prof


def sweep_vectors_stages(argv):
    """Focused vectors-stack evidence for r13 (VERDICT r12 asks #4
    and #5), one FRESH PROCESS per section with fixed-work canary
    brackets (the dedup_stages regime):

    - semdedup_profile: the first per-phase split of semdedup at the
      top decade (fit / assign / within-cluster pair join / CC /
      final), so the next optimization target is measured, not
      guessed.
    - decade_10x + decade_100x: re-run of the full vectors decade
      measurement (same code path as sweep_vectors1000x) in a quiet
      window — the committed CERT_vectors_1000x 100x decade started
      inside a steal burst (canary pre [38.8, 11.0] s vs post
      [2.2, 4.8] s), inflating knn_ivf/edge_build's normalized
      factors to 22.18/16.26 against raw 6.48/4.75. The merge
      recomputes 100x/10x factors and FLAGS the run as burst-suspect
      if any section's canary pre/post spread exceeds 2x.
    -> CERT_vectors_stages_r13.json"""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    sections = ("semdedup_profile", "decade_10x", "decade_100x")
    opts = dict(
        a.split("=", 1) for a in argv if a.startswith("--") and "=" in a
    )
    if "--section" not in opts:
        import subprocess
        import tempfile

        _guard_stray_jvm()
        partdir = tempfile.mkdtemp(prefix="cert_vectors_stages_")
        for tag in sections:
            if tag.startswith("decade_"):
                # reuse sweep_vectors1000x's per-decade measurement
                # verbatim so the refreshed walls are comparable
                args = [sys.executable, os.path.abspath(__file__),
                        "vectors1000x", f"--decade={tag[7:]}",
                        f"--partdir={partdir}"]
            else:
                args = [sys.executable, os.path.abspath(__file__),
                        "vectors_stages", f"--section={tag}",
                        f"--partdir={partdir}"]
            rc = subprocess.call(args, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
            if rc:
                print(f"section {tag} failed (rc {rc})", file=sys.stderr)
                sys.exit(rc)
        merged = {"sweep": "vectors_stages", "canary": {}}
        with open(f"{partdir}/semdedup_profile.part.json") as f:
            part = json.load(f)
        merged["stage_profile"] = part["stage_profile"]
        merged["canary"]["semdedup_profile"] = part["canary"]
        rows = {}
        for tag in ("10x", "100x"):
            with open(f"{partdir}/{tag}.part.json") as f:
                part = json.load(f)
            rows[tag] = part["row"]
            merged["canary"][f"decade_{tag}"] = part["canary"]
        merged["decades"] = rows
        c = merged["canary"]
        # compare the QUIET FLOOR before vs after each section (min
        # of each bracket): the first pre rep in a fresh process
        # pays one-off JVM/codegen warmup (9-20 s vs the ~2 s steady
        # canary in every r12/r13 artifact), so a max-over-all-reps
        # spread would flag warmup as a burst
        spreads = {
            s: round(max(min(v["pre"]), min(v["post"]))
                     / max(min(min(v["pre"]), min(v["post"])), 1e-9), 2)
            for s, v in c.items()
        }
        merged["canary_spread"] = spreads
        merged["burst_suspect"] = any(v > 2.0 for v in spreads.values())
        c_ratio = (c["decade_100x"]["mean_sec"]
                   / max(c["decade_10x"]["mean_sec"], 1e-9))
        factors = {}
        for op in ("semdedup", "knn_ivf", "edge_build", "pagerank"):
            raw = round(rows["100x"][op]["sec"]
                        / max(rows["10x"][op]["sec"], 1e-9), 2)
            factors[op] = {
                "100x_over_10x_raw": raw,
                "100x_over_10x_canary_normalized": round(
                    raw / c_ratio, 2),
            }
        merged["per_decade_factors_100x"] = factors
        merged["canary_ratio_100x_over_10x"] = round(c_ratio, 3)
        print("factors:", factors)
        print("canary spreads:", spreads,
              "burst_suspect:", merged["burst_suspect"])
        _write("CERT_vectors_stages_r13.json", merged)
        return

    tag = opts["--section"]
    partdir = opts["--partdir"]
    _guard_stray_jvm()
    import __spark_entry__ as entry

    from tools.scale_data import ensure

    spark = _spark(f"certify_vstages_{tag}")
    _ensure_100x(spark)
    if not ensure(spark, DIR_100X, DIR_1000X):
        print("1000x generation failed", file=sys.stderr)
        sys.exit(1)
    qs = entry.queries()

    def canary_reps():
        return _time_reps(
            lambda: qs["q_stats_agg"](spark, DIR_10X), reps=2, spark=spark
        )

    canary_pre = canary_reps()
    print(tag, "canary_pre", canary_pre, flush=True)
    part = {}
    print("semdedup stage profile at 1000x:", flush=True)
    part["stage_profile"] = {
        "semdedup@1000x": _semdedup_stage_profile(spark, DIR_1000X)
    }
    canary_post = canary_reps()
    print(tag, "canary_post", canary_post, flush=True)
    part["canary"] = {
        "pre": canary_pre, "post": canary_post,
        "mean_sec": round((min(canary_pre) + min(canary_post)) / 2, 3),
    }
    with open(f"{partdir}/{tag}.part.json", "w") as f:
        json.dump(part, f)
    print(f"wrote {partdir}/{tag}.part.json")
    spark.stop()


def sweep_vectors1000x(argv):
    """THREE-decade similarity/graph evidence (VERDICT r9 ask #5):
    semdedup / knn_ivf / pagerank at 10x, 100x AND 1000x (2 M x 256
    vectors at the top), knobs scaled exactly like sweep_vectors
    (semdedup k ∝ corpus, IVF nlist fixed, cluster size fixed so
    edges grow linearly). Differences from the 2-decade sweep:

    - pagerank is PHASE-SPLIT: the cosine edge build (the r10
      bucketed-GEMM operator over the planted label buckets,
      materialized to parquet) is timed separately from the 10
      power iterations over the materialized edge set, so a factor
      >10 is attributable to a phase instead of a blended wall.

    r12 (VERDICT r11 asks #1/#3/#7): the sweep joins the thousandx
    noise regime — stray-JVM guard, one fresh PROCESS per decade
    with a fixed-work canary (q_stats_agg on the 10x corpus) and
    canary-normalized factors, best-of-2 at EVERY decade (the r11
    single-rep 1000x pagerank wall was the repo's weakest committed
    number) with all rep walls committed, pagerank setup +
    per-iteration walls recorded per rep (graph.pagerank profile
    hook), and a MEGABUCKET stanza at the top decade: 100k rows
    forced into ONE bucket (~3x max_bucket_rows) so the
    bucketed-GEMM sub-block split path runs at certification scale
    instead of only in its toy-sized unit test.
    -> CERT_vectors_1000x.json
    """
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

    decades = {"10x": DIR_10X, "100x": DIR_100X, "1000x": DIR_1000X}
    opts = dict(
        a.split("=", 1) for a in argv if a.startswith("--") and "=" in a
    )
    if "--decade" not in opts:
        import shutil
        import subprocess
        import tempfile

        _guard_stray_jvm()
        partdir = tempfile.mkdtemp(prefix="cert_vectors1000x_")
        try:
            for tag in decades:
                rc = subprocess.call(
                    [sys.executable, os.path.abspath(__file__),
                     "vectors1000x", f"--decade={tag}",
                     f"--partdir={partdir}"],
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))
                    ),
                )
                if rc:
                    print(f"decade {tag} failed (rc {rc})", file=sys.stderr)
                    sys.exit(rc)
            out, canary, megabucket = {}, {}, None
            for tag in decades:
                with open(f"{partdir}/{tag}.part.json") as f:
                    part = json.load(f)
                out[tag] = part["row"]
                canary[tag] = part["canary"]
                megabucket = part.get("megabucket", megabucket)
        finally:
            shutil.rmtree(partdir, ignore_errors=True)
        c_ratio = {
            pair: canary[hi]["mean_sec"] / max(canary[lo]["mean_sec"], 1e-9)
            for pair, lo, hi in (
                ("100x_over_10x", "10x", "100x"),
                ("1000x_over_100x", "100x", "1000x"),
            )
        }
        factors = {}
        for op in ("semdedup", "knn_ivf", "edge_build", "pagerank"):
            raw = {
                "100x_over_10x": round(
                    out["100x"][op]["sec"] / max(out["10x"][op]["sec"], 1e-9),
                    2,
                ),
                "1000x_over_100x": round(
                    out["1000x"][op]["sec"]
                    / max(out["100x"][op]["sec"], 1e-9),
                    2,
                ),
            }
            raw["canary_normalized"] = {
                pair: round(raw[pair] / c_ratio[pair], 2)
                for pair in c_ratio
            }
            factors[op] = raw
        print("per-decade factors (10 = linear):", factors)
        print("canary:", canary, "ratios:", c_ratio)
        _write("CERT_vectors_1000x.json", {
            "sweep": "vectors1000x", "decades": out,
            "per_decade_factors": factors,
            "canary": canary,
            "canary_ratio": {k: round(v, 3) for k, v in c_ratio.items()},
            "megabucket": megabucket,
            "process_per_decade": True,
            "note": "factor 10 = linear in rows; canary_normalized "
                    "divides out the fixed-work canary's drift "
                    "between decade processes; pagerank phase-split: "
                    "edge_build = bucketed GEMM cosine pairs to "
                    "parquet, pagerank = 10 power iterations over "
                    "the materialized edges (edge count grows "
                    "linearly, fixed cluster size) with setup + "
                    "per-iteration walls per rep; megabucket = the "
                    "oversized-bucket sub-block split path exercised "
                    "at 100k rows in one bucket",
        })
        return

    tag = opts["--decade"]
    partdir = opts["--partdir"]
    d = decades[tag]
    reps = 2
    _guard_stray_jvm()
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dataframe_spark.operators import similarity
    from dataframe_spark.operators.graph import pagerank
    from tools.scale_data import EMB_CLUSTER_SIZE, ensure

    spark = _spark(f"certify_vectors1000x_{tag}")
    _ensure_10x(spark)
    if tag != "10x":
        _ensure_100x(spark)
    if tag == "1000x" and not ensure(spark, DIR_100X, DIR_1000X):
        print("1000x generation failed", file=sys.stderr)
        sys.exit(1)
    qs = entry.queries()

    def canary_reps():
        return _time_reps(
            lambda: qs["q_stats_agg"](spark, DIR_10X), reps=2, spark=spark
        )

    canary_pre = canary_reps()
    print(tag, "canary_pre", canary_pre, flush=True)

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    k = max(8, n // EMB_CLUSTER_SIZE)
    row = {"rows": n, "dim": 256, "semdedup_k": k}

    row["semdedup"] = _rep_stats(_time_reps(
        lambda: similarity.semdedup(
            emb, "vec_id", "embedding", k=k, tau=0.4, max_iter=3
        ),
        reps=reps, spark=spark,
    ))
    print(tag, "semdedup", row["semdedup"], flush=True)
    row["knn_ivf"] = _rep_stats(_time_reps(
        lambda: similarity.knn_ivf(
            emb, "vec_id", "embedding", query_id=0, k=10,
            nlist=64, nprobe=8, max_iter=3,
        ),
        reps=reps, spark=spark,
    ))
    print(tag, "knn_ivf", row["knn_ivf"], flush=True)

    edges_path = f"/tmp/spark_graft_vec_edges_{tag}"
    eb_walls = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        similarity.bucketed_cosine_pairs(
            emb, "vec_id", "embedding", "label", threshold=0.4
        ).select("a_id", "b_id").write.mode("overwrite").parquet(edges_path)
        eb_walls.append(round(time.monotonic() - t0, 3))
    row["edge_build"] = _rep_stats(eb_walls)
    edges = spark.read.parquet(edges_path)
    row["n_edges"] = edges.count()
    print(tag, "edge_build", row["edge_build"], "edges", row["n_edges"],
          flush=True)

    pr_walls, pr_profiles = [], []
    for _ in range(reps):
        spark.catalog.clearCache()
        prof = {}
        t0 = time.monotonic()
        # the materialized bucketed-GEMM pairs hold each unordered
        # pair exactly once (tile construction), so the setup
        # distinct collapses nothing -- skip its 8+ GB exchange (r12)
        _noop(pagerank(
            edges, "a_id", "b_id", damping=0.85, iters=10,
            symmetrize=True, assume_unique=True, profile=prof,
        ))
        pr_walls.append(round(time.monotonic() - t0, 3))
        pr_profiles.append(prof)
    row["pagerank"] = _rep_stats(pr_walls)
    row["pagerank"]["profiles"] = pr_profiles
    print(tag, "pagerank", row["pagerank"], flush=True)

    part = {"row": row}
    if tag == "1000x":
        # MEGABUCKET: ~100k of the 2 M vectors forced into one
        # bucket — ceil(100k/32768) = 4 sub-blocks, 10 tile tasks;
        # per-task peak is two 32k x 256 sub-blocks + one
        # 2048 x 32768 sims tile regardless of the bucket size
        mb_rows = 100_000
        degenerate = emb.where(F.col("vec_id") < mb_rows).select(
            "vec_id", "embedding", F.lit(0).alias("label")
        )
        spark.catalog.clearCache()
        t0 = time.monotonic()
        mb_pairs = similarity.bucketed_cosine_pairs(
            degenerate, "vec_id", "embedding", "label", threshold=0.4
        ).count()
        mb_wall = round(time.monotonic() - t0, 3)
        n_deg = degenerate.count()
        import math as _math

        s = _math.ceil(n_deg / 32768)
        part["megabucket"] = {
            "bucket_rows": n_deg, "max_bucket_rows": 32768,
            "split_sub_blocks": s, "n_tiles": s * (s + 1) // 2,
            "wall_sec": mb_wall, "n_pairs": mb_pairs,
            "note": "split path exercised at cert scale (VERDICT "
                    "r11 ask #7); task peak = 2 sub-blocks + 1 "
                    "sims tile (rows pre-normalized in place, r12)",
        }
        print(tag, "megabucket", part["megabucket"], flush=True)

    canary_post = canary_reps()
    print(tag, "canary_post", canary_post, flush=True)
    part["canary"] = {
        "pre": canary_pre, "post": canary_post,
        "mean_sec": round((min(canary_pre) + min(canary_post)) / 2, 3),
    }
    with open(f"{partdir}/{tag}.part.json", "w") as f:
        json.dump(part, f)
    print(f"wrote {partdir}/{tag}.part.json")


def sweep_barrier_ab(argv):
    """Commit the r11 sibling-stage cache-racing diagnosis as an
    artifact (VERDICT r11 ask #6): the _materialize barriers in the
    dedup big path exist because two sibling stages racing one COLD
    persisted frame measured 2.5-2.8x wall inflation — but that
    number lived only in the survey prose. This sweep times the
    jaccard flagship end-to-end at 1000x with barriers ON vs OFF
    (SPARK_GRAFT_NO_CACHE_BARRIER, read at plan-build time),
    INTERLEAVED A-B-B-A in one session so both modes sample the
    same box state, identical plan and data, storage cache cleared
    per rep. -> CERT_barrier_ab.json"""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    _guard_stray_jvm()
    import __spark_entry__ as entry

    from tools.scale_data import ensure

    spark = _spark("certify_barrier_ab")
    _ensure_100x(spark)
    if not ensure(spark, DIR_100X, DIR_1000X):
        print("1000x generation failed", file=sys.stderr)
        sys.exit(1)
    qs = entry.queries()
    walls = {"on": [], "off": []}
    for mode in ("on", "off", "off", "on"):
        os.environ["SPARK_GRAFT_NO_CACHE_BARRIER"] = (
            "0" if mode == "on" else "1"
        )
        spark.catalog.clearCache()
        t0 = time.monotonic()
        _noop(qs["q_dedup_ngram_jaccard"](spark, DIR_1000X))
        w = round(time.monotonic() - t0, 3)
        walls[mode].append(w)
        print(f"barrier {mode}: {w}", flush=True)
    os.environ.pop("SPARK_GRAFT_NO_CACHE_BARRIER", None)
    stats = {m: _rep_stats(w) for m, w in walls.items()}
    _write("CERT_barrier_ab.json", {
        "sweep": "barrier_ab", "query": "q_dedup_ngram_jaccard",
        "decade": "1000x", "order": ["on", "off", "off", "on"],
        "walls": stats,
        "on_over_off_best": round(
            stats["on"]["sec"] / max(stats["off"]["sec"], 1e-9), 3
        ),
        "note": "identical plan/data; barriers are one cache-fill "
                "count per shared persisted frame before its "
                "two-sided consumer (dedup._materialize), a pure "
                "scheduling optimization — on <= off within the "
                "committed spread confirms the r11 diagnosis; "
                "ABBA interleave samples both modes across the "
                "session's drift",
    })


def main():
    sweeps = {
        "parity": sweep_parity,
        "arrow_parity": sweep_arrow_parity,
        "tenx": sweep_tenx,
        "vectors": sweep_vectors,
        "vectors1000x": sweep_vectors1000x,
        "decades": sweep_decades,
        "thousandx": sweep_thousandx,
        "dedup_stages": sweep_dedup_stages,
        "vectors_stages": sweep_vectors_stages,
        "barrier_ab": sweep_barrier_ab,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in sweeps:
        print(__doc__)
        sys.exit(2)
    # every sweep measures walls; none is valid next to a resident
    # JVM (the r11 wedged-JVM hazard) — children re-check too, which
    # catches a sibling decade's JVM that failed to exit
    _guard_stray_jvm()
    sweeps[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
