"""DSIR importance-resampling selection tests."""

from pyspark.sql import functions as F

from dataframe_spark.operators import dsir


def _corpus(spark):
    rows = []
    # vocab-A docs (target-like) and vocab-B docs (background)
    for i in range(20):
        rows.append((i, f"alpha beta gamma delta epsilon{i % 3} alpha beta"))
    for i in range(20, 40):
        rows.append((i, f"zeta eta theta iota kappa{i % 3} zeta eta"))
    rows.append((99, ""))  # empty doc: score 0, no crash
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_scores_separate_populations(spark):
    raw = _corpus(spark)
    target = raw.where(F.col("doc_id") < 5)  # pure vocab-A sample
    ratios = dsir.dsir_log_ratios(raw, target, "text", buckets=512)
    scores = {
        r["id"]: r["score"]
        for r in dsir.dsir_scores(raw, "doc_id", "text", ratios, 512).collect()
    }
    a = [scores[i] for i in range(20)]
    b = [scores[i] for i in range(20, 40)]
    assert min(a) > max(b)  # every target-like doc outranks every other
    assert scores[99] == 0.0


def test_dsir_select_deterministic_and_weighted(spark):
    raw = _corpus(spark)
    target = raw.where(F.col("doc_id") < 5)
    sel1 = dsir.dsir_select(raw, target, "doc_id", "text", k=10, buckets=512)
    sel2 = dsir.dsir_select(raw, target, "doc_id", "text", k=10, buckets=512)
    ids1 = [r["id"] for r in sel1.collect()]
    ids2 = [r["id"] for r in sel2.collect()]
    assert ids1 == ids2 and len(ids1) == 10
    # importance weights dominate the Gumbel noise on this margin:
    # the selection is mostly vocab-A docs
    assert sum(1 for i in ids1 if i < 20) >= 8


def test_dsir_low_temperature_is_argmax(spark):
    raw = _corpus(spark)
    target = raw.where(F.col("doc_id") < 5)
    ratios = dsir.dsir_log_ratios(raw, target, "text", buckets=512)
    scores = dsir.dsir_scores(raw, "doc_id", "text", ratios, 512)
    top_scores = sorted(
        round(r["score"], 4)
        for r in scores.orderBy(F.desc("score"), F.asc("id")).limit(10).collect()
    )
    sel = dsir.dsir_select(
        raw, target, "doc_id", "text", k=10, buckets=512, temperature=1e-6
    )
    # ids can differ inside tied-score groups (near-zero temperature
    # leaves the Gumbel noise as the tiebreak), but the selected
    # SCORE multiset must be exactly the top-k score multiset
    assert sorted(r["score"] for r in sel.collect()) == top_scores
