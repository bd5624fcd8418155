"""Plan-shape guards for the tenth-session operators: column pruning
reaches the scan, the DSIR weight join broadcasts, and the NYSIIS stage
chain stays un-inlined (no optimizer blowup). Uses sf0.001 parquet."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quota_cap_scan_prunes_to_referenced_columns(spark):
    from bigmatch_utilities_spark.operators.corpus_ops import quota_cap

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    plan = _plan(
        quota_cap(d, "doc_id", "source", 5, quality_col="n_chars", salt=4)
    )
    # ReadSchema must not include the wide text column
    assert "text" not in plan
    assert "ReadSchema" in plan and "doc_id" in plan


def test_dsir_weight_join_broadcasts(spark):
    from bigmatch_utilities_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_scores,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    target = d.limit(20)
    w = dsir_bucket_weights(target, d, buckets=64)
    plan = _plan(dsir_scores(d, w, buckets=64))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_nysiis_plan_stays_bounded_under_filter(spark):
    """A filter on the derived key must NOT inline the stage chain —
    optimized-plan text stays small and optimization itself is fast
    (regression guard for the documented pushdown blowup)."""
    import time

    from pyspark.sql import functions as F

    from bigmatch_utilities_spark.functions.nysiis import with_nysiis

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.split(F.trim("text"), "\\s+").getItem(0).alias("tok1")
    )
    out = with_nysiis(d, "tok1", out_col="k").filter(F.trim(F.col("k")) != "")
    t0 = time.time()
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    took = time.time() - t0
    assert took < 30, f"optimization took {took:.1f}s — inlining blowup?"
    assert len(plan) < 100_000, f"optimized plan {len(plan)} chars"
    assert "Generate explode" in plan or "explode" in plan
