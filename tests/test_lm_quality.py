"""Char-bigram LM quality: fluent text outranks noise, integer NLL
arithmetic, tertile sizes, cross-engine parity, and plan hygiene."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.lm_quality import (
    lm_nll,
    lm_quality_buckets,
    lm_quality_buckets_sql,
)


def _corpus(spark, n_fluent=30, n_noise=6):
    rows = []
    for i in range(n_fluent):
        rows.append(
            (i, "the quick brown fox jumps over the lazy dog again and again")
        )
    for i in range(n_noise):
        # transition-breaking noise: rare bigrams under the corpus model
        rows.append((1000 + i, f"zq{i}xj qzxw jqzv wxqz kqjz vqxz{i} zzqq"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_noise_scores_worse_than_fluent(spark):
    df = _corpus(spark)
    per = {r.doc_id: r.nll_micro_avg for r in lm_nll(df).collect()}
    worst_fluent = max(v for k, v in per.items() if k < 1000)
    best_noise = min(v for k, v in per.items() if k >= 1000)
    assert best_noise > worst_fluent
    assert all(isinstance(v, int) and v >= 0 for v in per.values())


def test_bucket_sizes_are_ntile(spark):
    df = _corpus(spark, n_fluent=8, n_noise=4)  # 12 docs -> 4/4/4
    out = lm_quality_buckets(df).groupBy("bucket").count().collect()
    sizes = {r.bucket: r["count"] for r in out}
    assert sizes == {"head": 4, "middle": 4, "tail": 4}


def test_noise_lands_in_tail(spark):
    df = _corpus(spark, n_fluent=12, n_noise=6)  # tail third == the noise
    out = {r.doc_id: r.bucket for r in lm_quality_buckets(df).collect()}
    assert all(out[k] == "tail" for k in out if k >= 1000)
    assert all(out[k] != "tail" for k in out if k < 1000)


def test_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "abcd efgh"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id for r in lm_nll(df).collect()}
    assert got == {1}  # <2 normalized chars -> no bigrams -> no row


def test_oracle_parity(spark, tmp_path):
    df = _corpus(spark, n_fluent=10, n_noise=5)
    pq = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(tuple(r) for r in lm_quality_buckets(df).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(lm_quality_buckets_sql("documents")).fetchall()
    )
    assert got == want


def test_plan_no_global_data_sort(spark):
    df = _corpus(spark)
    plan = (
        lm_quality_buckets(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the model join is broadcast; the only single-partition window is the
    # O(P) offsets frame from with_global_rank (one row per partition)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
