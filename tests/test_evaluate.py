"""Pairwise evaluation metrics: counts, canonicalization, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.evaluate import (
    pairwise_metrics,
    pairwise_metrics_sql,
)

SCHEMA = "id_l long, id_r long"


def test_counts_and_scores(spark):
    # truth: {1-2, 2-3, 4-5}; pred: {2-1 (reversed dup of 1-2), 2-3, 6-7}
    truth = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], SCHEMA)
    pred = spark.createDataFrame([(2, 1), (1, 2), (2, 3), (6, 7)], SCHEMA)
    r = pairwise_metrics(pred, truth).collect()[0]
    assert (r.n_pred, r.n_truth, r.tp, r.fp, r.fn) == (3, 3, 2, 1, 1)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(2 / 3, abs=1e-6)
    assert r.f1 == pytest.approx(2 / 3, abs=1e-6)


def test_perfect_and_selfloop(spark):
    truth = spark.createDataFrame([(1, 2), (3, 3), (4, 5)], SCHEMA)
    pred = spark.createDataFrame([(2, 1), (5, 4), (3, 3)], SCHEMA)
    r = pairwise_metrics(pred, truth).collect()[0]
    # self-loops dropped on both sides; remaining sets identical
    assert (r.n_pred, r.n_truth, r.tp) == (2, 2, 2)
    assert r.f1 == 1.0


def test_duckdb_parity(spark, tmp_path):
    import random

    rng = random.Random(11)
    truth = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(120)]
    pred = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(120)]
    tdf = spark.createDataFrame(truth, SCHEMA)
    pdf = spark.createDataFrame(pred, SCHEMA)
    tp, pp = str(tmp_path / "t.parquet"), str(tmp_path / "p.parquet")
    tdf.write.mode("overwrite").parquet(tp)
    pdf.write.mode("overwrite").parquet(pp)
    spark_row = tuple(pairwise_metrics(pdf, tdf).collect()[0])
    sql = pairwise_metrics_sql(
        f"SELECT * FROM read_parquet('{pp}/*.parquet')",
        f"SELECT * FROM read_parquet('{tp}/*.parquet')",
    )
    duck_row = duckdb.connect().execute(sql).fetchall()[0]
    assert spark_row == duck_row
