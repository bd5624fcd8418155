"""Deterministic HLL: cross-engine register/estimate identity and accuracy
within the standard error envelope."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.sketch import hll_distinct, hll_distinct_sql


def _parity(spark, values, p, tmp_path, name):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    pq = str(tmp_path / f"{name}.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = [tuple(r) for r in hll_distinct(df, "v", p=p).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW tbl AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = [
        tuple(r)
        for r in con.execute(hll_distinct_sql("tbl", "v", "v", p=p)).fetchall()
    ]
    assert got == want  # registers, integer sum, and single division identical
    return got[0]


def test_hll_parity_and_accuracy(spark, tmp_path):
    # 5000 distinct values, each seen twice -> est within ~3 standard
    # errors (1.04/sqrt(m) = 4.6% at p=9) of 5000
    values = [f"value-{i}" for i in range(5000)] * 2
    row = _parity(spark, values, 9, tmp_path, "a")
    col, m, zeros, est = row
    assert m == 512
    assert abs(est - 5000) / 5000 < 3 * 1.04 / (512 ** 0.5)


def test_hll_nulls_and_duplicates_ignored(spark, tmp_path):
    values = ["x"] * 100 + ["y"] * 50 + [None] * 30
    row = _parity(spark, [v for v in values], 6, tmp_path, "b")
    # 2 distinct: raw estimator (no small-range correction) is biased high
    # at tiny cardinalities — just pin that it is small and zeros ≈ m
    col, m, zeros, est = row
    assert m == 64 and zeros >= 62
    assert est < 50  # nowhere near the 150 non-distinct row count


def test_hll_p_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        hll_distinct(df, "v", p=3)
    with pytest.raises(ValueError):
        hll_distinct_sql("t", "v", "v", p=20)
