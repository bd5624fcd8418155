"""PSI drift: zero on identical snapshots, direction/magnitude on a
planted shift, null bucketing, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.drift import (
    psi_report,
    psi_report_sql,
    psi_total,
)


def _df(spark, spec):
    rows = []
    i = 0
    for v, n in spec.items():
        for _ in range(n):
            rows.append((i, v))
            i += 1
    return spark.createDataFrame(rows, "id long, c string")


def test_identical_snapshots_zero_psi(spark):
    df = _df(spark, {"a": 50, "b": 30, "c": 20})
    tot = psi_total(df, df, "c").collect()[0]
    assert tot.psi == 0.0
    assert tot.n_values == 3


def test_planted_shift_is_positive_and_ranked(spark):
    base = _df(spark, {"a": 50, "b": 30, "c": 20})
    cur = _df(spark, {"a": 20, "b": 30, "c": 50})  # a and c swap mass
    rep = {r.value: r.contrib_micro for r in psi_report(base, cur, "c").collect()}
    assert rep["a"] > 0 and rep["c"] > 0  # PSI terms are non-negative-ish
    assert rep["b"] < rep["a"] and rep["b"] < rep["c"]
    psi = psi_total(base, cur, "c").collect()[0].psi
    assert psi > 0.25  # a 30-point swap is a "major shift"


def test_vanished_value_smoothed_not_infinite(spark):
    base = _df(spark, {"a": 50, "b": 50})
    cur = _df(spark, {"a": 100})
    rep = {r.value: (r.n_base, r.n_cur, r.contrib_micro) for r in
           psi_report(base, cur, "c").collect()}
    assert rep["b"][1] == 0
    assert rep["b"][2] > 0  # finite, positive contribution


def test_nulls_bucketed(spark):
    base = spark.createDataFrame([(1, None), (2, "x")], "id long, c string")
    cur = spark.createDataFrame([(1, "x"), (2, "x")], "id long, c string")
    rep = {r.value for r in psi_report(base, cur, "c").collect()}
    assert "__null__" in rep


def test_oracle_parity(spark, tmp_path):
    base = _df(spark, {"a": 40, "b": 25, "c": 15, "d": 5})
    cur = _df(spark, {"a": 10, "b": 25, "c": 40, "e": 7})
    base.write.mode("overwrite").parquet(str(tmp_path / "base.parquet"))
    cur.write.mode("overwrite").parquet(str(tmp_path / "cur.parquet"))
    got = sorted(tuple(r) for r in psi_report(base, cur, "c").collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW b AS SELECT * FROM read_parquet('{tmp_path}/base.parquet/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW c AS SELECT * FROM read_parquet('{tmp_path}/cur.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            psi_report_sql("SELECT * FROM b", "SELECT * FROM c", "c")
        ).fetchall()
    )
    assert got == want
