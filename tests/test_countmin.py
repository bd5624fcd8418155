"""Count-Min sketch: one-sided error guarantee, exactness at wide w,
collision behavior at narrow w, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.sketch import (
    countmin_estimates,
    countmin_estimates_sql,
)


def _values():
    # zipf-ish: value i appears 200//(i+1) times
    out = []
    for i in range(60):
        out += [f"v{i:02d}"] * (200 // (i + 1))
    return out


def _run(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return {r.value: (r.n_exact, r.n_cms, r.overestimate) for r in
            countmin_estimates(df, "x", **kw).collect()}


def test_cms_never_underestimates(spark):
    got = _run(spark, _values(), d=3, w=16, top=30)  # heavy collisions
    assert len(got) == 30
    for v, (exact, est, over) in got.items():
        assert est >= exact
        assert over == est - exact
    # at w=16 with 60 distinct values there must be real collisions
    assert any(over > 0 for (_, _, over) in got.values())


def test_cms_exact_when_wide(spark):
    # w >> n_distinct and d=6: collisions across all 6 rows are
    # overwhelmingly unlikely -> min over rows recovers exact counts
    got = _run(spark, _values(), d=6, w=4096, top=20)
    for v, (exact, est, over) in got.items():
        assert over == 0


def test_cms_top_n_selection_and_ties(spark):
    values = ["a"] * 5 + ["b"] * 5 + ["c"] * 3
    got = _run(spark, values, d=2, w=64, top=2)
    # tie on count 5 -> value ASC tiebreak keeps a and b
    assert set(got) == {"a", "b"}


def test_cms_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "x string"
    )
    got = {r.value: r.n_exact for r in
           countmin_estimates(df, "x", d=2, w=8, top=5).collect()}
    assert got == {"a": 2}


def test_cms_oracle_parity(spark, tmp_path):
    df = spark.createDataFrame([(v,) for v in _values()], "x string")
    pq = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r) for r in countmin_estimates(df, "x", d=4, w=32, top=25).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(
        tuple(r)
        for r in con.execute(
            countmin_estimates_sql("t", "x", d=4, w=32, top=25)
        ).fetchall()
    )
    assert got == want


def test_cms_validates_params(spark):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError):
        countmin_estimates(df, "x", d=0)
    with pytest.raises(ValueError):
        countmin_estimates(df, "x", w=1)
