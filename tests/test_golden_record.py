"""Golden-record survivorship: majority vote, deterministic tiebreak,
blank/null handling, DuckDB oracle parity."""

from __future__ import annotations

import duckdb

from bigmatch_utilities_spark.operators.golden_record import (
    golden_record,
    golden_record_sql,
)

# (cluster, name, city): cluster c1 → "ann" wins 2:1, city tie between
# "austin"/"boston" (1 each) → smallest ("austin") wins; blanks and NULLs
# never vote; a NULL cluster row is excluded entirely
ROWS = [
    ("c1", "ann", "austin"),
    ("c1", "ann", "boston"),
    ("c1", "anne", None),
    ("c2", "", "chicago"),
    ("c2", "bob", "  "),
    (None, "zed", "zurich"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["cluster", "name", "city"])


def test_vote_tiebreak_and_blanks(spark):
    out = {
        r["cluster_id"]: (r["name"], r["city"])
        for r in golden_record(_df(spark), "cluster", ["name", "city"]).collect()
    }
    assert out == {
        "c1": ("ann", "austin"),  # majority name; tie city → smallest
        "c2": ("bob", "chicago"),  # blank votes ignored
    }


def test_oracle_parity(spark, tmp_path):
    df = _df(spark)
    pq = str(tmp_path / "gr.parquet")
    df.write.parquet(pq)
    got = sorted(
        tuple(r)
        for r in golden_record(df, "cluster", ["name", "city"]).collect()
    )
    con = duckdb.connect()
    con.sql(f"create view t as select * from '{pq}/*.parquet'")
    want = sorted(
        tuple(r)
        for r in con.sql(golden_record_sql("t", "cluster", ["name", "city"])).fetchall()
    )
    assert got == want


def test_plan_shape(spark):
    """Scale hygiene: the election is a min-struct argmax, not a window;
    field count never multiplies the shuffle count (melt once, pivot once)."""
    plan = golden_record(_df(spark), "cluster", ["name", "city"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_all_blank_cluster_still_emits_row(spark):
    """A cluster blank/null in every fused field still yields its row
    (all-null fields) — one row per cluster, unconditionally."""
    rows = [("c1", "ann"), ("c2", ""), ("c2", None)]
    df = spark.createDataFrame(rows, ["cluster", "name"])
    out = {r["cluster_id"]: r["name"] for r in golden_record(df, "cluster", ["name"]).collect()}
    assert out == {"c1": "ann", "c2": None}


def test_weighted_votes_and_oracle(spark, tmp_path):
    """weight_col: summed (quantized) weights decide elections; a single
    heavy row outvotes two light ones; oracle twin agrees."""
    rows = [
        ("c1", "ann", 0.5),
        ("c1", "ann", 0.5),
        ("c1", "anne", 3.0),
        ("c2", "bob", None),   # null weight votes 0
        ("c2", "bo", 0.25),
    ]
    df = spark.createDataFrame(rows, ["cluster", "name", "w"])
    got = {
        r["cluster_id"]: r["name"]
        for r in golden_record(df, "cluster", ["name"], weight_col="w").collect()
    }
    assert got == {"c1": "anne", "c2": "bo"}

    pq = str(tmp_path / "grw.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"create view t as select * from '{pq}/*.parquet'")
    want = dict(
        con.sql(golden_record_sql("t", "cluster", ["name"], weight_col="w")).fetchall()
    )
    assert got == want
