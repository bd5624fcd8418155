"""Table profiler: exact counts, null handling, tie-breaks, all-null
columns, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.profile import (
    profile_table,
    profile_table_sql,
)


def _df(spark):
    rows = [
        (1, "a", None),
        (2, "b", None),
        (3, "a", None),
        (4, None, None),
        (5, "b", None),
        (6, "c", None),
    ]
    return spark.createDataFrame(rows, "id long, s string, dead string")


def test_profile_values(spark):
    got = {
        r.column: r.asDict() for r in profile_table(_df(spark), ["id", "s", "dead"]).collect()
    }
    assert got["id"]["n_rows"] == 6
    assert got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 6
    # string image: min/max on CAST(id AS STRING)
    assert got["id"]["min_s"] == "1" and got["id"]["max_s"] == "6"
    s = got["s"]
    assert s["n_nulls"] == 1
    assert s["null_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert s["n_distinct"] == 3
    # a and b both appear twice -> value ASC tiebreak
    assert (s["top_value"], s["top_n"]) == ("a", 2)
    dead = got["dead"]
    assert dead["n_nulls"] == 6 and dead["n_distinct"] == 0
    assert dead["top_value"] is None and dead["top_n"] == 0


def test_profile_rejects_empty_cols(spark):
    with pytest.raises(ValueError):
        profile_table(_df(spark), [])
    with pytest.raises(ValueError):
        profile_table_sql("t", [])


def test_profile_oracle_parity(spark, tmp_path):
    df = _df(spark)
    pq = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r) for r in profile_table(df, ["id", "s", "dead"]).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(
        tuple(r)
        for r in con.execute(profile_table_sql("t", ["id", "s", "dead"])).fetchall()
    )
    assert got == want


def test_profile_single_pass_plan(spark):
    # the melt feeds both aggregations; neither path re-reads the source
    # more than once per consumer and the top-value window partitions by
    # column name (no global sort)
    plan = (
        profile_table(_df(spark), ["id", "s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan  # n_cols-row join is broadcast
