"""Standardization: expr path == join path == DuckDB twin; edge rows."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.standardize import (
    DEFAULT_SYNONYMS,
    standardize_expr,
    standardize_expr_sql,
    standardize_join,
)

ROWS = [
    (1, "Dr. BILL O'Malley,  123 Main St!"),
    (2, "liz & beth live on elm AVE"),
    (3, "no synonyms in here at all"),
    (4, "...!!..."),  # only punctuation → ''
    (5, ""),
    (6, "BILL bill BiLl"),  # repeated mapping
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["rid", "raw"])


def test_expr_path_values(spark):
    got = {
        r["rid"]: r["std"]
        for r in _df(spark).select("rid", standardize_expr(F.col("raw")).alias("std")).collect()
    }
    assert got[1] == "dr william o'malley 123 main street"
    assert got[2] == "elizabeth elizabeth live on elm avenue"
    assert got[3] == "no synonyms in here at all"
    assert got[4] == "" and got[5] == ""
    assert got[6] == "william william william"


def test_expr_sql_twin_parity(spark):
    got = {
        r["rid"]: r["std"]
        for r in _df(spark).select("rid", standardize_expr(F.col("raw")).alias("std")).collect()
    }
    con = duckdb.connect()
    for rid, raw in ROWS:
        lit = "'" + raw.replace("'", "''") + "'"
        want = con.sql(f"select {standardize_expr_sql(lit)}").fetchone()[0]
        assert got[rid] == want, (rid, got[rid], want)


def test_join_path_equals_expr_path(spark):
    df = _df(spark)
    mapping = spark.createDataFrame(
        list(DEFAULT_SYNONYMS.items()), ["token", "canonical"]
    )
    joined = {
        r["rid"]: r["std_text"]
        for r in standardize_join(df, "raw", "rid", mapping).select("rid", "std_text").collect()
    }
    expr = {
        r["rid"]: r["std"]
        for r in df.select("rid", standardize_expr(F.col("raw")).alias("std")).collect()
    }
    assert joined == expr
