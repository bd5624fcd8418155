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


def test_induce_canonical_map_hand_case(spark):
    """Planted spelling variants collapse onto the most frequent form;
    ties break lexicographically; untouched values map to themselves."""
    from bigmatch_utilities_spark.operators.standardize import (
        induce_canonical_map,
    )

    rows = (
        [("WILLIAMS",)] * 5
        + [("WILLIAMS",)] * 0
        + [("WILLAMS",)] * 2   # deletion typo of WILLIAMS
        + [("WILIAMS",)] * 1   # another deletion typo
        + [("JOHNSON",)] * 3
        + [("JOHNSTON",)] * 3  # tie on freq with JOHNSON -> lexicographic
        + [("UNRELATED",)] * 1
        + [("",)] * 2          # blanks dropped
    )
    df = spark.createDataFrame(rows, "name string")
    got = {
        r.value: (r.canonical, r.freq)
        for r in induce_canonical_map(
            df, "name", qgram_n=3, min_sim=0.8
        ).collect()
    }
    assert got["WILLAMS"] == ("WILLIAMS", 2)
    assert got["WILIAMS"] == ("WILLIAMS", 1)
    assert got["WILLIAMS"] == ("WILLIAMS", 5)
    # JOHNSON vs JOHNSTON: sim = 1 - 1/8 = 0.875 >= 0.8, freq tie -> JOHNSON
    assert got["JOHNSON"] == ("JOHNSON", 3)
    assert got["JOHNSTON"] == ("JOHNSON", 3)
    assert got["UNRELATED"] == ("UNRELATED", 1)
    assert "" not in got
    # total map over observed non-blank values
    assert set(got) == {"WILLIAMS", "WILLAMS", "WILIAMS", "JOHNSON", "JOHNSTON", "UNRELATED"}


def test_induce_canonical_map_oracle_parity(spark):
    import duckdb

    from bigmatch_utilities_spark.operators.standardize import (
        induce_canonical_map,
        induce_canonical_map_sql,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    got = sorted(
        (r.value, r.canonical, r.freq)
        for r in induce_canonical_map(df, "p_name", min_sim=0.75).collect()
    )
    con = duckdb.connect()
    con.sql(
        "create view part as select * from "
        "'/root/testdata/sf0.001/part.parquet'"
    )
    want = sorted(
        map(tuple, con.sql(
            induce_canonical_map_sql("part", "p_name", min_sim=0.75)
        ).fetchall())
    )
    assert got == want and len(got) > 0
