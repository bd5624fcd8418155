"""block_skew_report: heavy-hitter keys, pair shares, shard ceilings, blank
exclusion, and Spark<->DuckDB parity (incl. a randomized-input check)."""

from __future__ import annotations

import random

import duckdb
import pytest

from bigmatch_utilities_spark.config import BlockField, BlockingPassSpec, MatchField
from bigmatch_utilities_spark.operators.blocking import (
    block_skew_report,
    block_skew_report_sql,
)

SPEC = BlockingPassSpec(
    block_fields=(BlockField(name="zip"),),
    match_fields=(MatchField(name="zip", comparator="c", m=0.9, u=0.1),),
)


@pytest.fixture(scope="module")
def people(spark):
    rows = (
        [("10001",)] * 5  # 10 pairs
        + [("20002",)] * 3  # 3 pairs
        + [("30003",)] * 2  # 1 pair
        + [("40004",)] * 1  # singleton
        + [("",)] * 4  # blank_flag=1: excluded entirely
    )
    return spark.createDataFrame(rows, "zip string")


def test_heavy_hitters_and_shares(people):
    rows = block_skew_report(people, SPEC, top=3, max_block_rows=2, pass_id=5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert [r["block_key"] for r in rows] == ["10001", "20002", "30003"]
    assert [r["n"] for r in rows] == [5, 3, 2]
    assert [r["block_pairs"] for r in rows] == [10, 3, 1]
    tot = 10 + 3 + 1
    for r, p in zip(rows, (10, 3, 1)):
        assert r["pair_share"] == pytest.approx(p / tot, abs=1e-6)
        assert r["pass_id"] == 5
    # ceil(n / 2): 5->3, 3->2, 2->1
    assert [r["rec_shards"] for r in rows] == [3, 2, 1]


def test_all_singletons_share_is_zero(spark):
    df = spark.createDataFrame([(str(i),) for i in range(4)], "zip string")
    rows = block_skew_report(df, SPEC, top=10).collect()
    assert len(rows) == 4
    assert all(r["pair_share"] == 0.0 for r in rows)
    assert all(r["block_pairs"] == 0 for r in rows)


def test_multi_key_and_tiebreak(spark):
    spec = BlockingPassSpec(
        block_fields=(BlockField(name="a"), BlockField(name="b")),
        match_fields=SPEC.match_fields,
    )
    df = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("y", "2"), ("y", "2")], "a string, b string"
    )
    rows = block_skew_report(df, spec, top=2).collect()
    # equal sizes -> tie broken by key string ascending
    assert [r["block_key"] for r in rows] == ["x|1", "y|2"]


def _parity(spark, rows, top, max_block_rows, tmp_path, name):
    df = spark.createDataFrame(rows, "zip string")
    pq = str(tmp_path / f"{name}.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r) for r in block_skew_report(df, SPEC, top=top, max_block_rows=max_block_rows).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    sql = block_skew_report_sql(
        "SELECT * FROM src", SPEC, top=top, max_block_rows=max_block_rows
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_parity_with_duckdb(spark, people, tmp_path):
    _parity(
        spark,
        [(r["zip"],) for r in people.collect()],
        top=3,
        max_block_rows=2,
        tmp_path=tmp_path,
        name="p0",
    )


def test_parity_randomized(spark, tmp_path):
    rng = random.Random(80801)
    rows = [
        (rng.choice(["", "11111", "22222", "33333", "44444", "55555"]),)
        for _ in range(300)
    ]
    _parity(spark, rows, top=4, max_block_rows=7, tmp_path=tmp_path, name="p1")
