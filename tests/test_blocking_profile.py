"""blocking_profile: block statistics without materializing pairs, blank
exclusion, and Spark<->DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.config import BlockField, BlockingPassSpec, MatchField
from bigmatch_utilities_spark.operators.blocking import (
    blocking_profile,
    blocking_profile_sql,
)

SPEC = BlockingPassSpec(
    block_fields=(BlockField(name="zip"),),
    match_fields=(MatchField(name="zip", comparator="c", m=0.9, u=0.1),),
)


@pytest.fixture(scope="module")
def people(spark):
    rows = (
        [("10001",)] * 4  # block of 4 -> 6 pairs
        + [("20002",)] * 2  # block of 2 -> 1 pair
        + [("30003",)] * 1  # singleton -> 0 pairs
        + [("",)] * 3  # blank_flag=1: excluded entirely
    )
    return spark.createDataFrame(rows, "zip string")


def test_profile_counts(people):
    r = blocking_profile(people, SPEC, pass_id=7).collect()[0]
    assert r["pass_id"] == 7
    assert r["n_rows"] == 7  # blanks out
    assert r["n_blocks"] == 3
    assert r["max_block"] == 4
    assert r["avg_block"] == pytest.approx(7 / 3, abs=1e-6)
    assert r["cand_pairs"] == 6 + 1 + 0
    # full cross product of 7 rows = 21 pairs -> rr = 1 - 7/21
    assert r["reduction_ratio"] == pytest.approx(1 - 7 / 21, abs=1e-6)


def test_blank_flag_zero_keeps_blanks(spark, people):
    spec = BlockingPassSpec(
        block_fields=(BlockField(name="zip", blank_flag=0),),
        match_fields=SPEC.match_fields,
    )
    r = blocking_profile(people, spec).collect()[0]
    assert r["n_rows"] == 10  # blanks form their own block
    assert r["n_blocks"] == 4
    assert r["cand_pairs"] == 6 + 1 + 0 + 3


def test_parity_with_duckdb(people, tmp_path):
    pq = str(tmp_path / "people.parquet")
    people.write.mode("overwrite").parquet(pq)
    got = [tuple(r) for r in blocking_profile(people, SPEC, 0).collect()]
    con = duckdb.connect()
    sql = blocking_profile_sql(
        f"SELECT * FROM read_parquet('{pq}/*.parquet')", SPEC, 0
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want


def test_no_pairs_materialized(people):
    """The plan must contain no join — the profile is groupBy-only."""
    plan = (
        blocking_profile(people, SPEC)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
