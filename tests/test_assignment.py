"""Mutual-best-match 1:1 assignment: selection semantics, deterministic
ties, no-window plan, Spark<->DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.assignment import one_to_one, one_to_one_sql

SCHEMA = "id_rec long, id_mem long, weight double"


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # r1's best is m1 (8) and m1's best is r1 -> kept
        (1, 101, 8.0),
        (1, 102, 5.0),
        (2, 101, 6.0),  # m101 prefers r1 -> dropped
        # r3/m103 mutual -> kept
        (3, 103, 4.0),
        # tie on weight for r4: partners 104 and 105 — tie-break to the
        # SMALLEST mem id; 104's only suitor is r4 -> kept
        (4, 104, 7.0),
        (4, 105, 7.0),
        # chain: r5->m106 (9) but m106's best is r6 (9.5) -> both r5 pairs die
        (5, 106, 9.0),
        (6, 106, 9.5),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_mutual_best_selection(pairs):
    got = {(r["id_rec"], r["id_mem"]) for r in one_to_one(pairs).collect()}
    assert got == {(1, 101), (3, 103), (4, 104), (6, 106)}


def test_each_id_at_most_once(pairs):
    out = one_to_one(pairs).collect()
    recs = [r["id_rec"] for r in out]
    mems = [r["id_mem"] for r in out]
    assert len(recs) == len(set(recs))
    assert len(mems) == len(set(mems))


def test_no_window_in_plan(pairs):
    """The scale contract: argmax via map-side aggregation, not a
    partition-sort window."""
    plan = one_to_one(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_duplicate_pairs_collapse_to_one_row(spark, tmp_path):
    """ADVICE r3: duplicate (rec, mem) rows — or the same pair at several
    weights — must yield ONE output row matching the row_number oracle."""
    dup = spark.createDataFrame(
        [
            (1, 101, 8.0),
            (1, 101, 8.0),  # exact duplicate row
            (2, 102, 5.0),
            (2, 102, 7.0),  # same pair at two weights -> keep max
            (3, 102, 6.0),  # m102 prefers r2 at the collapsed 7.0
        ],
        SCHEMA,
    )
    out = one_to_one(dup).collect()
    got = sorted((r["id_rec"], r["id_mem"], r["weight"]) for r in out)
    assert got == [(1, 101, 8.0), (2, 102, 7.0)]

    pq = str(tmp_path / "dup.parquet")
    dup.write.mode("overwrite").parquet(pq)
    sql = one_to_one_sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_parity_with_duckdb(pairs, tmp_path):
    pq = str(tmp_path / "pairs.parquet")
    pairs.write.mode("overwrite").parquet(pq)
    got = sorted(
        (r["id_rec"], r["id_mem"], round(r["weight"], 6))
        for r in one_to_one(pairs).collect()
    )
    con = duckdb.connect()
    sql = one_to_one_sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = sorted((a, b, round(w, 6)) for a, b, w in con.execute(sql).fetchall())
    assert got == want
