"""Sorted-neighborhood blocking: rank correctness across partitionings,
pair semantics, oracle parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.sorted_neighborhood import (
    sorted_neighborhood_pairs,
    sorted_neighborhood_sql,
    with_global_rank,
)

ROWS = [
    (1, "smith", 30),
    (2, "smyth", 31),
    (3, "smithe", 29),
    (4, "adams", 50),
    (5, "adamson", 51),
    (6, "zhou", 12),
    (7, "smith", 30),  # exact tie with 1 → id tiebreak
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["rid", "name", "age"])


def test_global_rank_is_a_permutation_and_partition_invariant(spark):
    df = _df(spark)
    for parts in (1, 3, 16):
        ranked = with_global_rank(df, ["name", "rid"], num_partitions=parts)
        got = {r["rid"]: r["rank"] for r in ranked.collect()}
        want_order = sorted(ROWS, key=lambda t: (t[1], t[0]))
        want = {t[0]: i + 1 for i, t in enumerate(want_order)}
        assert got == want, (parts, got, want)


def test_pair_count_linear(spark):
    pairs = sorted_neighborhood_pairs(_df(spark), ["name"], "rid", window=3)
    rows = pairs.collect()
    # (w-1)*N minus edge truncation: 2*7 - (1+2) = 11
    assert len(rows) == 11
    assert all(1 <= r["dist"] <= 2 for r in rows)
    assert all(r["id_l"] < r["id_r"] for r in rows)


def test_neighbors_meet_without_key_equality(spark):
    pairs = {
        (r["id_l"], r["id_r"])
        for r in sorted_neighborhood_pairs(
            _df(spark), ["name"], "rid", window=2
        ).collect()
    }
    # smith(1) and smith(7) tie → adjacent; smithe(3) right after them
    assert (1, 7) in pairs
    assert (3, 7) in pairs or (1, 3) in pairs


def test_oracle_parity(spark, tmp_path):
    df = _df(spark)
    pq = str(tmp_path / "p.parquet")
    df.write.parquet(pq)
    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df, ["name", "age"], "rid", window=4, num_partitions=3
        ).collect()
    }
    con = duckdb.connect()
    con.sql(f"create view p as select * from '{pq}/*.parquet'")
    want = {
        tuple(r)
        for r in con.sql(
            sorted_neighborhood_sql("p", ["name", "age"], "rid", window=4)
        ).fetchall()
    }
    assert got == want


def test_oracle_parity_with_null_keys(spark, tmp_path):
    """NULL key values: Spark's ASC sort puts NULLS FIRST; the oracle SQL
    must say so explicitly (DuckDB defaults NULLS LAST) or ranks — and the
    pair set — diverge."""
    rows = [
        (1, None, 30),
        (2, "ann", None),
        (3, None, None),
        (4, "ann", 25),
        (5, "bob", 40),
    ]
    df = spark.createDataFrame(rows, ["rid", "name", "age"])
    pq = str(tmp_path / "n.parquet")
    df.write.parquet(pq)
    got = {
        (r["id_l"], r["id_r"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df, ["name", "age"], "rid", window=3, num_partitions=2
        ).collect()
    }
    con = duckdb.connect()
    con.sql(f"create view n as select * from '{pq}/*.parquet'")
    want = {
        tuple(r)
        for r in con.sql(
            sorted_neighborhood_sql("n", ["name", "age"], "rid", window=3)
        ).fetchall()
    }
    assert got == want
