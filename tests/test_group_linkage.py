"""Group-level linkage rollup: hand-checked counts/containment, intra-group
drop, canonicalization, DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401  (fixture style parity)

from bigmatch_utilities_spark.operators.group_linkage import (
    group_match_profile,
    group_match_profile_sql,
)

PAIRS = "id_l long, id_r long, weight double"
MEMBERS = "id long, grp string"


def test_handcrafted_rollup(spark):
    # groups: A={1,2,3}, B={10,11}, C={20}
    members = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (10, "B"), (11, "B"), (20, "C")], MEMBERS
    )
    pairs = spark.createDataFrame(
        [
            (1, 10, 2.0),   # A-B
            (2, 10, 3.0),   # A-B (same B member again)
            (1, 2, 9.0),    # intra-A: dropped
            (10, 3, 1.5),   # B-A, reversed orientation -> canonicalized
            (11, 20, 0.5),  # B-C
        ],
        PAIRS,
    )
    rows = {
        (r.group_l, r.group_r): r
        for r in group_match_profile(pairs, members).collect()
    }
    ab = rows[("A", "B")]
    # 3 cross pairs; A members {1,2,3} all matched; B members {10}
    assert (ab.n_pairs, ab.matched_l, ab.matched_r) == (3, 3, 1)
    assert ab.sum_weight == pytest.approx(6.5, abs=1e-6)
    # containment = max(3/3, 1/2) = 1.0 — all of A found a partner in B
    assert ab.containment == 1.0
    bc = rows[("B", "C")]
    assert (bc.n_pairs, bc.matched_l, bc.matched_r) == (1, 1, 1)
    assert bc.containment == 1.0  # C is fully covered (1/1)
    assert ("A", "C") not in rows


def test_min_pairs_and_missing_membership(spark):
    members = spark.createDataFrame([(1, "A"), (10, "B")], MEMBERS)
    pairs = spark.createDataFrame(
        [(1, 10, 1.0), (1, 99, 5.0)], PAIRS  # 99 has no membership: dropped
    )
    out = group_match_profile(pairs, members, min_pairs=2).collect()
    assert out == []
    out1 = group_match_profile(pairs, members, min_pairs=1).collect()
    assert len(out1) == 1 and out1[0].n_pairs == 1


def test_duckdb_parity(spark, tmp_path):
    import random

    rng = random.Random(17)
    members = [(i, f"g{i % 6}") for i in range(60)]
    pairs = [
        (rng.randint(0, 59), rng.randint(0, 59), rng.uniform(-5, 10))
        for _ in range(400)
    ]
    mdf = spark.createDataFrame(members, MEMBERS)
    pdf = spark.createDataFrame(pairs, PAIRS)
    mp, pp = str(tmp_path / "m.parquet"), str(tmp_path / "p.parquet")
    mdf.write.parquet(mp)
    pdf.write.parquet(pp)
    got = sorted(tuple(r) for r in group_match_profile(pdf, mdf).collect())
    sql = group_match_profile_sql(
        f"SELECT * FROM read_parquet('{pp}/*.parquet')",
        f"SELECT * FROM read_parquet('{mp}/*.parquet')",
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
