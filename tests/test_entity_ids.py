"""Stable entity-ID crosswalk: split/merge/mint semantics, deterministic
contention, Spark<->DuckDB parity, no window over record-scale data."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.entity_ids import (
    stable_entity_ids,
    stable_entity_ids_sql,
)

CURR_SCHEMA = "id long, cluster long"
PREV_SCHEMA = "id long, entity_id string"


@pytest.fixture(scope="module")
def frames(spark):
    # previous run: entity A = {1,2,3}, entity B = {4,5}, entity C = {6}
    prev = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "C")],
        PREV_SCHEMA,
    )
    # new run:
    #   cluster 10 = {1,2}    — larger fragment of A's split -> keeps A
    #   cluster 20 = {3}      — smaller fragment of A -> loses contention,
    #                            mints new:3
    #   cluster 30 = {4,5,6}  — merge of B and C -> keeps B (overlap 2>1)
    #   cluster 40 = {7,8}    — all-new records -> mints new:7
    curr = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30), (5, 30), (6, 30), (7, 40), (8, 40)],
        CURR_SCHEMA,
    )
    return curr, prev


def test_split_merge_mint(frames):
    curr, prev = frames
    got = {
        r["cluster"]: (r["entity_id"], r["carried"], r["overlap"])
        for r in stable_entity_ids(curr, prev).collect()
    }
    assert got == {
        10: ("A", True, 2),
        20: ("new:3", False, 0),
        30: ("B", True, 2),
        40: ("new:7", False, 0),
    }


def test_contention_tiebreak_prefers_smaller_cluster(spark):
    # both clusters overlap entity X equally (1 record each): the award
    # tie-breaks to the SMALLEST cluster id; the loser mints
    prev = spark.createDataFrame([(1, "X"), (2, "X")], PREV_SCHEMA)
    curr = spark.createDataFrame([(1, 7), (2, 5)], CURR_SCHEMA)
    got = {
        r["cluster"]: r["entity_id"]
        for r in stable_entity_ids(curr, prev).collect()
    }
    assert got == {5: "X", 7: "new:1"}


def test_claim_tiebreak_prefers_smaller_entity(spark):
    # one cluster overlaps two prior entities equally: claims the
    # lexicographically smallest entity id
    prev = spark.createDataFrame([(1, "P"), (2, "Q")], PREV_SCHEMA)
    curr = spark.createDataFrame([(1, 1), (2, 1)], CURR_SCHEMA)
    [row] = stable_entity_ids(curr, prev).collect()
    assert (row["cluster"], row["entity_id"], row["overlap"]) == (1, "P", 1)


def test_every_cluster_exactly_once(frames):
    curr, prev = frames
    out = stable_entity_ids(curr, prev).collect()
    clusters = [r["cluster"] for r in out]
    assert sorted(clusters) == sorted({r["cluster"] for r in curr.collect()})
    # carried ids are unique (an entity id never lands on two clusters)
    carried = [r["entity_id"] for r in out if r["carried"]]
    assert len(carried) == len(set(carried))


def test_duckdb_parity(frames):
    curr, prev = frames
    spark_rows = {
        tuple(r)
        for r in stable_entity_ids(curr, prev)
        .select("cluster", "entity_id", "carried", "overlap")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ", ".join(f"({r['id']}, {r['cluster']})" for r in curr.collect())
        + ") t(id, cluster)"
    )
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"({r['id']}, '{r['entity_id']}')" for r in prev.collect())
        + ") t(id, entity_id)"
    )
    sql = stable_entity_ids_sql("SELECT * FROM c", "SELECT * FROM p")
    duck_rows = {tuple(r) for r in con.execute(sql).fetchall()}
    assert spark_rows == duck_rows


def test_no_window_in_plan(frames):
    curr, prev = frames
    plan = stable_entity_ids(curr, prev)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# cluster_churn
# ---------------------------------------------------------------------------

import duckdb as _duckdb

from bigmatch_utilities_spark.operators.entity_ids import (
    cluster_churn,
    cluster_churn_sql,
)


def _churn_fixture(spark):
    prev = spark.createDataFrame(
        [(1, "e1"), (2, "e1"), (3, "e1"), (4, "e2"), (5, "e2"), (6, "e3"),
         (7, "e4"), (8, "e4"), (9, "e5"), (13, "e6"), (14, "e6")],
        "id long, entity_id string",
    )
    curr = spark.createDataFrame(
        [(6, "A"), (4, "B"), (5, "B"), (7, "B"), (8, "B"),
         (1, "C"), (2, "C"), (3, "D"), (9, "E"), (10, "E"),
         (11, "N"), (12, "N"), (13, "R"), (15, "R")],
        "id long, cluster string",
    )
    return curr, prev


def test_cluster_churn_categories(spark):
    curr, prev = _churn_fixture(spark)
    out = {r["cluster"]: r for r in cluster_churn(curr, prev).collect()}
    assert out["A"]["category"] == "stable"
    assert out["B"]["category"] == "merged" and out["B"]["n_prev_entities"] == 2
    assert out["C"]["category"] == "split"
    assert out["D"]["category"] == "split"
    assert out["E"]["category"] == "grown" and out["E"]["n_shared"] == 1
    assert out["N"]["category"] == "new" and out["N"]["n_prev_entities"] == 0
    assert out["R"]["category"] == "reshaped"
    assert out["B"]["curr_size"] == 4 and out["B"]["n_shared"] == 4


def test_cluster_churn_parity(spark, tmp_path):
    curr, prev = _churn_fixture(spark)
    pc, pp = str(tmp_path / "c.parquet"), str(tmp_path / "p.parquet")
    curr.write.mode("overwrite").parquet(pc)
    prev.write.mode("overwrite").parquet(pp)
    got = sorted(tuple(r) for r in cluster_churn(curr, prev).collect())
    con = _duckdb.connect()
    sql = cluster_churn_sql(
        f"SELECT * FROM read_parquet('{pc}/*.parquet')",
        f"SELECT * FROM read_parquet('{pp}/*.parquet')",
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
