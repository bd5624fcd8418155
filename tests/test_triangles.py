"""Triangle census: known closed-form graphs, canonicalization
robustness, and cross-engine parity."""

from __future__ import annotations

import duckdb

from bigmatch_utilities_spark.operators.cluster_audit import (
    cluster_triangles,
    cluster_triangles_sql,
)


def _frames(spark, edges, assigns):
    e = spark.createDataFrame(edges, "id_l long, id_r long")
    a = spark.createDataFrame(assigns, "id long, cluster_id long")
    return a, e


def _rows(spark, edges, assigns):
    a, e = _frames(spark, edges, assigns)
    return {
        r.cluster_id: (
            r.n_members,
            r.n_edges,
            r.n_triangles,
            r.n_wedges,
            r.transitivity,
        )
        for r in cluster_triangles(a, e).collect()
    }


def test_known_shapes(spark):
    # cluster 1: K3 (clique) — 1 triangle, 3 wedges, transitivity 1.0
    # cluster 2: path of 4 (chain) — 0 triangles, 2 wedges, transitivity 0
    # cluster 3: K4 — 4 triangles, 12 wedges, transitivity 1.0
    edges = [
        (1, 2), (2, 3), (1, 3),
        (10, 11), (11, 12), (12, 13),
        (20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23),
    ]
    assigns = (
        [(i, 1) for i in (1, 2, 3)]
        + [(i, 2) for i in (10, 11, 12, 13)]
        + [(i, 3) for i in (20, 21, 22, 23)]
    )
    got = _rows(spark, edges, assigns)
    assert got[1] == (3, 3, 1, 3, 1.0)
    assert got[2] == (4, 3, 0, 2, 0.0)
    assert got[3] == (4, 6, 4, 12, 1.0)


def test_duplicates_reversals_selfloops_ignored(spark):
    # same K3 fed as duplicated, reversed, self-looped edges
    edges = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1)]
    got = _rows(spark, edges, [(1, 1), (2, 1), (3, 1)])
    assert got[1] == (3, 3, 1, 3, 1.0)


def test_cross_cluster_edges_excluded_and_small_clusters_dropped(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assigns = [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2)]
    got = _rows(spark, edges, assigns)
    # cluster 2 has 2 members -> dropped; (3,4) crosses clusters -> ignored
    assert set(got) == {1}
    assert got[1] == (3, 3, 1, 3, 1.0)


def test_oracle_parity(spark, tmp_path):
    edges = [
        (1, 2), (2, 3), (1, 3), (3, 4),
        (10, 11), (11, 12), (12, 13), (10, 13), (10, 12),
    ]
    assigns = [(i, 1) for i in (1, 2, 3, 4)] + [(i, 2) for i in (10, 11, 12, 13)]
    a, e = _frames(spark, edges, assigns)
    e.write.mode("overwrite").parquet(str(tmp_path / "e.parquet"))
    a.write.mode("overwrite").parquet(str(tmp_path / "a.parquet"))
    got = sorted(tuple(r) for r in cluster_triangles(a, e).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ev AS SELECT * FROM read_parquet('{tmp_path}/e.parquet/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW av AS SELECT * FROM read_parquet('{tmp_path}/a.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            cluster_triangles_sql("SELECT * FROM av", "SELECT * FROM ev")
        ).fetchall()
    )
    assert got == want
