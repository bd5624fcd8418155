"""SemDeDup: duplicate-group election, transitivity, cell containment,
guard behavior, and cross-engine parity."""

from __future__ import annotations

import duckdb

from bigmatch_utilities_spark.operators.similarity import (
    semdedup_keep,
    semdedup_keep_sql,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_duplicates_elect_min_id(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),      # dup of 1
        (7, [0.99, 0.01, 0.0]),    # near-dup of 1 (cos ~ 0.9999)
        (3, [0.0, 1.0, 0.0]),      # distinct
        (4, [0.0, 0.0, 1.0]),      # distinct
    ]
    kept = {
        r.vec_id
        for r in semdedup_keep(_vecs(spark, rows), threshold=0.99, n_cells=2).collect()
    }
    # 1/2/7 form one duplicate group -> min id 1 survives
    assert 1 in kept and 2 not in kept and 7 not in kept
    assert {3, 4} <= kept


def test_transitive_chain_collapses(spark):
    # a~b and b~c above threshold, a~c below: closure still one group
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.96, 0.28]),   # cos(1,2) ~ 0.96
        (3, [0.85, 0.53]),   # cos(2,3) ~ 0.96, cos(1,3) ~ 0.85
    ]
    kept = {
        r.vec_id
        for r in semdedup_keep(
            _vecs(spark, rows), threshold=0.95, n_cells=1
        ).collect()
    }
    assert kept == {1}


def test_cross_cell_duplicates_missed_by_design(spark):
    # two identical vectors forced into different cells by pivot choice:
    # with n_cells == n_vectors every vector can seed its own cell; the
    # documented SemDeDup trade keeps both copies if they split
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])]
    out = {r.vec_id: r.cell for r in semdedup_keep(
        _vecs(spark, rows), threshold=0.99, n_cells=3).collect()}
    # 1 and 3 are identical: same nearest pivot -> same cell -> one kept;
    # this asserts the *containment* property (dedup only within cells)
    cells = {}
    for vid, cell in out.items():
        cells.setdefault(cell, []).append(vid)
    assert all(len(v) == len(set(v)) for v in cells.values())


def test_max_cell_guard_skips_giant_cells(spark):
    rows = [(i, [1.0, 0.0]) for i in range(10)]  # one cell of 10 identicals
    kept_uncapped = semdedup_keep(
        _vecs(spark, rows), threshold=0.99, n_cells=1
    ).count()
    kept_capped = semdedup_keep(
        _vecs(spark, rows), threshold=0.99, n_cells=1, max_cell=5
    ).count()
    assert kept_uncapped == 1     # all dups -> one survivor
    assert kept_capped == 10      # capped cell generates no pairs


def test_oracle_parity(spark, tmp_path):
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((2 * i, [float(round(x, 3)) for x in base]))
        if i % 3 == 0:  # planted near-dup
            rows.append(
                (2 * i + 1, [float(round(x * 1.001, 3)) for x in base])
            )
    df = _vecs(spark, rows)
    pq = str(tmp_path / "emb.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r)
        for r in semdedup_keep(
            df, threshold=0.98, n_cells=4, max_cell=100, shard_rows=16
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW emb AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            semdedup_keep_sql("emb", threshold=0.98, n_cells=4, max_cell=100)
        ).fetchall()
    )
    assert got == want
    assert len(got) < 60 + 20  # at least some planted dups collapsed
