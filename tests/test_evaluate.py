"""Pairwise evaluation metrics: counts, canonicalization, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.evaluate import (
    pairwise_metrics,
    pairwise_metrics_sql,
)

SCHEMA = "id_l long, id_r long"


def test_counts_and_scores(spark):
    # truth: {1-2, 2-3, 4-5}; pred: {2-1 (reversed dup of 1-2), 2-3, 6-7}
    truth = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], SCHEMA)
    pred = spark.createDataFrame([(2, 1), (1, 2), (2, 3), (6, 7)], SCHEMA)
    r = pairwise_metrics(pred, truth).collect()[0]
    assert (r.n_pred, r.n_truth, r.tp, r.fp, r.fn) == (3, 3, 2, 1, 1)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(2 / 3, abs=1e-6)
    assert r.f1 == pytest.approx(2 / 3, abs=1e-6)


def test_perfect_and_selfloop(spark):
    truth = spark.createDataFrame([(1, 2), (3, 3), (4, 5)], SCHEMA)
    pred = spark.createDataFrame([(2, 1), (5, 4), (3, 3)], SCHEMA)
    r = pairwise_metrics(pred, truth).collect()[0]
    # self-loops dropped on both sides; remaining sets identical
    assert (r.n_pred, r.n_truth, r.tp) == (2, 2, 2)
    assert r.f1 == 1.0


def test_duckdb_parity(spark, tmp_path):
    import random

    rng = random.Random(11)
    truth = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(120)]
    pred = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(120)]
    tdf = spark.createDataFrame(truth, SCHEMA)
    pdf = spark.createDataFrame(pred, SCHEMA)
    tp, pp = str(tmp_path / "t.parquet"), str(tmp_path / "p.parquet")
    tdf.write.mode("overwrite").parquet(tp)
    pdf.write.mode("overwrite").parquet(pp)
    spark_row = tuple(pairwise_metrics(pdf, tdf).collect()[0])
    sql = pairwise_metrics_sql(
        f"SELECT * FROM read_parquet('{pp}/*.parquet')",
        f"SELECT * FROM read_parquet('{tp}/*.parquet')",
    )
    duck_row = duckdb.connect().execute(sql).fetchall()[0]
    assert spark_row == duck_row


PSCHEMA = "id_l long, id_r long, pass_id int"


def test_pass_completeness_handcrafted(spark):
    from bigmatch_utilities_spark.operators.evaluate import pass_completeness

    truth = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], SCHEMA)
    cands = spark.createDataFrame(
        [
            # pass 0: {1-2 (twice, reversed), 7-8}
            (1, 2, 0), (2, 1, 0), (7, 8, 0),
            # pass 1: {1-2 again (first-wins -> pass 0), 3-4, 9-10}
            (1, 2, 1), (3, 4, 1), (9, 10, 1),
        ],
        PSCHEMA,
    )
    rows = {r.pass_id: r for r in pass_completeness(cands, truth).collect()}
    p0, p1 = rows[0], rows[1]
    assert (p0.n_cands, p0.n_new, p0.n_hits) == (2, 2, 1)
    assert (p1.n_cands, p1.n_new, p1.n_hits) == (3, 2, 2)
    assert p0.pc == pytest.approx(1 / 3, abs=1e-6)
    assert p0.pq == pytest.approx(1 / 2, abs=1e-6)
    assert p1.pc == pytest.approx(2 / 3, abs=1e-6)
    assert p1.pq == pytest.approx(2 / 3, abs=1e-6)
    # cumulative first-wins recall: pass 0 recovers 1-2; pass 1 adds 3-4
    assert (p0.cum_hits, p1.cum_hits) == (1, 2)
    assert p1.cum_pc == pytest.approx(2 / 3, abs=1e-6)


def test_pass_completeness_duckdb_parity(spark, tmp_path):
    import random

    from bigmatch_utilities_spark.operators.evaluate import (
        pass_completeness,
        pass_completeness_sql,
    )

    rng = random.Random(7)
    truth = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(80)]
    cands = [
        (rng.randint(0, 40), rng.randint(0, 40), rng.randint(0, 3))
        for _ in range(300)
    ]
    tdf = spark.createDataFrame(truth, SCHEMA)
    cdf = spark.createDataFrame(cands, PSCHEMA)
    tp, cp = str(tmp_path / "t.parquet"), str(tmp_path / "c.parquet")
    tdf.write.mode("overwrite").parquet(tp)
    cdf.write.mode("overwrite").parquet(cp)
    got = [tuple(r) for r in pass_completeness(cdf, tdf).collect()]
    sql = pass_completeness_sql(
        f"SELECT * FROM read_parquet('{cp}/*.parquet')",
        f"SELECT * FROM read_parquet('{tp}/*.parquet')",
    )
    want = [
        tuple(int(v) if isinstance(v, (int,)) else v for v in row)
        for row in duckdb.connect().execute(sql).fetchall()
    ]
    assert got == want
