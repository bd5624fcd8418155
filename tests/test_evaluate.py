"""Pairwise evaluation metrics: counts, canonicalization, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

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


CSCHEMA = "id long, cluster_id long"
LSCHEMA = "id long, label string"


def test_cluster_metrics_handcrafted(spark):
    from bigmatch_utilities_spark.operators.evaluate import cluster_metrics

    # pred: {1,2,3} {4,5} {6}; truth: A={1,2} B={3,4,5} C={6}
    pred = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)], CSCHEMA
    )
    truth = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B"), (6, "C")], LSCHEMA
    )
    r = cluster_metrics(pred, truth).collect()[0]
    assert (r.n_items, r.n_clusters, r.n_labels) == (6, 3, 3)
    # B3P = (1/6)(4/3 + 1/3 + 4/2 + 1/1) = 14/18; B3R symmetric here
    assert r.b3_precision == pytest.approx(14 / 18, abs=2e-6)
    assert r.b3_recall == pytest.approx(14 / 18, abs=2e-6)
    assert r.b3_f1 == pytest.approx(14 / 18, abs=2e-6)
    # ARI: cells C2 = 2, marginals 4 and 4, C(6,2) = 15
    assert r.ari == pytest.approx((2 - 16 / 15) / (4 - 16 / 15), abs=1e-6)


def test_cluster_metrics_perfect_and_subset(spark):
    from bigmatch_utilities_spark.operators.evaluate import cluster_metrics

    pred = spark.createDataFrame([(1, 7), (2, 7), (3, 9)], CSCHEMA)
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (99, "z")], LSCHEMA
    )
    r = cluster_metrics(pred, truth).collect()[0]
    # 99 is unlabeled on the predicted side -> dropped by the inner join
    assert r.n_items == 3
    assert r.b3_precision == 1.0 and r.b3_recall == 1.0 and r.b3_f1 == 1.0
    assert r.ari == 1.0


def test_cluster_metrics_duckdb_parity(spark, tmp_path):
    import random

    from bigmatch_utilities_spark.operators.evaluate import (
        cluster_metrics,
        cluster_metrics_sql,
    )

    rng = random.Random(13)
    n = 300
    pred = [(i, rng.randint(0, 25)) for i in range(n)]
    truth = [(i, f"l{rng.randint(0, 12)}") for i in range(n)]
    pdf = spark.createDataFrame(pred, CSCHEMA)
    tdf = spark.createDataFrame(truth, LSCHEMA)
    pp, tp = str(tmp_path / "p.parquet"), str(tmp_path / "t.parquet")
    pdf.write.mode("overwrite").parquet(pp)
    tdf.write.mode("overwrite").parquet(tp)
    got = tuple(cluster_metrics(pdf, tdf).collect()[0])
    sql = cluster_metrics_sql(
        f"SELECT * FROM read_parquet('{pp}/*.parquet')",
        f"SELECT * FROM read_parquet('{tp}/*.parquet')",
    )
    want = duckdb.connect().execute(sql).fetchall()[0]
    assert got == want


def test_cutoff_sweep_handcrafted(spark):
    """Hand-checkable curve: 4 scored pairs, 2 true. Monotone n_pred,
    and each row equals pairwise_metrics at that cutoff."""
    from bigmatch_utilities_spark.operators.evaluate import cutoff_sweep

    scored = spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 2.0), (5, 6, -1.0), (7, 8, -3.0)],
        "id_l long, id_r long, weight double",
    )
    truth = spark.createDataFrame([(1, 2), (5, 6)], "id_l long, id_r long")
    rows = {
        r.threshold: r
        for r in cutoff_sweep(scored, truth, thresholds=[-4.0, 0.0, 3.0]).collect()
    }
    # t=-4: all 4 predicted, tp=2 -> P=0.5 R=1.0
    assert (rows[-4.0].n_pred, rows[-4.0].tp, rows[-4.0].fp, rows[-4.0].fn) == (4, 2, 2, 0)
    assert (rows[-4.0].precision, rows[-4.0].recall) == (0.5, 1.0)
    # t=0: {5.0, 2.0} predicted, tp=1
    assert (rows[0.0].n_pred, rows[0.0].tp) == (2, 1)
    assert rows[0.0].f1 == 0.5
    # t=3: only 5.0 predicted, tp=1 -> P=1.0 R=0.5
    assert (rows[3.0].n_pred, rows[3.0].precision, rows[3.0].recall) == (1, 1.0, 0.5)


def test_cutoff_sweep_canonicalizes_and_dedups(spark):
    """Both orientations + duplicates of a pair collapse to one pair at
    its MAX weight; truth-only pairs never inflate n_pred."""
    from bigmatch_utilities_spark.operators.evaluate import cutoff_sweep

    scored = spark.createDataFrame(
        [(2, 1, 1.0), (1, 2, 4.0), (1, 2, 1.0), (9, 9, 99.0)],
        "id_l long, id_r long, weight double",
    )
    truth = spark.createDataFrame([(2, 1), (30, 31)], "id_l long, id_r long")
    rows = {r.threshold: r for r in cutoff_sweep(scored, truth, thresholds=[2.0]).collect()}
    # one canonical pair (1,2) at max weight 4.0; self-loop dropped;
    # truth pair (30,31) contributes fn only
    assert (rows[2.0].n_pred, rows[2.0].tp, rows[2.0].fn, rows[2.0].n_truth) == (1, 1, 1, 2)


def test_cutoff_sweep_duckdb_parity(spark, tmp_path):
    import random

    from bigmatch_utilities_spark.operators.evaluate import (
        cutoff_sweep,
        cutoff_sweep_sql,
    )

    rng = random.Random(7)
    scored = [
        (rng.randint(0, 40), rng.randint(0, 40), round(rng.uniform(-5, 5), 6))
        for _ in range(200)
    ]
    truth = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(60)]
    sdf = spark.createDataFrame(scored, "id_l long, id_r long, weight double")
    tdf = spark.createDataFrame(truth, "id_l long, id_r long")
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    sdf.write.mode("overwrite").parquet(sp)
    tdf.write.mode("overwrite").parquet(tp)
    ths = [-3.0, -1.0, 0.0, 2.5]
    got = sorted(tuple(r) for r in cutoff_sweep(sdf, tdf, ths).collect())
    sql = cutoff_sweep_sql(
        f"SELECT * FROM read_parquet('{sp}/*.parquet')",
        f"SELECT id_l, id_r FROM read_parquet('{tp}/*.parquet')",
        ths,
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_posterior_calibration_bins_and_brier(spark):
    from bigmatch_utilities_spark.operators.evaluate import (
        posterior_calibration,
    )

    # 4 scored pairs: two confident matches (0.95, one true one false),
    # one confident non-match (0.05, truly non-match), one mid (0.55, true)
    post = spark.createDataFrame(
        [
            (1, 2, 0.95),
            (3, 4, 0.95),
            (5, 6, 0.05),
            (7, 8, 0.55),
        ],
        "id_l long, id_r long, posterior double",
    )
    truth = spark.createDataFrame([(2, 1), (8, 7)], "id_l long, id_r long")
    rows = {r.bin: r for r in posterior_calibration(post, truth, 10).collect()}
    assert sorted(rows) == [0, 5, 9]
    b9 = rows[9]  # the two 0.95 pairs, one of which is a true match
    assert (b9.n_pairs, b9.n_match) == (2, 1)
    assert b9.mean_posterior == pytest.approx(0.95, abs=1e-6)
    assert b9.match_rate == pytest.approx(0.5, abs=1e-6)
    # brier for bin 9: ((0.95-1)^2 + (0.95-0)^2) / 2 = (0.0025+0.9025)/2
    assert b9.brier == pytest.approx(0.4525, abs=1e-6)
    b0 = rows[0]
    assert (b0.n_pairs, b0.n_match) == (1, 0)
    assert b0.brier == pytest.approx(0.0025, abs=1e-6)
    b5 = rows[5]
    assert (b5.n_pairs, b5.n_match) == (1, 1)
    assert b5.brier == pytest.approx(0.2025, abs=1e-6)


def test_posterior_calibration_duckdb_parity(spark):
    import random

    from bigmatch_utilities_spark.operators.evaluate import (
        posterior_calibration,
        posterior_calibration_sql,
    )

    rng = random.Random(23)
    post = [
        (rng.randint(0, 60), rng.randint(0, 60), round(rng.random(), 6))
        for _ in range(300)
    ]
    truth = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)]
    pdf = spark.createDataFrame(
        post, "id_l long, id_r long, posterior double"
    )
    tdf = spark.createDataFrame(truth, "id_l long, id_r long")
    got = (
        posterior_calibration(pdf, tdf, n_bins=8)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW p AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b}, {w})" for a, b, w in post)
        + ") t(id_l, id_r, posterior)"
    )
    con.sql(
        "CREATE VIEW tr AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in truth)
        + ") t(id_l, id_r)"
    )
    want = (
        con.sql(
            posterior_calibration_sql(
                "SELECT * FROM p", "SELECT * FROM tr", n_bins=8
            )
        )
        .df()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("bin", "n_pairs", "n_match"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist()
    for c in ("mean_posterior", "match_rate", "brier"):
        # bit-identical by construction (integer quantization, single div)
        assert got[c].tolist() == want[c].tolist()


def test_dual_system_estimate_chapman(spark):
    from bigmatch_utilities_spark.operators.evaluate import (
        dual_system_estimate,
    )

    rec = spark.range(100).select(F.col("id").alias("rid"))
    mem = spark.range(80).select(F.col("id").alias("mid"))
    # 40 matched entities; duplicate match rows must not inflate m
    links = spark.createDataFrame(
        [(i, i) for i in range(40)] + [(0, 0), (1, 1)],
        "id_l long, id_r long",
    )
    r = dual_system_estimate(rec, mem, links).collect()[0]
    assert (r.n1, r.n2, r.m) == (100, 80, 40)
    n_hat = (101 * 81) / 41 - 1
    assert r.n_hat == pytest.approx(round(n_hat, 6), abs=1e-6)
    se = ((101 * 81 * 60 * 40) / (41 * 41 * 42)) ** 0.5
    assert r.se == pytest.approx(round(se, 6), abs=1e-6)



def test_stratified_metrics_partition_of_global(spark):
    from bigmatch_utilities_spark.operators.evaluate import (
        pairwise_metrics,
        stratified_metrics,
    )

    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (1, 5), (7, 9)], SCHEMA
    )
    truth = spark.createDataFrame([(2, 1), (3, 4), (1, 5), (8, 9)], SCHEMA)
    # strata: 1-4 in 'a', 5-6 in 'b', 7-8 unknown (missing), 9 in 'b'
    strata = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "a"), (5, "b"), (6, "b"), (9, "b")],
        "id long, stratum string",
    )
    rows = {r.stratum: r for r in stratified_metrics(pred, truth, strata).collect()}
    assert set(rows) == {"a", "b", "(cross)", "(unknown)"}
    a = rows["a"]
    assert (a.n_pred, a.n_truth, a.tp) == (2, 2, 2)
    assert a.f1 == 1.0
    c = rows["(cross)"]   # pair (1,5) spans a/b
    assert (c.n_pred, c.n_truth, c.tp) == (1, 1, 1)
    u = rows["(unknown)"]  # (7,9) pred-only, (8,9) truth-only
    assert (u.n_pred, u.n_truth, u.tp) == (1, 1, 0)
    # strata rows partition the global counters exactly
    g = pairwise_metrics(pred, truth).collect()[0]
    assert sum(r.n_pred for r in rows.values()) == g.n_pred
    assert sum(r.n_truth for r in rows.values()) == g.n_truth
    assert sum(r.tp for r in rows.values()) == g.tp
