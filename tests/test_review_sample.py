"""Stratified clerical-review sampling: determinism, salt invariance,
band/stratum semantics, DuckDB parity of the md5 tiebreak order."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.review_sample import (
    review_sample,
    review_sample_sql,
)

SCHEMA = "id_l long, id_r long, weight double"


@pytest.fixture(scope="module")
def pairs(spark):
    # 400 pairs with weights spread over [-6, 2): every stratum populated
    # well past per_stratum so the cap actually binds
    rows = [
        (i, 10_000 + i, round(-6.0 + (i % 80) * 0.1, 6)) for i in range(400)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _key_set(df):
    return {(r.id_l, r.id_r, r.stratum, r.rk) for r in df.collect()}


def test_band_strata_and_cap(pairs):
    out = review_sample(pairs, low=-6.0, high=2.0, n_strata=4, per_stratum=10)
    rows = out.collect()
    assert all(-6.0 <= r.weight < 2.0 for r in rows)
    per = {}
    for r in rows:
        assert 0 <= r.stratum <= 3
        # stratum matches the weight band: [-6,-4) -> 0, [-4,-2) -> 1 ...
        assert r.stratum == min(3, int((r.weight + 6.0) // 2.0))
        per[r.stratum] = per.get(r.stratum, 0) + 1
        assert 1 <= r.rk <= 10
    assert per == {0: 10, 1: 10, 2: 10, 3: 10}


def test_salt_invariance_and_determinism(pairs):
    a = review_sample(pairs, per_stratum=7, salt_buckets=64)
    b = review_sample(pairs, per_stratum=7, salt_buckets=3)
    c = review_sample(pairs, per_stratum=7, salt_buckets=64)
    assert _key_set(a) == _key_set(b) == _key_set(c)


def test_duckdb_parity(pairs, tmp_path):
    p = str(tmp_path / "pairs.parquet")
    pairs.write.mode("overwrite").parquet(p)
    spark_out = sorted(
        tuple(r) for r in review_sample(pairs, per_stratum=5).collect()
    )
    con = duckdb.connect()
    sql = review_sample_sql(
        f"SELECT * FROM read_parquet('{p}/*.parquet')", per_stratum=5
    )
    duck_out = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_out == duck_out


def test_small_band_returns_everything(spark):
    d = spark.createDataFrame([(1, 2, 0.5), (3, 4, 1.5)], SCHEMA)
    out = review_sample(d, low=-1.0, high=2.0, n_strata=3, per_stratum=25)
    assert out.count() == 2


# ---------------------------------------------------------------------------
# uncertainty batch (active learning)
# ---------------------------------------------------------------------------


def test_uncertainty_batch_orders_by_boundary_distance(spark):
    from bigmatch_utilities_spark.operators.review_sample import (
        uncertainty_batch,
    )

    rows = [(i, 100 + i, float(w)) for i, w in enumerate([-3, -1, 0.2, 0.1, 4, 2.5])]
    df = spark.createDataFrame(rows, "id_l long, id_r long, weight double")
    got = [
        (r.id_l, r.dist) for r in uncertainty_batch(df, k=3, target=0.0).collect()
    ]
    # ranks 1..3 must be the three smallest |w - 0|: 0.1, 0.2, 1.0
    assert [d for _, d in got] == [0.1, 0.2, 1.0]


def test_uncertainty_batch_block_quota_and_duckdb_parity(spark, tmp_path):
    import random

    import duckdb as _dd

    from bigmatch_utilities_spark.operators.review_sample import (
        uncertainty_batch,
        uncertainty_batch_sql,
    )

    rng = random.Random(23)
    rows = [
        (i, 1000 + i, rng.choice(["a", "b", "c"]), round(rng.uniform(-6, 6), 3))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id_l long, id_r long, blk string, weight double")
    path = str(tmp_path / "u.parquet")
    df.write.mode("overwrite").parquet(path)
    got = [
        tuple(r)
        for r in uncertainty_batch(
            df, k=30, target=1.0, block_col="blk", per_block=8
        ).collect()
    ]
    sql = uncertainty_batch_sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')",
        target=1.0,
        k=30,
        block_col="blk",
        per_block=8,
    )
    exp = [tuple(r) for r in _dd.sql(sql).fetchall()]
    assert got == exp
    # quota: no block contributes more than per_block pairs
    from collections import Counter

    assert max(Counter(g[2] for g in got).values()) <= 8
    # ranks are 1..k dense
    assert [g[-1] for g in got] == list(range(1, len(got) + 1))


def test_uncertainty_batch_salt_invariant(spark):
    from bigmatch_utilities_spark.operators.review_sample import (
        uncertainty_batch,
    )

    rows = [(i, 100 + i, float((i * 7) % 13) - 6) for i in range(200)]
    df = spark.createDataFrame(rows, "id_l long, id_r long, weight double")
    a = [tuple(r) for r in uncertainty_batch(df, k=20, salt_buckets=1).collect()]
    b = [tuple(r) for r in uncertainty_batch(df, k=20, salt_buckets=128).collect()]
    assert a == b
