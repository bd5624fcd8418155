"""Posterior probability, cutoff suggestion, weight histogram."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.cutoffs import (
    match_probability,
    match_probability_sql,
    suggest_cutoffs,
    weight_cutoff_for,
    weight_histogram,
    weight_histogram_sql,
)


def test_cutoff_closed_form_inverts_posterior():
    lam = 0.03
    for p in (0.5, 0.9, 0.99):
        w = weight_cutoff_for(p, lam)
        # plug back in: posterior at w must equal p
        post = lam * 2**w / (lam * 2**w + (1 - lam))
        assert post == pytest.approx(p, abs=1e-12)


def test_suggest_cutoffs_ordering_and_semantics():
    acc, rev = suggest_cutoffs(0.05, p_accept=0.99, p_review=0.5)
    assert acc > rev
    # at λ=0.5 the prior term vanishes: w*(p) = log2 odds of p
    acc2, rev2 = suggest_cutoffs(0.5, 0.99, 0.5)
    assert rev2 == pytest.approx(0.0, abs=1e-12)
    assert acc2 == pytest.approx(math.log2(99), abs=1e-12)


def test_posterior_column_matches_scalar(spark):
    lam = 0.05
    df = spark.createDataFrame([(w,) for w in (-4.0, 0.0, 2.5, 8.0)], "w double")
    got = df.select(match_probability("w", lam).alias("p")).collect()
    for r, w in zip(got, (-4.0, 0.0, 2.5, 8.0)):
        want = lam * 2**w / (lam * 2**w + 1 - lam)
        assert r.p == pytest.approx(want, abs=1e-12)


def test_histogram_bins_and_duckdb_parity(spark, tmp_path):
    rows = [(i, float(-3.0 + i * 0.37)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, weight double")
    p = str(tmp_path / "w.parquet")
    df.write.mode("overwrite").parquet(p)

    out = weight_histogram(df, "weight", bin_width=0.5, lam=0.1)
    got = {r.bin: r for r in out.collect()}
    assert sum(r.n_pairs for r in got.values()) == 40
    for b, r in got.items():
        assert b * 0.5 <= r.w_min <= r.w_max < (b + 1) * 0.5

    sql = weight_histogram_sql(
        f"SELECT * FROM read_parquet('{p}/*.parquet')", "weight", 0.5, 0.1
    )
    duck = duckdb.connect().execute(sql).fetchall()
    assert sorted(tuple(r) for r in out.collect()) == sorted(tuple(r) for r in duck)


# ---------------------------------------------------------------------------
# Otsu unsupervised cutoff
# ---------------------------------------------------------------------------


def _bimodal_df(spark):
    """Two clean weight modes: non-matches around -8..-4, matches 6..10."""
    rows = [(i, -8.0 + (i % 9) * 0.5) for i in range(300)] + [
        (1000 + i, 6.0 + (i % 9) * 0.5) for i in range(60)
    ]
    return spark.createDataFrame(rows, "pair_id long, weight double")


def test_otsu_splits_the_bimodal_valley(spark):
    from bigmatch_utilities_spark.operators.cutoffs import otsu_cutoff

    r = otsu_cutoff(_bimodal_df(spark), "weight", bin_width=0.5).collect()
    assert len(r) == 1
    row = r[0]
    # the threshold must land strictly between the modes
    assert -4.0 < row.cutoff_weight < 6.5
    assert row.n_below == 300 and row.n_above == 60


def test_otsu_matches_duckdb_oracle(spark, tmp_path):
    from bigmatch_utilities_spark.operators.cutoffs import (
        otsu_cutoff,
        otsu_cutoff_sql,
    )

    df = _bimodal_df(spark)
    path = str(tmp_path / "w.parquet")
    df.write.mode("overwrite").parquet(path)
    got = [tuple(r) for r in otsu_cutoff(df, "weight", bin_width=0.5).collect()]
    sql = otsu_cutoff_sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')", "weight", 0.5
    )
    exp = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == exp


def test_otsu_single_bin_yields_no_split(spark):
    from bigmatch_utilities_spark.operators.cutoffs import otsu_cutoff

    df = spark.createDataFrame(
        [(i, 1.1) for i in range(10)], "pair_id long, weight double"
    )
    assert otsu_cutoff(df, "weight", bin_width=0.5).count() == 0


def test_otsu_partitioning_invariant(spark):
    from bigmatch_utilities_spark.operators.cutoffs import otsu_cutoff

    df = _bimodal_df(spark)
    a = [tuple(r) for r in otsu_cutoff(df.coalesce(1), "weight").collect()]
    b = [tuple(r) for r in otsu_cutoff(df.repartition(16), "weight").collect()]
    assert a == b and len(a) == 1


def test_fs_optimal_rule_designations_and_parity(spark):
    import random

    import duckdb

    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.cutoffs import (
        fs_optimal_rule,
        fs_optimal_rule_sql,
    )

    rng = random.Random(3)
    rows = []
    for i in range(600):
        dup = rng.random() < 0.2
        a = f"n{rng.randint(0, 40)}"
        b = a if dup or rng.random() < 0.1 else f"n{rng.randint(0, 40)}"
        c1 = f"c{rng.randint(0, 5)}"
        c2 = c1 if dup or rng.random() < 0.3 else f"c{rng.randint(0, 5)}"
        s1 = f"s{rng.randint(0, 2)}"
        s2 = s1 if dup or rng.random() < 0.4 else f"s{rng.randint(0, 2)}"
        rows.append((i, i + 10_000, a, b, c1, c2, s1, s2))
    df = spark.createDataFrame(
        rows,
        "id_l long, id_r long, rec_nm string, mem_nm string, "
        "rec_ct string, mem_ct string, rec_src string, mem_src string",
    )
    fields = (
        MatchField(name="nm", comparator="c", m=0.9, u=0.1),
        MatchField(name="ct", comparator="c", m=0.9, u=0.3),
        MatchField(name="src", comparator="c", m=0.9, u=0.4),
    )
    got = fs_optimal_rule(df, fields, mu=0.02, fnr_lambda=0.05).toPandas()
    assert len(got) == 8  # full 2^3 lattice
    # weights strictly order the designations: every link weight above
    # every clerical weight, every clerical above every nonlink
    by = {d: list(got[got.designation == d].weight) for d in set(got.designation)}
    assert "link" in by and "nonlink" in by
    if "clerical" in by:
        assert min(by["link"]) > max(by["clerical"]) > min(by["clerical"]) >= max(
            by["nonlink"]
        ) or min(by["clerical"]) > max(by["nonlink"])
    # the all-agree pattern must be the top-ranked link
    top = got.sort_values("weight", ascending=False).iloc[0]
    assert (top.g_nm, top.g_ct, top.g_src) == (1, 1, 1)
    assert top.designation == "link"

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW p AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {j}, '{a}', '{b}', '{c}', '{d}', '{e}', '{f}')"
            for i, j, a, b, c, d, e, f in rows
        )
        + ") t(id_l, id_r, rec_nm, mem_nm, rec_ct, mem_ct, rec_src, mem_src)"
    )
    want = con.sql(
        fs_optimal_rule_sql("SELECT * FROM p", fields, mu=0.02, fnr_lambda=0.05)
    ).df()
    key = ["g_nm", "g_ct", "g_src"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.designation.tolist() == want.designation.tolist()
    assert got.n_pairs.astype(int).tolist() == want.n_pairs.astype(int).tolist()
    for c in ("weight", "p_m", "p_u", "cum_fmr", "cum_fnr"):
        for g, w in zip(got[c], want[c]):
            assert g == pytest.approx(w, abs=2e-6), (c, g, w)
