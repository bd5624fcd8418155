"""Ordinal comparison levels: indexing, weights, multinomial EM, parity."""

from __future__ import annotations

import math

import duckdb
import pytest

from bigmatch_utilities_spark.operators.levels import (
    ComparisonLevels,
    em_fit_levels,
    estimate_levels,
    estimate_levels_sql,
    level_histogram,
    level_index,
    level_weight,
    levels_pair_weight,
    levels_pair_weight_sql,
)

from pyspark.sql import functions as F


def test_level_index_bands(spark):
    cl = ComparisonLevels(name="x", comparator="e", thresholds=(0.9, 0.5))
    df = spark.createDataFrame(
        [
            ("robert", "robert"),   # exact -> 0
            ("robert", "roberto"),  # e = 1 - 1/7 ~ 0.857 -> band 2 (>=0.5)
            ("robert", "rxbert"),   # e = 1 - 1/6 ~ 0.833 -> band 2
            ("rober",  "robert"),   # e = 1 - 1/6 ~ 0.833 -> band 2
            ("robertt", "robert7"), # e = 1 - 1/7 ~ 0.857 -> band 2
            ("abcdefghij", "abcdefghiX"),  # 0.9 -> band 1
            ("robert", "xavier"),   # low -> disagree 3
            ("", "robert"),         # blank -> -1
            (None, "robert"),       # blank -> -1
        ],
        "l string, r string",
    )
    got = df.select(
        level_index(cl, F.col("l"), F.col("r")).alias("lev")
    ).collect()
    assert [r.lev for r in got] == [0, 2, 2, 2, 2, 1, 3, -1, -1]


def test_level_weight_literals(spark):
    cl = ComparisonLevels(
        name="x",
        comparator="c",
        thresholds=(),
        m=(0.9, 0.1),
        u=(0.1, 0.9),
    )
    ws = cl.weights()
    assert ws[0] == pytest.approx(math.log2(9), abs=1e-6)
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("", "a")], "l string, r string"
    )
    got = [
        r.w
        for r in df.select(
            level_weight(cl, F.col("l"), F.col("r")).alias("w")
        ).collect()
    ]
    assert got[0] == pytest.approx(ws[0])
    assert got[1] == pytest.approx(ws[1])
    assert got[2] == 0.0


def test_em_fit_levels_recovers_planted_mixture():
    # three binary fields (K >= 3 for identifiability of the latent-class
    # mixture); planted: matches agree 90%, non-matches 15%; 5% match rate
    fields = (
        ComparisonLevels(name="a", comparator="c", thresholds=()),
        ComparisonLevels(name="b", comparator="c", thresholds=()),
        ComparisonLevels(name="c", comparator="c", thresholds=()),
    )
    # histogram from exact mixture proportions (10000 pairs, lam=.05)
    lam0, m0, u0 = 0.05, 0.9, 0.15
    hist = []
    for ga in (0, 1):
        for gb in (0, 1):
            for gc in (0, 1):
                pm = 1.0
                pu = 1.0
                for g in (ga, gb, gc):
                    pm *= m0 if g == 0 else 1 - m0
                    pu *= u0 if g == 0 else 1 - u0
                hist.append(
                    ((ga, gb, gc), 10000 * (lam0 * pm + (1 - lam0) * pu))
                )
    lam, m, u = em_fit_levels(hist, fields, n_iter=60)
    assert lam == pytest.approx(lam0, abs=0.01)
    assert m[0][0] == pytest.approx(m0, abs=0.02)
    assert u[0][0] == pytest.approx(u0, abs=0.02)


def test_estimate_levels_duckdb_parity(spark):
    import random

    rng = random.Random(7)
    names = ["robert", "roberto", "maria", "mario", "chen", "chung", ""]
    rows = []
    for i in range(400):
        a = rng.choice(names)
        # half the time the right side is a corruption of the left
        if rng.random() < 0.5:
            b = a[:-1] + "x" if len(a) > 2 else a
        else:
            b = rng.choice(names)
        c = rng.choice(["s1", "s2"])
        d = c if rng.random() < 0.7 else rng.choice(["s1", "s2"])
        rows.append((i, i + 1000, a, b, c, d))
    df = spark.createDataFrame(
        rows,
        "id_l long, id_r long, rec_nm string, mem_nm string, "
        "rec_src string, mem_src string",
    )
    fields = (
        ComparisonLevels(name="nm", comparator="e", thresholds=(0.8,)),
        ComparisonLevels(name="src", comparator="c", thresholds=()),
    )
    got = (
        estimate_levels(df, fields, n_iter=5)
        .toPandas()
        .sort_values(["field", "level"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW p AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {j}, '{a}', '{b}', '{c}', '{d}')"
            for i, j, a, b, c, d in rows
        )
        + ") t(id_l, id_r, rec_nm, mem_nm, rec_src, mem_src)"
    )
    want = (
        con.sql(estimate_levels_sql("SELECT * FROM p", fields, n_iter=5))
        .df()
        .sort_values(["field", "level"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 5
    for c in ("m", "u", "weight", "lam"):
        for g, w in zip(got[c], want[c]):
            assert g == pytest.approx(w, abs=2e-6), (c, g, w)


def test_levels_pair_weight_sql_parity(spark):
    fields = (
        ComparisonLevels(name="nm", comparator="e", thresholds=(0.9, 0.7)),
        ComparisonLevels(name="src", comparator="c", thresholds=()),
    )
    rows = [
        (1, 2, "robert", "robert", "s1", "s1"),
        (3, 4, "robert", "roberto", "s1", "s2"),
        (5, 6, "robert", "xavier", "s2", "s2"),
        (7, 8, "", "robert", "s1", "s1"),
    ]
    df = spark.createDataFrame(
        rows,
        "id_l long, id_r long, rec_nm string, mem_nm string, "
        "rec_src string, mem_src string",
    )
    got = [
        r.w
        for r in df.select(
            F.round(levels_pair_weight(fields), 6).alias("w")
        ).collect()
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW p AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {j}, '{a}', '{b}', '{c}', '{d}')"
            for i, j, a, b, c, d in rows
        )
        + ") t(id_l, id_r, rec_nm, mem_nm, rec_src, mem_src)"
    )
    want = [
        r[0]
        for r in con.sql(
            "SELECT round("
            + levels_pair_weight_sql(fields)
            + ", 6) FROM p ORDER BY id_l"
        ).fetchall()
    ]
    assert got == want


def test_level_histogram_missing_state(spark):
    cl = ComparisonLevels(name="nm", comparator="c", thresholds=())
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("", "b"), (None, None)],
        "rec_nm string, mem_nm string",
    )
    hist = {
        r.g_nm: r.n for r in level_histogram(df, (cl,)).collect()
    }
    assert hist == {-1: 2, 0: 1, 1: 1}


def test_level_fields_declarative_pass(spark):
    from bigmatch_utilities_spark.config import (
        BlockField,
        BlockingPassSpec,
        CutoffSpec,
        FieldRef,
        MatchConfig,
        MatchField,
        write_parmf,
    )
    from bigmatch_utilities_spark.operators.pipeline import run_match

    cl = ComparisonLevels(name="nm", comparator="e", thresholds=(0.8,))
    cfg = MatchConfig(
        passes=(
            BlockingPassSpec(
                block_fields=(BlockField(name="blk"),),
                match_fields=(
                    MatchField(name="src", comparator="c", m=0.8, u=0.2),
                ),
                level_fields=(cl,),
                cutoff=CutoffSpec(hi=3.0, lo=-50.0),
                print_cutoff=CutoffSpec(hi=3.0, lo=-50.0),
            ),
        ),
        id_field=FieldRef(name="id"),
        dedupe_single_file=True,
    )
    # level_fields are an engine extension: parmf must refuse
    with pytest.raises(ValueError, match="level_fields"):
        write_parmf(cfg)
    assert "nm" in cfg.match_field_names()

    df = spark.createDataFrame(
        [
            (1, "b1", "robert", "s1"),
            (2, "b1", "robert", "s1"),   # exact on both -> level 0 + agree
            (3, "b1", "roberto", "s2"),  # band 1 on nm, disagree src
            (4, "b1", "xavier", "s1"),   # disagree nm, agree src
        ],
        "id long, blk string, nm string, src string",
    )
    rows = {
        (r.id_rec, r.id_mem): r
        for r in run_match(df, None, cfg, id_col="id", persist=False)
        .pairs.collect()
    }
    ws = cl.weights()
    src_agree = math.log2(0.8 / 0.2)
    src_dis = math.log2(0.2 / 0.8)
    assert rows[(1, 2)].weight == pytest.approx(src_agree + ws[0], abs=1e-6)
    assert rows[(1, 2)].is_exact
    assert rows[(1, 3)].weight == pytest.approx(src_dis + ws[1], abs=1e-6)
    assert not rows[(1, 3)].is_exact
    assert rows[(1, 4)].weight == pytest.approx(src_agree + ws[-1], abs=1e-6)
