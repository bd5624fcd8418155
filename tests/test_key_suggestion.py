"""suggest_blocking_keys: pre-flight cost × recall comparison of candidate
blocking-key sets (Christen's reduction-ratio / pairs-completeness pair).
Stats side cross-checked against DuckDB via suggest_blocking_keys_sql;
completeness side pinned against a hand-computed truth sample and against
synthdata ground truth."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from bigmatch_utilities_spark.operators.blocking import (
    suggest_blocking_keys,
    suggest_blocking_keys_sql,
)


def test_stats_match_duckdb(spark, tmp_path):
    from bigmatch_utilities_spark.synthdata import repo_files_df

    records = repo_files_df(spark, seed=11, n_clusters=30)
    path = str(tmp_path / "r")
    records.write.parquet(path)
    df = spark.read.parquet(path)

    key_sets = [["lang"], ["repo"], ["lang", "repo"]]
    got = (
        suggest_blocking_keys(df, key_sets, id_col="record_id")
        .toPandas()
        .sort_values("key_set")
        .reset_index(drop=True)
    )
    sql = suggest_blocking_keys_sql(f"SELECT * FROM '{path}/*.parquet'", key_sets)
    exp = duckdb.sql(sql).df().sort_values("key_set").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()].astype(exp.dtypes.to_dict()), exp
    )
    # composite key never blocks MORE pairs than either component
    by = {r.key_set: r.cand_pairs for r in got.itertuples()}
    assert by["lang,repo"] <= min(by["lang"], by["repo"])


def test_completeness_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "NY", "A"),
            (2, "NY", "A"),
            (3, "NY", "B"),
            (4, "LA", None),   # blank zip: excluded from the zip pass
            (5, "LA", "C"),
        ],
        ["record_id", "city", "zip"],
    )
    # truth: (1,2) same city+zip; (3,4) same city only... no — 3 is NY, 4 LA.
    # truth pairs: (1,2) co-blocked by both; (4,5) same city, 4's zip blank;
    # (2,3) same city, different zip.
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (2, 3)], ["id_rec", "id_mem"]
    )
    got = {
        r.key_set: r
        for r in suggest_blocking_keys(
            df, [["city"], ["zip"]], truth, id_col="record_id"
        ).collect()
    }
    assert got["city"].truth_pairs == 3
    assert got["city"].pairs_completeness == 1.0
    # zip co-blocks only (1,2): blank side of (4,5) is a recall LOSS, and
    # (2,3) disagree
    assert abs(got["zip"].pairs_completeness - 1 / 3) < 1e-6  # 6dp-rounded
    # cost side rides along: zip pass excludes the blank row from n_rows
    assert got["zip"].n_rows == 4
    assert got["city"].n_rows == 5


def test_synthdata_truth_ranking(spark):
    """On the synthetic corpus, content_sha co-blocks only exact dups while
    (lang, anchor_line) — the real pass-2 key — catches near-dups too, at
    bounded candidate cost; the suggestion table must expose that order."""
    from bigmatch_utilities_spark.repo_linkage import prepare
    from bigmatch_utilities_spark.synthdata import repo_files_df, true_pairs_pdf

    records = repo_files_df(spark, seed=42, n_clusters=60)
    prepared = prepare(records)
    truth = spark.createDataFrame(
        sorted(true_pairs_pdf(records.toPandas())), ["id_rec", "id_mem"]
    )
    got = {
        r.key_set: r
        for r in suggest_blocking_keys(
            prepared,
            [["content_sha"], ["lang", "anchor_line"]],
            truth,
            id_col="record_id",
        ).collect()
    }
    sha, anchor = got["content_sha"], got["lang,anchor_line"]
    assert anchor.pairs_completeness > sha.pairs_completeness
    assert anchor.pairs_completeness > 0.8
    # and the cost column shows what that recall buys: no mega-block (on
    # this 117-row corpus RR ≈ 0.985; it approaches 1 as N grows)
    assert anchor.reduction_ratio > 0.97
    assert anchor.max_block <= 8


def test_plan_prunes_and_pushes_down(spark, tmp_path):
    """Each key set's scan must read ONLY its key columns with the
    non-null filter pushed to parquet, aggregate map-side, and never
    produce a cartesian product — the properties that make the suggestion
    table a safe pre-flight on the full 100-TB table."""
    spark.createDataFrame(
        [(1, "a", 10, 1.0)], ["record_id", "k1", "k2", "payload"]
    ).write.parquet(str(tmp_path / "t"))
    df = spark.read.parquet(str(tmp_path / "t"))
    out = suggest_blocking_keys(df, [["k1"], ["k1", "k2"]], id_col="record_id")
    qe = out._jdf.queryExecution().toString()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<k1:string>" in qe           # payload pruned
    assert "ReadSchema: struct<k1:string,k2:bigint>" in qe
    assert "IsNotNull(k1)" in qe                           # pushed filter
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan                         # map-side combine


def test_randomized_against_brute_force(spark):
    """Seeded property test: on random frames with nulls/blanks/skew, the
    suggestion table's cand_pairs and pairs_completeness equal a brute-
    force pandas computation of 'pairs co-blocked by the key set'."""
    import itertools

    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(20, 60))
        pdf = pd.DataFrame(
            {
                "record_id": range(n),
                "k1": rng.choice(["a", "b", "c", "", None], n).tolist(),
                "k2": rng.integers(0, 4, n).astype(object).tolist(),
            }
        )
        # random truth sample over distinct id pairs
        ids = list(range(n))
        truth = [
            tuple(sorted(rng.choice(ids, 2, replace=False).tolist()))
            for _ in range(12)
        ]
        df = spark.createDataFrame(pdf.astype({"k2": "Int64"}))
        tdf = spark.createDataFrame(truth, ["id_rec", "id_mem"])
        got = {
            r.key_set: r
            for r in suggest_blocking_keys(
                df, [["k1"], ["k1", "k2"]], tdf, id_col="record_id"
            ).collect()
        }

        def keyval(row, ks):
            vals = []
            for k in ks:
                v = row[k]
                if v is None or (isinstance(v, str) and v.strip() == ""):
                    return None  # blank: excluded from the pass
                vals.append(str(v))
            return tuple(vals)

        rows = pdf.to_dict("records")
        for ks in (["k1"], ["k1", "k2"]):
            label = ",".join(ks)
            keyed = {r["record_id"]: keyval(r, ks) for r in rows}
            included = [i for i in ids if keyed[i] is not None]
            brute_pairs = sum(
                1
                for a, b in itertools.combinations(included, 2)
                if keyed[a] == keyed[b]
            )
            assert got[label].cand_pairs == brute_pairs, (seed, label)
            co = sum(
                1
                for a, b in truth
                if keyed[a] is not None and keyed[a] == keyed[b]
            )
            assert got[label].pairs_completeness == pytest.approx(
                co / len(truth), abs=1e-6
            ), (seed, label)


def test_pass_sequence_greedy_cover(spark):
    from bigmatch_utilities_spark.operators.blocking import (
        suggest_pass_sequence,
    )

    # records: key A covers truth pairs {1-2, 3-4}; key B covers {3-4, 5-6};
    # key C covers only {1-2}. Greedy must pick A first (2 new), then B
    # (1 new: 5-6), then C (0 new) — NOT the individually-2nd-best order.
    rows = [
        # id, a, b, c
        (1, "x", "p", "m"),
        (2, "x", "q", "m"),
        (3, "y", "r", "n"),
        (4, "y", "r", "o"),
        (5, "z", "s", ""),
        (6, "w", "s", None),
    ]
    df = spark.createDataFrame(rows, "record_id long, a string, b string, c string")
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_rec long, id_mem long"
    )
    got = suggest_pass_sequence(
        df, [["a"], ["b"], ["c"]], truth, n_passes=3
    ).collect()
    assert [(r.pass_rank, r.key_set, r.new_covered, r.cum_covered) for r in got] == [
        (0, "a", 2, 2),
        (1, "b", 1, 3),
        (2, "a", 0, 3),  # nothing left: zero-tie breaks to label asc
    ]
    assert got[1].cum_pc == pytest.approx(1.0)


def test_pass_sequence_duckdb_parity(spark):
    import random

    import duckdb

    from bigmatch_utilities_spark.operators.blocking import (
        suggest_pass_sequence,
        suggest_pass_sequence_sql,
    )

    rng = random.Random(5)
    rows = [
        (
            i,
            f"a{rng.randint(0, 4)}",
            f"b{rng.randint(0, 3)}",
            f"c{rng.randint(0, 2)}" if rng.random() > 0.1 else "",
        )
        for i in range(120)
    ]
    truth = [(rng.randint(0, 119), rng.randint(0, 119)) for _ in range(40)]
    df = spark.createDataFrame(rows, "record_id long, a string, b string, c string")
    tdf = spark.createDataFrame(truth, "id_rec long, id_mem long")
    keysets = [["a"], ["b"], ["c"], ["a", "b"]]
    got = (
        suggest_pass_sequence(df, keysets, tdf, n_passes=4)
        .toPandas()
        .sort_values("pass_rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW recs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{a}', '{b}', {'NULL' if c is None else repr(c)})"
            for i, a, b, c in rows
        )
        + ") t(record_id, a, b, c)"
    )
    con.sql(
        "CREATE VIEW tr AS SELECT * FROM (VALUES "
        + ", ".join(f"({x}, {y})" for x, y in truth)
        + ") t(id_rec, id_mem)"
    )
    want = (
        con.sql(
            suggest_pass_sequence_sql(
                "SELECT * FROM recs", keysets, "SELECT * FROM tr", n_passes=4
            )
        )
        .df()
        .sort_values("pass_rank")
        .reset_index(drop=True)
    )
    assert got.key_set.tolist() == want.key_set.tolist()
    assert got.new_covered.astype(int).tolist() == want.new_covered.astype(int).tolist()
    assert got.cum_covered.astype(int).tolist() == want.cum_covered.astype(int).tolist()
    for g, w in zip(got.cum_pc, want.cum_pc):
        assert g == pytest.approx(w, abs=1e-6)
