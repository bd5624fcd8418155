"""Exact set-similarity join (prefix filter): recall guarantee vs brute
force, threshold-edge exactness, oracle parity, and plan shape."""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from bigmatch_utilities_spark.operators.setsim import (
    jaccard_prefix_join,
    jaccard_prefix_join_sql,
    token_sets,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta zeta"),          # J(1,2) = 4/6 = 0.667
    (3, "alpha beta gamma delta epsilon"),        # J(1,3) = 1.0
    (4, "totally unrelated words here now"),
    (5, "alpha beta"),                            # short: length filter prunes
    (6, "gamma delta epsilon beta alpha"),        # same set as 1, re-ordered
    (7, ""),                                      # empty: no tokens
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _brute(con, table_rows, t_num, t_den):
    con.execute("DROP TABLE IF EXISTS bf_docs")
    con.execute("CREATE TABLE bf_docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO bf_docs VALUES (?, ?)", table_rows)
    return con.sql(f"""
WITH t AS (SELECT DISTINCT doc_id AS id,
        unnest(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9'']+'),
               x -> x <> '')) AS tok FROM bf_docs),
n AS (SELECT id, count(*) AS n FROM t GROUP BY id),
i AS (SELECT a.id AS id_l, b.id AS id_r, count(*) AS inter
      FROM t a JOIN t b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2)
SELECT i.id_l, i.id_r FROM i
JOIN n nl ON nl.id = i.id_l JOIN n nr ON nr.id = i.id_r
WHERE inter * {t_den} >= {t_num} * (nl.n + nr.n - inter)
""").df()


def test_exact_pairs_and_threshold_edge(spark):
    """J=1.0 and the exactly-at-threshold pair are found; below-threshold
    and length-incompatible pairs are not."""
    res = jaccard_prefix_join(
        _docs(spark), "text", "doc_id", t_num=2, t_den=3
    )
    pairs = {(r["id_l"], r["id_r"]): r["jaccard"] for r in res.collect()}
    assert pairs[(1, 3)] == 1.0
    assert pairs[(1, 6)] == 1.0            # order-insensitive (set semantics)
    # J(1,2) = 4/6 lands EXACTLY on t = 2/3: integer filter must include it
    assert (1, 2) in pairs
    assert round(pairs[(1, 2)], 6) == round(4 / 6, 6)
    assert (1, 4) not in pairs
    assert (1, 5) not in pairs             # |{alpha,beta}| too short for 2/3
    assert all(7 not in p for p in pairs)  # empty doc never pairs


def test_recall_guarantee_randomized(spark):
    """Property: on random token sets, the prefix join finds EXACTLY the
    brute-force pair set at several thresholds (no false negatives — the
    prefix-filter theorem — and no extras after verification)."""
    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(1, 14))))
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    for t_num, t_den in [(1, 2), (6, 10), (4, 5)]:
        got = {
            (r["id_l"], r["id_r"])
            for r in jaccard_prefix_join(
                df, "text", "doc_id", t_num=t_num, t_den=t_den
            ).collect()
        }
        bf = _brute(con, rows, t_num, t_den)
        want = set(zip(bf.id_l, bf.id_r))
        assert got == want, f"t={t_num}/{t_den}: missing={want - got} extra={got - want}"


def test_oracle_parity(spark):
    """Spark and the DuckDB twin produce identical rows (values incl. the
    6dp jaccard) on a generated corpus."""
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(2, 12))))
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sp = (
        jaccard_prefix_join(df, "text", "doc_id", t_num=6, t_den=10)
        .toPandas()
        .sort_values(["id_l", "id_r"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    dk = (
        con.sql(jaccard_prefix_join_sql("docs", "text", "doc_id",
                                        t_num=6, t_den=10))
        .df()
        .sort_values(["id_l", "id_r"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sp.astype("float64"), dk[sp.columns].astype("float64")
    )


def test_token_sets_are_sets(spark):
    df = spark.createDataFrame([(1, "a a a b B b")], ["doc_id", "text"])
    rows = token_sets(df, "text", "doc_id").collect()
    assert sorted(r["tok"] for r in rows) == ["a", "b"]


def test_prefix_join_plan_no_cartesian(spark):
    """The candidate stage must be an equi-join on tok (hash-partitionable),
    never a cartesian/broadcast-nested-loop."""
    plan = jaccard_prefix_join(
        _docs(spark), "text", "doc_id", t_num=6, t_den=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
