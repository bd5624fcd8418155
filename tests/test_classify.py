"""Multinomial Naive Bayes: learnability on separable vocab, integer
score arithmetic, cross-engine parity, and plan hygiene."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.classify import (
    nb_confusion,
    nb_confusion_sql,
    nb_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _sep_corpus():
    # fully separable vocabularies -> a working classifier must be exact
    rows = []
    for i in range(40):
        rows.append((2 * i, f"alpha beta gamma token{i % 5}", "aa"))
        rows.append((2 * i + 1, f"delta epsilon zeta token{i % 5}", "bb"))
    return rows


def test_nb_learns_separable_vocab(spark):
    rows = _sep_corpus()
    df = _docs(spark, rows)
    train = df.filter(F.col("doc_id") % 4 < 2)
    test = df.filter(F.col("doc_id") % 4 >= 2)
    conf = {
        (r.label_true, r.label_pred): r.n_docs
        for r in nb_confusion(train, test).collect()
    }
    # zero off-diagonal mass: the shared token{i} appears in both classes,
    # the class-specific words dominate
    assert all(t == p for (t, p) in conf)
    assert sum(conf.values()) == test.count()


def test_nb_scores_are_integers_and_monotone(spark):
    df = _docs(spark, _sep_corpus())
    sc = nb_scores(df, df).collect()
    assert all(isinstance(r.score, int) for r in sc)
    # for each doc the true label strictly outscores the other
    by_doc = {}
    for r in sc:
        by_doc.setdefault(r.doc_id, {})[r.label] = (r.score, r.label_true)
    for doc, d in by_doc.items():
        (sa, t) = d["aa"]
        (sb, _) = d["bb"]
        assert (sa > sb) == (t == "aa")


def test_nb_oracle_parity(spark, tmp_path):
    df = _docs(spark, _sep_corpus() + [(1000, "alpha delta shared", "aa")])
    pq = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(
        tuple(r)
        for r in nb_confusion(
            df.filter(F.col("doc_id") % 2 == 0), df.filter(F.col("doc_id") % 2 == 1)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(nb_confusion_sql("documents")).fetchall())
    assert got == want


def test_nb_empty_text_docs_skipped(spark):
    rows = _sep_corpus() + [(501, "   ", "aa"), (503, "", "bb")]
    df = _docs(spark, rows)
    conf = nb_confusion(
        df.filter(F.col("doc_id") % 2 == 0), df.filter(F.col("doc_id") % 2 == 1)
    )
    # zero-token docs produce no prediction row (documented)
    n_pred = conf.agg(F.sum("n_docs")).collect()[0][0]
    assert n_pred == df.filter((F.col("doc_id") % 2 == 1)).count() - 2


def test_nb_plan_broadcasts_model_no_global_sort(spark):
    df = _docs(spark, _sep_corpus())
    plan = nb_confusion(
        df.filter(F.col("doc_id") % 2 == 0), df.filter(F.col("doc_id") % 2 == 1)
    )._jdf.queryExecution().executedPlan().toString()
    # the model joins are broadcast (the big table is only streamed) and
    # the only window partitions by doc_id — no global sort anywhere
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial_" in plan.lower() or "HashAggregate" in plan
