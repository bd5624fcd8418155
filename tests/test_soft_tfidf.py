"""Soft TF-IDF: identity, fuzzy-token credit vs exact cosine, theta
gate, asymmetry, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.tfidf_sim import (
    soft_tfidf_pairs,
    soft_tfidf_pairs_sql,
    tfidf_cosine_pairs,
    tfidf_postings,
    tfidf_postings_cte_sql,
)


def _corpus(spark):
    rows = [
        (1, "jonathan smith engineering"),
        (2, "jonathon smith engineering"),   # typo'd twin of 1
        (3, "maria garcia physics"),
        (4, "unrelated words entirely here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, t string")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_l long, id_r long")


def test_identity_scores_one(spark):
    post = tfidf_postings(_corpus(spark), "t", "doc_id")
    got = {
        (r.id_l, r.id_r): r.soft_tfidf
        for r in soft_tfidf_pairs(post, _pairs(spark, [(1, 1)])).collect()
    }
    assert got[(1, 1)] == 1.0


def test_fuzzy_token_beats_exact_cosine(spark):
    df = _corpus(spark)
    post = tfidf_postings(df, "t", "doc_id")
    p = _pairs(spark, [(1, 2)])
    soft = soft_tfidf_pairs(post, p, theta=0.85).collect()[0].soft_tfidf
    hard = tfidf_cosine_pairs(post, p).collect()[0].cosine
    # cosine only credits smith/engineering; soft also credits
    # jonathan~jonathon at jw ~ 0.97
    assert soft > hard
    assert soft > 0.9


def test_theta_gates_weak_matches(spark):
    df = _corpus(spark)
    post = tfidf_postings(df, "t", "doc_id")
    p = _pairs(spark, [(3, 4)])
    # no token pair between 3 and 4 clears 0.9 -> pair dropped entirely
    assert soft_tfidf_pairs(post, p, theta=0.9).count() == 0


def test_asymmetric_directions_differ(spark):
    rows = [
        (1, "smith"),
        (2, "smith smithe extra tokens beyond"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    post = tfidf_postings(df, "t", "doc_id")
    ab = soft_tfidf_pairs(post, _pairs(spark, [(1, 2)]), theta=0.85).collect()
    ba = soft_tfidf_pairs(post, _pairs(spark, [(2, 1)]), theta=0.85).collect()
    # left tokens seek right partners: 1->2 credits smith fully; 2->1
    # credits smith AND smithe (both find a partner) but the unmatched
    # right-side mass differs only through the norms — directions diverge
    assert ab[0].soft_tfidf != ba[0].soft_tfidf


def test_oracle_parity(spark, tmp_path):
    df = _corpus(spark)
    pq = str(tmp_path / "d.parquet")
    df.write.mode("overwrite").parquet(pq)
    post = tfidf_postings(df, "t", "doc_id")
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (1, 1)]
    got = sorted(
        tuple(r)
        for r in soft_tfidf_pairs(
            post, _pairs(spark, pairs), theta=0.80
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    pairs_sql = " UNION ALL ".join(
        f"SELECT {l} AS id_l, {r} AS id_r" for l, r in pairs
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            soft_tfidf_pairs_sql(
                tfidf_postings_cte_sql("d", "t", "doc_id").strip(),
                pairs_sql,
                theta=0.80,
            )
        ).fetchall()
    )
    assert got == want
    assert len(got) >= 2  # (1,1) identity and the (1,2) twin survive
