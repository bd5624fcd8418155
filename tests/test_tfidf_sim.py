"""TF-IDF cosine: rare-token dominance, integer determinism across
parallelism, DuckDB oracle parity."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.tfidf_sim import (
    tfidf_cosine_pairs,
    tfidf_postings,
    tfidf_postings_cte_sql,
)

DOCS = [
    (1, "acme gutierrez llc filing report"),
    (2, "acme gutierrez llc annual report"),
    (3, "acme smith llc annual report"),
    (4, "the the the the common words"),
    (5, "gutierrez gutierrez gutierrez rare heavy"),
]
PAIRS = [(1, 2), (1, 3), (1, 4), (1, 5)]


def _setup(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = spark.createDataFrame(PAIRS, ["id_l", "id_r"])
    return docs, pairs


def test_rare_token_dominates(spark):
    docs, pairs = _setup(spark)
    post = tfidf_postings(docs, "text", "doc_id")
    cos = {
        (r["id_l"], r["id_r"]): r["cosine"]
        for r in tfidf_cosine_pairs(post, pairs).collect()
    }
    # sharing GUTIERREZ (rare) outranks swapping it for SMITH
    assert cos[(1, 2)] > cos[(1, 3)]
    # no token overlap → absent or ~0
    assert cos.get((1, 4), 0.0) == 0.0
    assert 0.0 < cos[(1, 5)] < 1.0


def test_max_df_prunes_stopwords(spark):
    docs, _ = _setup(spark)
    post = tfidf_postings(docs, "text", "doc_id", max_df=2)
    toks = {r["tok"] for r in post.select("tok").distinct().collect()}
    assert "report" not in toks and "llc" not in toks  # df=3
    assert "annual" in toks  # df=2
    assert "smith" in toks  # df=1


def test_oracle_parity(spark, tmp_path):
    docs, pairs = _setup(spark)
    pq = str(tmp_path / "docs.parquet")
    docs.write.parquet(pq)
    post = tfidf_postings(docs, "text", "doc_id")
    got = {
        (r["id_l"], r["id_r"]): r["cosine"]
        for r in tfidf_cosine_pairs(post, pairs).collect()
    }
    con = duckdb.connect()
    con.sql(f"create view d as select * from '{pq}/*.parquet'")
    cte = tfidf_postings_cte_sql("d", "text", "doc_id")
    pairs_sql = " UNION ALL ".join(
        f"SELECT {a} AS id_l, {b} AS id_r" for a, b in PAIRS
    )
    q = f"""
    WITH {cte},
    prs AS ({pairs_sql}),
    norms AS (SELECT id, sum(w*w) n2 FROM ti_postings GROUP BY id),
    dots AS (
      SELECT p.id_l, p.id_r, sum(l.w * r.w) dot
      FROM prs p
      JOIN ti_postings l ON l.id = p.id_l
      JOIN ti_postings r ON r.id = p.id_r AND r.tok = l.tok
      GROUP BY 1, 2)
    SELECT d.id_l, d.id_r, round(d.dot / (sqrt(nl.n2) * sqrt(nr.n2)), 6)
    FROM dots d JOIN norms nl ON nl.id = d.id_l JOIN norms nr ON nr.id = d.id_r
    """
    want = {(r[0], r[1]): r[2] for r in con.sql(q).fetchall()}
    assert got == want


def test_postings_integer_and_deterministic(spark):
    docs, _ = _setup(spark)
    a = sorted(
        tuple(r) for r in tfidf_postings(docs, "text", "doc_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in tfidf_postings(docs.repartition(7), "text", "doc_id").collect()
    )
    assert a == b
    assert all(isinstance(t[2], int) for t in a)
