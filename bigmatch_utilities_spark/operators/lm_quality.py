"""Character-bigram language-model perplexity scoring with CCNet-style
head/middle/tail quality buckets — exact cross-engine oracle.

CCNet (Wenzek et al., LREC 2020) ranks every web document by the
perplexity of a language model and keeps the low-perplexity "head" (and
optionally "middle") tertiles as training data; Gopher and LLaMA reuse
the same recipe. The model there is KenLM; the distributed-trainable
equivalent that needs no external artifacts is a character-bigram LM
trained on the corpus itself: fluent text re-uses the corpus's common
character transitions (low NLL), while mojibake, base64 blobs, and
minified code sit in the tail.

    P(b | a) = c(ab) / c(a·)         (c(a·) = bigrams starting with a)
    nll(doc) = mean over bigram instances of -ln P(b|a)

Oracle discipline (the classify.py / tfidf lesson): -ln P is computed as
L(c(a·)) - L(c(ab)) with L(n) = round(ln(n)·1e6) integer micro-nats, the
per-document mean is INTEGER division (Spark `DIV` == DuckDB `//` on
non-negative operands), and bucket assignment is integer rank
arithmetic — every emitted value is exactly reproducible on both
engines.

Bucket assignment does NOT use a global-sort ntile: the global rank
comes from operators/sorted_neighborhood.with_global_rank (range
repartition + O(P) offsets frame), and bucket = ((rank-1)·3) DIV n —
the ntile formula — so the plan scales to 10^10 documents while the
DuckDB twin uses a plain row_number() with the identical formula.

Scale: bigram explode is map-only; the model is two map-side-combined
groupBys over ≤ |alphabet|² groups, broadcast to the scoring join; the
only shuffles touching data are the per-doc aggregate and the range
repartition for the rank. Documents whose normalized text has < 2 chars
yield no bigrams and are excluded (documented; they carry no transition
evidence).

Reference parity: no LM scoring in the reference; extends the curation
set (quality_score heuristics, ta_repetition, run_curate stages) with
the trainable perplexity filter those pipelines standardized on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classify import _L, _L_sql
from .sorted_neighborhood import with_global_rank
from .winnow import _norm, _norm_sql

_BUCKETS = ["head", "middle", "tail"]


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, g) — exploded char bigrams of the normalized text."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    staged = df.select(
        F.col(id_col).alias("doc_id"), _norm(F.col(text_col)).alias("_t")
    )
    t = F.col("_t")
    n = F.length(t) - 1
    grams = F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))
    # explode_OUTER + null drop: a plain explode lets
    # InferFiltersFromGenerate re-inline the normalization chain into a
    # per-row size() filter (the winnow.py discipline)
    return (
        staged.withColumn("_g", grams)
        .select("doc_id", F.explode_outer("_g").alias("g"))
        .filter(F.col("g").isNotNull())
    )


def lm_nll(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_handle: list | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, nll_micro_avg) — mean integer micro-nat NLL of
    each document under the corpus-trained char-bigram LM.

    The exploded bigram frame feeds the model AND the scoring pass; pass
    `cache_handle` (dedup.lsh_cache convention) to persist it once.
    """
    big = _bigrams(df, text_col, id_col)
    if cache_handle is not None:
        big = big.persist()
        cache_handle.append(big)
    c2 = big.groupBy("g").agg(F.count(F.lit(1)).alias("_n2"))
    c1 = c2.groupBy(F.substring("g", 1, 1).alias("_a")).agg(
        F.sum("_n2").alias("_n1")
    )
    model = (
        c2.withColumn("_a", F.substring("g", 1, 1))
        # c1 is <= |alphabet| rows — without relation stats Spark would
        # plan a SortMergeJoin here; broadcast it explicitly
        .join(F.broadcast(c1), "_a")
        .select("g", (_L(F.col("_n1")) - _L(F.col("_n2"))).alias("_nllq"))
    )
    doc = big.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("_c"))
    return (
        doc.join(F.broadcast(model), "g")
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.sum(F.col("_c") * F.col("_nllq")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("CAST(_s DIV n_bigrams AS BIGINT)").alias("nll_micro_avg"),
        )
    )


def lm_quality_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_handle: list | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, nll_micro_avg, bucket) — CCNet tertiles:
    'head' = lowest-NLL third (keep), 'middle', 'tail' (drop)."""
    per = lm_nll(
        df, text_col=text_col, id_col=id_col, cache_handle=cache_handle
    )
    ranked = with_global_rank(
        per, ["nll_micro_avg", "doc_id"], out_col="_rnk"
    )
    tot = per.agg(F.count(F.lit(1)).alias("_tot"))
    b = F.expr("CAST(((_rnk - 1) * 3) DIV _tot AS INT)")
    bucket = (
        F.when(b == 0, F.lit(_BUCKETS[0]))
        .when(b == 1, F.lit(_BUCKETS[1]))
        .otherwise(F.lit(_BUCKETS[2]))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("doc_id", "n_bigrams", "nll_micro_avg", bucket.alias("bucket"))
    )


def lm_quality_buckets_sql(
    table: str, *, text_expr: str = "text", id_expr: str = "doc_id"
) -> str:
    """DuckDB twin of lm_quality_buckets — identical normalization,
    integer micro-nat model, integer mean, and ntile formula."""
    return f"""
WITH lm_big AS MATERIALIZED (
  SELECT doc_id, unnest(list_transform(range(1, greatest(length(_t), 1)),
                        i -> substring(_t, CAST(i AS INT), 2))) AS g
  FROM (SELECT {id_expr} AS doc_id, {_norm_sql(text_expr)} AS _t FROM {table})
),
lm_c2 AS (SELECT g, count(*) AS _n2 FROM lm_big GROUP BY g),
lm_c1 AS (
  SELECT substring(g, 1, 1) AS _a, SUM(_n2) AS _n1 FROM lm_c2 GROUP BY 1
),
lm_model AS (
  SELECT g, {_L_sql("_n1")} - {_L_sql("_n2")} AS _nllq
  FROM lm_c2 JOIN lm_c1 ON substring(g, 1, 1) = _a
),
lm_doc AS (
  SELECT doc_id, g, count(*) AS _c FROM lm_big GROUP BY doc_id, g
),
lm_per AS (
  SELECT doc_id,
         CAST(SUM(_c) AS BIGINT) AS n_bigrams,
         CAST(SUM(_c * _nllq) // SUM(_c) AS BIGINT) AS nll_micro_avg
  FROM lm_doc JOIN lm_model USING (g)
  GROUP BY doc_id
),
lm_rank AS (
  SELECT doc_id, n_bigrams, nll_micro_avg,
         row_number() OVER (ORDER BY nll_micro_avg, doc_id) AS _rnk,
         count(*) OVER () AS _tot
  FROM lm_per
)
SELECT doc_id, n_bigrams, nll_micro_avg,
       CASE CAST(((_rnk - 1) * 3) // _tot AS INT)
            WHEN 0 THEN '{_BUCKETS[0]}'
            WHEN 1 THEN '{_BUCKETS[1]}'
            ELSE '{_BUCKETS[2]}' END AS bucket
FROM lm_rank
"""


__all__ = ["lm_nll", "lm_quality_buckets", "lm_quality_buckets_sql"]
