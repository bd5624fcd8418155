"""TF-IDF token-weighted cosine similarity for candidate pairs.

The set-similarity comparators (Jaccard over shingles, SimHash) treat all
tokens equally; record-linkage folklore (and the dedupe/Splink lineage)
says rare tokens should dominate — two records sharing "GUTIERREZ" mean
far more than two sharing "LLC". This operator scores candidate pairs by
the cosine of their TF-IDF token vectors, built entirely from declarative
plans:

1. postings: explode tokens → per-(id, token) term frequency (one shuffle
   on (id, token));
2. document frequency per token from the postings (one shuffle on token),
   N via a 1-row broadcast cross-join (stays lazy — no driver action);
3. weight = tf * (ln((N+1)/(df+1)) + 1), QUANTIZED to a 1e-4-granular
   integer. Everything downstream (dot products, norms) is exact 64-bit
   integer arithmetic, killing the float-summation-order hazard; the only
   floats are one final sqrt/divide on identical integers. Residual
   hazard: the quantization itself rounds ONE float product per posting,
   and JVM Math.log / DuckDB libm ln are each only ~1-ulp accurate — a
   product landing exactly on a .5 rounding edge could quantize w
   off-by-one between engines. Observed never in practice (the bench
   corpus quantizes identically), but cross-engine agreement is
   "exact-given-identical-w", not a hard guarantee on adversarial inputs.
4. pair cosine: join postings to both sides of the candidate pairs on
   token (shuffles bounded by the candidate set, not N²), integer dot
   product, divide by the integer-exact norms.

At 100 TB: postings are linear in corpus tokens; the pair join is linear
in (candidate pairs × shared tokens); nothing is quadratic in N. Hot
tokens ("the") inflate the pair-join only for pairs that share them —
pass `max_df` to drop stopword-grade tokens from the postings (classic
IDF pruning: their weight is near-minimal anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.standardize import (
    _norm_tokens,
    _norm_tokens_sql,
)

SCALE = 10_000  # weight quantization: 1e-4 granularity, overflow-safe norms


def tfidf_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_df: int | None = None,
) -> DataFrame:
    """(id, tok, w) integer-quantized TF-IDF postings of the corpus."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(_norm_tokens(F.col(text_col))).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if max_df:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )
    return tf.join(idf, "tok").select(
        "id",
        "tok",
        F.round(F.col("tf") * F.col("idf") * SCALE, 0).cast("long").alias("w"),
    )


def tfidf_postings_cte_sql(
    table: str, text_expr: str, id_expr: str, *, max_df: int | None = None
) -> str:
    """DuckDB CTE chain ending in `ti_postings(id, tok, w)` — the oracle
    twin of tfidf_postings (value-identical integers)."""
    df_pred = f"HAVING count(*) <= {max_df}" if max_df else ""
    return f"""
ti_toks AS (
  SELECT {id_expr} AS id, unnest({_norm_tokens_sql(text_expr)}) AS tok FROM {table}
),
ti_tf AS (
  SELECT id, tok, count(*) AS tf FROM ti_toks GROUP BY id, tok
),
ti_df AS (
  SELECT tok, count(*) AS df FROM ti_tf GROUP BY tok {df_pred}
),
ti_n AS (SELECT count(*) AS n_docs FROM {table}),
ti_postings AS (
  SELECT id, tok,
         CAST(round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1) * {SCALE}, 0) AS BIGINT) AS w
  FROM ti_tf JOIN ti_df USING (tok) CROSS JOIN ti_n
)"""


def tfidf_cosine_pairs(
    postings: DataFrame, pairs: DataFrame, *, cache_handle: list | None = None
) -> DataFrame:
    """(id_l, id_r, cosine) for candidate `pairs`, scored against the
    integer postings. Pairs with a zero-norm side (no tokens survived) are
    dropped (inner joins). cosine is rounded to 6dp for oracle parity.

    The postings plan feeds the norms and BOTH pair sides (three
    evaluations of the tf/df/idf chain when lazy); pass `cache_handle`
    (dedup.lsh_cache convention) to persist it once — at warehouse scale
    you would materialize postings as a table instead."""
    if cache_handle is not None:
        postings = postings.persist()
        cache_handle.append(postings)
    norms = postings.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    pl = postings.select(F.col("id").alias("id_l"), "tok", F.col("w").alias("w_l"))
    pr = postings.select(F.col("id").alias("id_r"), "tok", F.col("w").alias("w_r"))
    dots = (
        pairs.join(pl, "id_l")
        .join(pr, ["id_r", "tok"])
        .groupBy("id_l", "id_r")
        .agg(F.sum(F.col("w_l") * F.col("w_r")).alias("dot"))
    )
    return (
        dots.join(norms.withColumnRenamed("id", "id_l").withColumnRenamed("n2", "n2_l"), "id_l")
        .join(norms.withColumnRenamed("id", "id_r").withColumnRenamed("n2", "n2_r"), "id_r")
        .select(
            "id_l",
            "id_r",
            F.round(
                F.col("dot") / (F.sqrt(F.col("n2_l")) * F.sqrt(F.col("n2_r"))), 6
            ).alias("cosine"),
        )
    )
