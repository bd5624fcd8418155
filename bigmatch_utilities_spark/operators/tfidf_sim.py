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


JW_SCALE = 1_000_000  # soft-TF-IDF: Jaro-Winkler micro-unit quantization


def soft_tfidf_pairs(
    postings: DataFrame,
    pairs: DataFrame,
    *,
    theta: float = 0.90,
    cache_handle: list | None = None,
) -> DataFrame:
    """Soft TF-IDF (Cohen, Ravikumar & Fienberg, IIWeb 2003) for
    candidate `pairs`: (id_l, id_r, soft_tfidf).

    Plain TF-IDF cosine requires EXACT token equality — "jonathon" earns
    nothing against "jonathan". Soft TF-IDF relaxes the match: every
    left token is credited with its best Jaro-Winkler partner (>= theta)
    on the right, weighted by both tokens' TF-IDF weights:

        soft(S,T) = sum_{w in S, max_jw >= theta}
                        V(w,S) * V(argmax,T) * max_jw

    This was the best-performing string metric in the original secondary
    -string-metrics study and remains the standard hybrid comparator.

    Determinism discipline: jw is quantized to integer micro-units at
    the source (round(jw * 1e6) — the kernel is pinned equal to DuckDB's
    jaro_winkler_similarity in tests/test_comparators.py), the per-token
    argmax breaks ties (jw DESC, token ASC), and the weighted sum is
    INTEGER (DECIMAL(38,0) — terms reach w*w*1e6 ~ 1e18); the one float
    division by (norm_l * norm_r * 1e6) happens last, rounded 6dp.

    Direction: the left side's tokens seek partners on the right (the
    original definition is asymmetric); emit both orientations and
    average if a symmetric score is needed. Pairs where NO token pair
    clears theta are dropped (inner joins) — absence of evidence, not a
    zero score.

    Scale: the token-pair frame is |S|x|T| per candidate pair — this is
    a FIELD comparator (names, titles, 32-char prefixes), not a
    whole-document one; the Arrow JW kernel is the only Python boundary,
    and the argmax is a map-side-combined min(struct) aggregate, never a
    window. Pass `cache_handle` to persist postings across its three
    consumers."""
    from bigmatch_utilities_spark.functions.comparators import jaro_winkler

    if cache_handle is not None:
        postings = postings.persist()
        cache_handle.append(postings)
    theta_q = int(round(theta * JW_SCALE))
    norms = postings.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    pl = postings.select(
        F.col("id").alias("id_l"), F.col("tok").alias("_tl"), F.col("w").alias("_wl")
    )
    pr = postings.select(
        F.col("id").alias("id_r"), F.col("tok").alias("_tr"), F.col("w").alias("_wr")
    )
    tp = (
        pairs.join(pl, "id_l")
        .join(pr, "id_r")
        .withColumn(
            "_jq",
            F.round(jaro_winkler(F.col("_tl"), F.col("_tr")) * JW_SCALE, 0).cast(
                "long"
            ),
        )
        .filter(F.col("_jq") >= theta_q)
    )
    best = (
        tp.groupBy("id_l", "id_r", "_tl", "_wl")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_jq")).alias("nq"),
                    F.col("_tr").alias("tr"),
                    F.col("_wr").alias("wr"),
                )
            ).alias("_b")
        )
        .select(
            "id_l",
            "id_r",
            (
                (-F.col("_b.nq"))
                * F.col("_wl").cast("decimal(38,0)")
                * F.col("_b.wr")
            ).alias("_term"),
        )
    )
    dots = best.groupBy("id_l", "id_r").agg(F.sum("_term").alias("_s"))
    return (
        dots.join(
            norms.withColumnRenamed("id", "id_l").withColumnRenamed("n2", "n2_l"),
            "id_l",
        )
        .join(
            norms.withColumnRenamed("id", "id_r").withColumnRenamed("n2", "n2_r"),
            "id_r",
        )
        .select(
            "id_l",
            "id_r",
            F.round(
                F.col("_s").cast("double")
                / (
                    F.sqrt(F.col("n2_l"))
                    * F.sqrt(F.col("n2_r"))
                    * F.lit(float(JW_SCALE))
                ),
                6,
            ).alias("soft_tfidf"),
        )
    )


def soft_tfidf_pairs_sql(
    postings_cte: str,
    pairs_sql: str,
    *,
    theta: float = 0.90,
) -> str:
    """DuckDB twin of soft_tfidf_pairs. `postings_cte` is the CTE chain
    from tfidf_postings_cte_sql (ends in ti_postings); `pairs_sql`
    selects (id_l, id_r). Identical quantization, argmax tie-break,
    integer sum, and final division."""
    theta_q = int(round(theta * JW_SCALE))
    return f"""
WITH {postings_cte},
so_norms AS (
  SELECT id, SUM(w * w) AS n2 FROM ti_postings GROUP BY id
),
so_tp AS (
  SELECT p.id_l, p.id_r, l.tok AS _tl, l.w AS _wl, r.tok AS _tr, r.w AS _wr,
         CAST(round(jaro_winkler_similarity(l.tok, r.tok) * {JW_SCALE}, 0)
              AS BIGINT) AS _jq
  FROM ({pairs_sql}) p
  JOIN ti_postings l ON l.id = p.id_l
  JOIN ti_postings r ON r.id = p.id_r
),
so_best AS (
  SELECT id_l, id_r, _tl, _wl, _tr, _wr, _jq FROM (
    SELECT *, row_number() OVER (PARTITION BY id_l, id_r, _tl
                                 ORDER BY _jq DESC, _tr ASC) AS _rn
    FROM so_tp WHERE _jq >= {theta_q}
  ) WHERE _rn = 1
),
so_dot AS (
  SELECT id_l, id_r,
         SUM(CAST(_jq AS HUGEINT) * _wl * _wr) AS _s
  FROM so_best GROUP BY id_l, id_r
)
SELECT d.id_l, d.id_r,
       round(CAST(d._s AS DOUBLE)
             / (sqrt(nl.n2) * sqrt(nr.n2) * {float(JW_SCALE)!r}), 6)
         AS soft_tfidf
FROM so_dot d
JOIN so_norms nl ON nl.id = d.id_l
JOIN so_norms nr ON nr.id = d.id_r
"""
