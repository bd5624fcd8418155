"""Distributed multinomial Naive Bayes text classification with an
exact cross-engine oracle.

A 100 TB curation pipeline needs cheap trainable classifiers — the
fastText-style language-ID / quality filters of CCNet and Gopher are, at
their core, linear models over token counts. Multinomial Naive Bayes is
the counts-only member of that family: training is two groupBy
aggregations (token counts per label, document counts per label) and
scoring is one broadcast join plus one groupBy — no gradient steps, no
driver-side math, mergeable across partitions, so the same plan that
trains on 5k documents trains on 10^10.

Oracle discipline (the tfidf/monge-elkan lesson): every log-likelihood
is quantized to INTEGER micro-nats at the source — L(n) =
CAST(round(ln(n) * 1e6) AS BIGINT) with n an exact integer count — and
all downstream arithmetic (per-token sums, prior and denominator terms,
the argmax) is integer-only, so Spark and DuckDB agree bit-for-bit as
long as their `ln` of the same integer rounds to the same micro-nat.
(`ln` is ~1-ulp on both engines; a disagreement needs the true value to
sit within one ulp of a 0.5e-6 midpoint — the same residual float
hazard documented for tfidf, vanishingly unlikely and detectable by the
hash gate.)

Model (add-one smoothing):
    score(doc, l) = L(docs_l)                          # prior (shared
                    + SUM_t c_t * L(cnt_{l,t} + 1)     #  denominator
                    - n_tok * L(tot_tokens_l + V)      #  dropped)
Unseen (label, token) pairs contribute L(0+1) = 0, so only trained
postings need joining. Prediction is the (score, label)-max row per
document via one per-document window. Documents whose text yields zero
tokens produce no prediction row (documented; they have no multinomial
evidence).

Scale: token explode is map-only; both training aggregations are
map-side-combined groupBys; the model (labels x vocab postings, label
stats, the 1-row vocab size) is broadcast — the big table is only ever
streamed. The per-document window partitions by doc_id (never global).

Reference parity: the reference has no classifier; this extends the
training-data curation set (quality_score, detected_lang heuristics in
operators/textanalysis.py) with the trainable counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textanalysis import _tokens, token_count_sql

MICRO = 1_000_000


def _L(col):
    """Integer micro-nat log: round(ln(x) * 1e6) as BIGINT (x >= 1)."""
    return F.round(F.log(col.cast("double")) * MICRO, 0).cast("long")


def _L_sql(expr: str) -> str:
    return f"CAST(round(ln(CAST(({expr}) AS DOUBLE)) * {MICRO}, 0) AS BIGINT)"


def _tok_list_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower(trim({expr})), "
        f"'[^a-zA-Z0-9'']+'), x -> x <> '')"
    )


def nb_scores(
    train: DataFrame,
    test: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, label_true, label, score) — integer micro-nat NB
    log-likelihood of every trained label for every test document."""
    def toks(df):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("label_true"),
            F.explode_outer(_tokens(F.col(text_col))).alias("_tok"),
        ).filter(F.col("_tok").isNotNull())

    tr, te = toks(train), toks(test)

    postings = (
        tr.groupBy(F.col("label_true").alias("label"), "_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("label", "_tok", _L(F.col("_n") + 1).alias("_l"))
    )
    vocab = tr.select(F.countDistinct("_tok").alias("_v"))
    lab = (
        tr.groupBy(F.col("label_true").alias("label"))
        .agg(F.count(F.lit(1)).alias("_tot"), F.countDistinct("doc_id").alias("_docs"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            _L(F.col("_docs")).alias("_p"),
            _L(F.col("_tot") + F.col("_v")).alias("_d"),
        )
    )

    doc_tok = te.groupBy("doc_id", "label_true", "_tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    doc_tot = doc_tok.groupBy("doc_id", "label_true").agg(
        F.sum("_c").alias("_ntok")
    )
    s = (
        doc_tok.join(F.broadcast(postings), on="_tok")
        .groupBy("doc_id", "label_true", "label")
        .agg(F.sum(F.col("_c") * F.col("_l")).alias("_s"))
    )
    return (
        doc_tot.crossJoin(F.broadcast(lab))
        .join(s, on=["doc_id", "label_true", "label"], how="left")
        .select(
            "doc_id",
            "label_true",
            "label",
            (
                F.col("_p")
                + F.coalesce(F.col("_s"), F.lit(0))
                - F.col("_ntok") * F.col("_d")
            ).alias("score"),
        )
    )


def nb_confusion(
    train: DataFrame,
    test: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """(label_true, label_pred, n_docs) holdout confusion matrix: argmax
    of nb_scores per document, ties broken toward the larger label."""
    sc = nb_scores(
        train, test, text_col=text_col, label_col=label_col, id_col=id_col
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").desc()
    )
    return (
        sc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy(
            F.col("label_true"), F.col("label").alias("label_pred")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def nb_confusion_sql(
    table: str,
    *,
    text_expr: str = "text",
    label_expr: str = "lang",
    id_expr: str = "doc_id",
    train_pred: str = "doc_id % 2 = 0",
    test_pred: str = "doc_id % 2 = 1",
) -> str:
    """DuckDB twin of nb_confusion over a modulus train/test split —
    identical integer micro-nat arithmetic and tie-break.

    `nb_base` is MATERIALIZED: it feeds both the train and test branch,
    and DuckDB's default CTE inlining would re-evaluate the tokenizer
    chain per consumer (the sd_duplicated_spans lesson).
    """
    return f"""
WITH nb_base AS MATERIALIZED (
  SELECT {id_expr} AS doc_id, {label_expr} AS label_true,
         unnest({_tok_list_sql(text_expr)}) AS _tok
  FROM {table}
),
nb_tr AS (SELECT * FROM nb_base WHERE {train_pred}),
nb_te AS (SELECT * FROM nb_base WHERE {test_pred}),
nb_post AS (
  SELECT label_true AS label, _tok, {_L_sql("count(*) + 1")} AS _l
  FROM nb_tr GROUP BY label_true, _tok
),
nb_v AS (SELECT count(DISTINCT _tok) AS _v FROM nb_tr),
nb_lab AS (
  SELECT label_true AS label,
         {_L_sql("count(DISTINCT doc_id)")} AS _p,
         {_L_sql("count(*) + (SELECT _v FROM nb_v)")} AS _d
  FROM nb_tr GROUP BY label_true
),
nb_doctok AS (
  SELECT doc_id, label_true, _tok, count(*) AS _c
  FROM nb_te GROUP BY doc_id, label_true, _tok
),
nb_doctot AS (
  SELECT doc_id, label_true, SUM(_c) AS _ntok
  FROM nb_doctok GROUP BY doc_id, label_true
),
nb_s AS (
  SELECT t.doc_id, t.label_true, p.label, SUM(t._c * p._l) AS _s
  FROM nb_doctok t JOIN nb_post p USING (_tok)
  GROUP BY t.doc_id, t.label_true, p.label
),
nb_sc AS (
  SELECT d.doc_id, d.label_true, l.label,
         l._p + COALESCE(s._s, 0) - d._ntok * l._d AS score
  FROM nb_doctot d CROSS JOIN nb_lab l
  LEFT JOIN nb_s s
    ON s.doc_id = d.doc_id AND s.label_true = d.label_true
   AND s.label = l.label
),
nb_pred AS (
  SELECT doc_id, label_true, label,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label DESC) AS _rn
  FROM nb_sc
)
SELECT label_true, label AS label_pred, count(*) AS n_docs
FROM nb_pred WHERE _rn = 1
GROUP BY label_true, label
"""


__all__ = [
    "nb_scores",
    "nb_confusion",
    "nb_confusion_sql",
    "token_count_sql",
]
