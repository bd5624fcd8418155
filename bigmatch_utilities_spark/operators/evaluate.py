"""Pairwise linkage evaluation: precision / recall / F1 vs labeled pairs.

The north rule grades the engine on pairwise F1 ≥ 0.99 against the
reference's labeled decisions at shared blocking keys; the reference
itself has no evaluation tooling (decisions are eyeballed in MatchReview,
`/root/reference/app/MatchReview.py:26`).  This operator makes the
metric a first-class, distributed computation: canonicalize both pair
sets (unordered pairs), count tp/fp/fn with two joins, emit one row.

Scale design: pairs are canonicalized map-side (least/greatest) and
deduplicated; tp is one equi-join on the composite pair key, fp/fn are
the two anti-join counts.  All shuffles are keyed on the pair id — no
windows, no collect; the output is a single row of counters, so the
final agg is map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_pairs(df: DataFrame, id_l: str, id_r: str) -> DataFrame:
    return (
        df.select(
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def pairwise_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> DataFrame:
    """One row: n_pred, n_truth, tp, fp, fn, precision, recall, f1 (6dp).

    Both inputs are treated as UNORDERED pair sets (canonicalized and
    deduplicated before comparison).
    """
    p = _canon_pairs(predicted, id_l, id_r)
    t = _canon_pairs(truth, id_l, id_r)
    merged = (
        p.withColumn("_p", F.lit(1))
        .join(t.withColumn("_t", F.lit(1)), on=["a", "b"], how="full_outer")
        .agg(
            F.sum(F.coalesce("_p", F.lit(0))).cast("long").alias("n_pred"),
            F.sum(F.coalesce("_t", F.lit(0))).cast("long").alias("n_truth"),
            F.sum(
                F.coalesce("_p", F.lit(0)) * F.coalesce("_t", F.lit(0))
            ).cast("long").alias("tp"),
        )
    )
    tp = F.col("tp").cast("double")
    # f1 via the algebraic identity 2·tp/(n_pred+n_truth) — equal to the
    # harmonic mean when tp > 0 and a well-defined 0 when tp = 0; empty
    # sets yield NULL (try_divide), mirrored by NULLIF in the SQL twin
    return merged.select(
        "n_pred",
        "n_truth",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.round(F.try_divide(tp, F.col("n_pred")), 6).alias("precision"),
        F.round(F.try_divide(tp, F.col("n_truth")), 6).alias("recall"),
        F.round(
            F.try_divide(2.0 * tp, F.col("n_pred") + F.col("n_truth")), 6
        ).alias("f1"),
    )


def pairwise_metrics_sql(
    predicted_sql: str,
    truth_sql: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> str:
    """DuckDB twin of :func:`pairwise_metrics`."""
    return f"""
        WITH p AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({predicted_sql}) WHERE {id_l} <> {id_r}
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), m AS (
            SELECT count(*) FILTER (WHERE p.a IS NOT NULL) AS n_pred,
                   count(*) FILTER (WHERE t.a IS NOT NULL) AS n_truth,
                   count(*) FILTER (WHERE p.a IS NOT NULL AND t.a IS NOT NULL) AS tp
            FROM p FULL OUTER JOIN t ON p.a = t.a AND p.b = t.b
        )
        SELECT n_pred, n_truth, tp,
               n_pred - tp AS fp,
               n_truth - tp AS fn,
               round(CAST(tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision,
               round(CAST(tp AS DOUBLE) / NULLIF(n_truth, 0), 6) AS recall,
               round(2.0 * CAST(tp AS DOUBLE) / NULLIF(n_pred + n_truth, 0),
                     6) AS f1
        FROM m
    """
