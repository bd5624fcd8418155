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


def pass_completeness(
    cands: DataFrame,
    truth: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
    pass_col: str = "pass_id",
) -> DataFrame:
    """Per-blocking-pass recall audit: Christen's pair completeness (PC)
    and pair quality (PQ), plus the cumulative first-wins completeness
    the multi-pass union actually delivers.

    `cands` carries one row per (pass, pair) candidate; `truth` is the
    labeled true-pair set.  Output, one row per pass in pass order:

        pass_id, n_cands,    -- distinct canonical pairs this pass emits
        n_new,               -- pairs whose FIRST finding pass is this one
        n_hits,              -- this pass's pairs that are true pairs
        pc,                  -- n_hits / |truth|   (per-pass completeness)
        pq,                  -- n_hits / n_cands   (per-pass quality)
        cum_hits, cum_pc     -- truth recovered by passes <= this one

    This is the data-side answer to "is pass 3 worth its shuffle?": a
    pass with pq ~ 0 and cum_pc flat is pure cost.  The reference's parmf
    counts (`/root/reference/app/BlockingPass.py:588-647`) are spec-side
    only; BigMatch users learn a pass is dead weight from the run clock.

    Scale design: pairs are canonicalized map-side and deduplicated per
    pass (one shuffle keyed on the pair); the first-wins frame is a
    map-side-combined `min(pass)` over the same key; truth is a labeled
    SAMPLE in practice — small — so both hit-joins broadcast it; the
    per-pass aggregate is O(#passes) rows, on which the cumulative
    window is deliberate driver-scale metadata, not data.
    """
    c = (
        cands.select(
            F.col(pass_col).alias("p"),
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    t = _canon_pairs(truth, id_l, id_r)
    n_truth = t.agg(F.count(F.lit(1)).alias("_nt"))

    hit = F.broadcast(t.withColumn("_hit", F.lit(1)))
    per_pass = (
        c.join(hit, on=["a", "b"], how="left")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    first = (
        c.groupBy("a", "b")
        .agg(F.min("p").alias("p"))
        .join(hit, on=["a", "b"], how="left")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("_new_hits"),
        )
    )
    # O(#passes) rows from here on: the unpartitioned cumulative window is
    # the same deliberate driver-scale frame as sorted_neighborhood's
    # offsets (a handful of rows at any data scale)
    from pyspark.sql import Window

    cum = F.sum(F.coalesce("_new_hits", F.lit(0))).over(
        Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_pass.join(first, "p", "left")
        .withColumn("cum_hits", cum.cast("long"))
        .crossJoin(F.broadcast(n_truth))
        .select(
            F.col("p").alias(pass_col),
            "n_cands",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            "n_hits",
            F.round(F.try_divide(F.col("n_hits").cast("double"), "_nt"), 6).alias(
                "pc"
            ),
            F.round(
                F.try_divide(F.col("n_hits").cast("double"), "n_cands"), 6
            ).alias("pq"),
            "cum_hits",
            F.round(F.try_divide(F.col("cum_hits").cast("double"), "_nt"), 6).alias(
                "cum_pc"
            ),
        )
        .orderBy(pass_col)
    )


def pass_completeness_sql(
    cands_sql: str,
    truth_sql: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
    pass_col: str = "pass_id",
) -> str:
    """DuckDB twin of :func:`pass_completeness`."""
    return f"""
        WITH c AS (
            SELECT DISTINCT {pass_col} AS p,
                            least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({cands_sql}) WHERE {id_l} <> {id_r}
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), nt AS (SELECT count(*) AS _nt FROM t),
        per_pass AS (
            SELECT c.p, count(*) AS n_cands,
                   count(t.a) AS n_hits
            FROM c LEFT JOIN t ON c.a = t.a AND c.b = t.b
            GROUP BY c.p
        ), first AS (
            SELECT f.p, count(*) AS n_new, count(t.a) AS _new_hits
            FROM (SELECT a, b, min(p) AS p FROM c GROUP BY a, b) f
            LEFT JOIN t ON f.a = t.a AND f.b = t.b
            GROUP BY f.p
        )
        SELECT per_pass.p AS {pass_col},
               n_cands,
               coalesce(n_new, 0) AS n_new,
               n_hits,
               round(CAST(n_hits AS DOUBLE) / NULLIF(_nt, 0), 6) AS pc,
               round(CAST(n_hits AS DOUBLE) / NULLIF(n_cands, 0), 6) AS pq,
               CAST(sum(coalesce(_new_hits, 0))
                        OVER (ORDER BY per_pass.p ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_hits,
               round(CAST(sum(coalesce(_new_hits, 0))
                              OVER (ORDER BY per_pass.p
                                    ROWS UNBOUNDED PRECEDING)
                          AS DOUBLE) / NULLIF(_nt, 0), 6) AS cum_pc
        FROM per_pass LEFT JOIN first ON per_pass.p = first.p
        CROSS JOIN nt
        ORDER BY per_pass.p
    """


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
