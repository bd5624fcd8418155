"""Golden-record survivorship: one canonical record per entity cluster.

After linkage + closure produce entity clusters, a real pipeline still
has to answer "which VALUES represent the entity?" — the survivorship /
data-fusion step.  The reference stops at pairs and eyeballed review
(`/root/reference/app/MatchReview.py`); downstream canonicalization is
left to the user.  This operator makes it a first-class distributed
computation: per (cluster, field), vote for the most frequent non-blank
value, breaking ties by the smallest value so the winner is a pure
function of the data on any engine.

Spark-first shape — TWO shuffles total regardless of how many fields are
fused, because fields are melted into rows instead of aggregated
column-by-column:

1. melt: ``stack(n, 'f1', CAST(f1 AS STRING), ...)`` → (cluster, field,
   value), blank/null votes dropped — a missing value never outvotes a
   present one;
2. vote: ``groupBy(cluster, field, value).agg(sum(ballot))`` (map-side
   combined).  The ballot is 1 per row (frequency survivorship) or, with
   ``weight_col``, the row's linkage weight quantized to an exact 1e-6
   integer — EM-calibrated edge strength then decides elections instead
   of raw row counts, with the identical deterministic tie-break (the
   standard fusion refinement once calibrated weights exist; integer
   ballots keep the sum order-independent so both engines agree exactly);
3. elect: ``groupBy(cluster, field).agg(min(struct(-votes, value)))`` —
   the min-struct argmax idiom used across this repo instead of a
   row_number window: most votes wins, ties go to the smallest value;
4. pivot back to one row per cluster with an explicit field list (no
   schema inference pass);
5. re-attach the full cluster roster by left-joining the distinct
   cluster ids: a cluster whose members are blank/null in EVERY fused
   field still emits its row (all-null fields) — "one row per cluster"
   holds unconditionally, no silent row loss.

At 100 TB the frame sizes are (rows × fields) for the melt and at most
(distinct values per cluster-field) afterwards — nothing quadratic, no
windows over data-sized frames, no collect.  The DuckDB oracle twin
uses a row_number window (fine for an oracle) over the identical vote
sums with the identical (votes DESC, value ASC) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: weight_col ballots are quantized to this granularity before summing so
#: the election tally is exact 64-bit integer arithmetic on both engines.
WEIGHT_SCALE = 1_000_000


def golden_record(
    df: DataFrame,
    cluster_col: str,
    fields: list[str],
    *,
    weight_col: str | None = None,
) -> DataFrame:
    """One row per distinct non-null cluster id: (cluster_id, <field>...)
    canonical values (all-null fields when every member is blank in them).

    All fused values are returned as strings (the melt casts); callers
    needing typed columns cast back on the known field list.

    weight_col: optional double column (e.g. the member's cluster-edge
    strength from cluster_quality, or its linkage weight) — votes are
    weighted by it instead of counted.  Negative or null weights vote 0.
    """
    clusters = (
        df.select(F.col(cluster_col).alias("cluster_id"))
        .filter(F.col("cluster_id").isNotNull())
        .distinct()
    )
    ballot = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.greatest(
            F.round(F.coalesce(F.col(weight_col), F.lit(0.0)) * WEIGHT_SCALE, 0)
            .cast("long"),
            F.lit(0).cast("long"),
        )
    )
    stack_args = ", ".join(
        f"'{f_}', CAST({f_} AS STRING)" for f_ in fields
    )
    melted = (
        df.select(
            F.col(cluster_col).alias("cluster_id"),
            ballot.alias("ballot"),
            F.expr(f"stack({len(fields)}, {stack_args})").alias("field", "value"),
        )
        .filter(F.col("cluster_id").isNotNull())
        .filter(F.col("value").isNotNull() & (F.trim("value") != ""))
    )
    counted = melted.groupBy("cluster_id", "field", "value").agg(
        F.sum("ballot").alias("votes")
    )
    elected = counted.groupBy("cluster_id", "field").agg(
        F.min(
            F.struct((-F.col("votes")).alias("neg_votes"), F.col("value").alias("v"))
        ).alias("win")
    )
    pivoted = (
        elected.groupBy("cluster_id")
        .pivot("field", fields)
        .agg(F.first("win.v"))
    )
    return clusters.join(pivoted, "cluster_id", "left")


def golden_record_sql(
    table: str,
    cluster_col: str,
    fields: list[str],
    *,
    weight_col: str | None = None,
) -> str:
    """DuckDB oracle twin: identical integer vote sums, (votes DESC,
    value ASC) election via row_number, conditional-max pivot, left join
    back to the distinct cluster roster."""
    ballot = (
        "CAST(1 AS BIGINT)"
        if weight_col is None
        else (
            f"greatest(CAST(round(coalesce({weight_col}, 0.0) * {WEIGHT_SCALE}) "
            "AS BIGINT), 0)"
        )
    )
    unions = "\nUNION ALL\n".join(
        f"""SELECT {cluster_col} AS cluster_id, {ballot} AS ballot,
                   '{f_}' AS field, CAST({f_} AS STRING) AS value FROM {table}"""
        for f_ in fields
    )
    pivots = ",\n".join(
        f"max(CASE WHEN field = '{f_}' THEN value END) AS {f_}" for f_ in fields
    )
    return f"""
        WITH melted AS ({unions}),
        nz AS (
            SELECT * FROM melted
            WHERE cluster_id IS NOT NULL
              AND value IS NOT NULL AND trim(value) <> ''
        ),
        counted AS (
            SELECT cluster_id, field, value, sum(ballot) AS votes
            FROM nz GROUP BY cluster_id, field, value
        ),
        ranked AS (
            SELECT cluster_id, field, value,
                   row_number() OVER (
                       PARTITION BY cluster_id, field
                       ORDER BY votes DESC, value
                   ) AS rn
            FROM counted
        ),
        pivoted AS (
            SELECT cluster_id, {pivots}
            FROM ranked WHERE rn = 1
            GROUP BY cluster_id
        ),
        roster AS (
            SELECT DISTINCT {cluster_col} AS cluster_id FROM {table}
            WHERE {cluster_col} IS NOT NULL
        )
        SELECT roster.cluster_id, {", ".join(f"pivoted.{f_}" for f_ in fields)}
        FROM roster LEFT JOIN pivoted USING (cluster_id)
    """
