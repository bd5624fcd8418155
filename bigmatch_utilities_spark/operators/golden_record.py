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
2. vote: ``groupBy(cluster, field, value).count()`` (map-side combined);
3. elect: ``groupBy(cluster, field).agg(min(struct(-cnt, value)))`` —
   the min-struct argmax idiom used across this repo instead of a
   row_number window: most votes wins, ties go to the smallest value;
4. pivot back to one row per cluster with an explicit field list (no
   schema inference pass).

At 100 TB the frame sizes are (rows × fields) for the melt and at most
(distinct values per cluster-field) afterwards — nothing quadratic, no
windows over data-sized frames, no collect.  The DuckDB oracle twin
uses a row_number window (fine for an oracle) over the identical vote
counts with the identical (cnt DESC, value ASC) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_record(
    df: DataFrame,
    cluster_col: str,
    fields: list[str],
) -> DataFrame:
    """One row per cluster: (cluster_id, <field>...) canonical values.

    All fused values are returned as strings (the melt casts); callers
    needing typed columns cast back on the known field list.
    """
    stack_args = ", ".join(
        f"'{f_}', CAST({f_} AS STRING)" for f_ in fields
    )
    melted = (
        df.select(
            F.col(cluster_col).alias("cluster_id"),
            F.expr(f"stack({len(fields)}, {stack_args})").alias("field", "value"),
        )
        .filter(F.col("cluster_id").isNotNull())
        .filter(F.col("value").isNotNull() & (F.trim("value") != ""))
    )
    counted = melted.groupBy("cluster_id", "field", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    elected = counted.groupBy("cluster_id", "field").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("value").alias("v"))
        ).alias("win")
    )
    return (
        elected.groupBy("cluster_id")
        .pivot("field", fields)
        .agg(F.first("win.v"))
    )


def golden_record_sql(
    table: str,
    cluster_col: str,
    fields: list[str],
) -> str:
    """DuckDB oracle twin: identical votes, (cnt DESC, value ASC) election
    via row_number, conditional-max pivot."""
    unions = "\nUNION ALL\n".join(
        f"""SELECT {cluster_col} AS cluster_id, '{f_}' AS field,
                   CAST({f_} AS STRING) AS value FROM {table}"""
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
            SELECT cluster_id, field, value, count(*) AS cnt
            FROM nz GROUP BY cluster_id, field, value
        ),
        ranked AS (
            SELECT cluster_id, field, value,
                   row_number() OVER (
                       PARTITION BY cluster_id, field
                       ORDER BY cnt DESC, value
                   ) AS rn
            FROM counted
        )
        SELECT cluster_id, {pivots}
        FROM ranked WHERE rn = 1
        GROUP BY cluster_id
    """
