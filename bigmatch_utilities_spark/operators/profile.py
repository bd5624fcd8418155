"""Single-pass per-column table profiler with an exact cross-engine
oracle.

Before blocking-key design (bk_key_suggestion), standardization, or
curation, you profile: how null is each candidate field, how many
distinct values, what dominates. The reference's per-column surfaces are
piecemeal (max-width scan `a2`, display-width estimate `a3`); this
operator is the one-pass generalization — ONE melt + two
map-side-combined groupBys for any number of columns, instead of one
job per column.

Returns one row per profiled column:

    (column, n_rows, n_nulls, null_frac, n_distinct, min_s, max_s,
     top_value, top_n)

Values are profiled through CAST(col AS STRING): min/max/top are on the
string image. That keeps the cross-engine contract exact for string,
integer, and date columns (identical text images on both engines);
float columns are NOT supported in oracle-checked paths — Spark and
DuckDB format double-to-text differently (1.0E-7 vs 1e-07), which would
break parity. Profile floats via round() expressions instead.

top_value ties break (count DESC, value ASC); the ranking window
partitions by column name (≤ n_cols partitions of ≤ n_distinct rows —
never global). All-null columns report n_distinct 0 and NULL
min/max/top with top_n 0.

Scale: the melt multiplies rows by n_cols map-side; both groupBys
combine before the shuffle (distinct-value keyed — the same cost as one
countDistinct per column, shared in one pass). The final joins are on
the n_cols-row profile frame, broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One profile row per column in `cols` (see module docstring)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    melt = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_m")
    ).select("_m.column", "_m._v")

    base = melt.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("_v")).alias("n_nulls"),
        F.countDistinct("_v").alias("n_distinct"),
        F.min("_v").alias("min_s"),
        F.max("_v").alias("max_s"),
    )
    vc = (
        melt.filter(F.col("_v").isNotNull())
        .groupBy("column", "_v")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy("column").orderBy(
        F.col("_n").desc(), F.col("_v").asc()
    )
    top = (
        vc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("column", F.col("_v").alias("top_value"), F.col("_n").alias("top_n"))
    )
    return (
        base.join(F.broadcast(top), on="column", how="left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
            "n_distinct",
            "min_s",
            "max_s",
            "top_value",
            F.coalesce("top_n", F.lit(0)).alias("top_n"),
        )
    )


def profile_table_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of profile_table — identical melt, aggregates, and
    top-value tie-break."""
    if not cols:
        raise ValueError("cols must be non-empty")
    melt = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS _v FROM {table}"
        for c in cols
    )
    return f"""
WITH pf_melt AS MATERIALIZED ({melt}),
pf_base AS (
  SELECT "column",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count(_v) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT _v) AS BIGINT) AS n_distinct,
         MIN(_v) AS min_s,
         MAX(_v) AS max_s
  FROM pf_melt GROUP BY "column"
),
pf_vc AS (
  SELECT "column", _v, count(*) AS _n
  FROM pf_melt WHERE _v IS NOT NULL GROUP BY "column", _v
),
pf_top AS (
  SELECT "column", _v AS top_value, _n AS top_n
  FROM (
    SELECT *, row_number() OVER (PARTITION BY "column"
                                 ORDER BY _n DESC, _v ASC) AS _rn
    FROM pf_vc
  ) WHERE _rn = 1
)
SELECT b."column", b.n_rows, b.n_nulls,
       round(CAST(b.n_nulls AS DOUBLE) / b.n_rows, 6) AS null_frac,
       b.n_distinct, b.min_s, b.max_s,
       t.top_value, CAST(COALESCE(t.top_n, 0) AS BIGINT) AS top_n
FROM pf_base b LEFT JOIN pf_top t USING ("column")
"""


__all__ = ["profile_table", "profile_table_sql"]
