"""Sorted-neighborhood blocking (Hernández–Stolfo SNM).

Equi-join blocking (operators/blocking.py) only pairs records that agree
EXACTLY on a key; a typo in the blocking field loses the pair forever.
The sorted-neighborhood method instead sorts the file by a (possibly
fuzzy) key and pairs every record with its w-1 successors in sort order —
records that are *close* in the ordering meet even when no derived key
matches. It is the classic complement to phonetic keys in the
record-linkage literature, and the reference's multi-pass design (loose
passes mopping up after strict ones) is exactly the gap SNM fills.

Spark-first shape — the hard part is the GLOBAL rank without funnelling
100 TB through one task:

1. range-repartition on the full ordering tuple (Spark samples boundaries
   distributively);
2. per-partition counts → cumulative offsets. The offsets frame is one
   row per shuffle partition (thousands of rows at 100 TB), so the
   cumulative-sum window over it is a deliberate single-task frame over a
   partition-count-sized input — the same O(P) driver-visible metadata
   any range partitioner already holds, kept lazily in-plan (no collect);
3. rank = offset + row_number within the range partition (the window
   partitions by the materialized partition id, so no global sort);
4. neighbor pairs by pure rank arithmetic: replicate each row w-1 times
   with target rank r+d and equi-join on rank — one integer-key shuffle,
   no boundary special-casing because ranks are contiguous across
   partitions.

spark_partition_id() is nondeterministic-tagged, which pins the pid
projection to the post-exchange side — Catalyst cannot push it through
the repartition.

Determinism: the ordering tuple always ends with the id column, so ranks
(and therefore pairs) are a pure function of the data on both engines;
the DuckDB oracle is a plain row_number() OVER (ORDER BY ...) self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds a 1-based dense global row rank in (order_cols) order without
    a single-task global sort. order_cols must be a total order (append a
    unique id as tiebreak) or ranks are nondeterministic."""
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    d = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols]).withColumn(
        "_sn_pid", F.spark_partition_id()
    )
    counts = d.groupBy("_sn_pid").agg(F.count(F.lit(1)).alias("_sn_n"))
    # P rows total: the unpartitioned window is a deliberate O(P) frame
    offs = counts.select(
        "_sn_pid",
        F.coalesce(
            F.sum("_sn_n").over(
                Window.orderBy("_sn_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_sn_off"),
    )
    local = F.row_number().over(
        Window.partitionBy("_sn_pid").orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        d.join(F.broadcast(offs), "_sn_pid")
        .withColumn(out_col, (F.col("_sn_off") + local).cast("long"))
        .drop("_sn_pid", "_sn_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    *,
    window: int = 5,
    num_partitions: int | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """SNM candidate pairs: every record paired with its (window-1)
    successors in (key_cols, id_col) sort order.

    Returns (id_l, id_r, dist) with id_l < id_r and dist = rank gap
    (1 .. window-1). Output size is exactly (window-1)·N - Σ(edge
    truncation) — linear in N, the property that makes SNM viable where
    a loose equi-join key would go quadratic.

    The ranked frame feeds BOTH sides of the neighbor join; pass
    `cache_handle` (dedup.lsh_cache convention) to persist it once
    instead of running the range-partition + offset pipeline twice.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    order_cols = [*key_cols, id_col]
    ranked = with_global_rank(
        df.select(id_col, *key_cols), order_cols, num_partitions=num_partitions
    ).select(F.col(id_col).alias("_sn_id"), F.col("rank").alias("_sn_rank"))
    if cache_handle is not None:
        ranked = ranked.persist()
        cache_handle.append(ranked)
    left = ranked.withColumn(
        "_sn_d", F.explode(F.sequence(F.lit(1), F.lit(window - 1)))
    ).select(
        F.col("_sn_id").alias("_id_a"),
        (F.col("_sn_rank") + F.col("_sn_d")).alias("_sn_rank_b"),
        F.col("_sn_d").alias("dist"),
    )
    right = ranked.select(
        F.col("_sn_id").alias("_id_b"), F.col("_sn_rank").alias("_sn_rank_b")
    )
    return left.join(right, "_sn_rank_b").select(
        F.least("_id_a", "_id_b").alias("id_l"),
        F.greatest("_id_a", "_id_b").alias("id_r"),
        F.col("dist").cast("int").alias("dist"),
    )


def sorted_neighborhood_sql(
    table: str, key_exprs: list[str], id_expr: str, *, window: int = 5
) -> str:
    """DuckDB oracle twin of sorted_neighborhood_pairs.

    Every ORDER BY term is rendered `<expr> NULLS FIRST`: Spark's ASC sort
    (and repartitionByRange) puts NULLs first while DuckDB defaults to
    NULLS LAST — without the qualifier, a NULL in any key column would
    shift the oracle's ranks and diverge the emitted pair set.
    """
    order = ", ".join(f"{e} NULLS FIRST" for e in [*key_exprs, id_expr])
    return f"""
        WITH sn_ranked AS (
          SELECT {id_expr} AS id,
                 row_number() OVER (ORDER BY {order}) AS rn
          FROM {table}
        )
        SELECT least(a.id, b.id) AS id_l,
               greatest(a.id, b.id) AS id_r,
               CAST(b.rn - a.rn AS INT) AS dist
        FROM sn_ranked a
        JOIN sn_ranked b ON b.rn - a.rn BETWEEN 1 AND {window - 1}
    """
