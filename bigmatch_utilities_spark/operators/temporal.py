"""Temporal linkage operators: as-of join and interval-overlap join.

Record linkage over event streams needs two joins Spark's DataFrame API
does not ship: "attach the latest prior observation" (as-of) and "pair
records whose validity windows overlap" (interval overlap). The reference
engine has no temporal vocabulary at all — its passes compare snapshot
fields (/root/reference/app/BlockingPass.py holds only equi keys +
field comparators) — so linking longitudinal records (the same person
observed at different times, an event against the profile that was
current when it happened) is manual pre-processing there. These
operators make both first-class, Spark-first.

Scale shapes (the 100 TB question):

* ``asof_join`` is ONE shuffle: union the two sides, hash-partition on
  the join keys, and run a running ``last(..., ignorenulls)`` window —
  Spark's WindowExec evaluates an UNBOUNDED PRECEDING → CURRENT ROW
  frame as a streaming running aggregate, one pass per key after the
  sort, never materializing per-row frames. No per-left-row probe join,
  no range join that Catalyst would turn into a broadcast nested loop.
  Hot keys concentrate in single tasks (the order dependency makes
  salting inapplicable), which is the same skew exposure as any
  groupBy(key) — AQE skew handling does not split windows, so extremely
  hot keys should be range-bucketed by time first.
* ``interval_overlap_pairs`` buckets time into granules and equi-joins
  on (block key, granule) — the standard distributed interval join.
  Overlapping intervals always share the granule of any common instant,
  so bucketing is complete; the exact overlap predicate then filters
  false bucket-mates. The pair budget is bounded by ``max_granules``
  (rows spanning more granules are DROPPED — mirrored exactly in the
  oracle SQL) and by the block key's selectivity, never all-pairs.

Determinism / oracle-exactness: all time arithmetic is integer
microseconds (``unix_micros`` ↔ ``epoch_us``); granule assignment is
integer division on positive epochs (pre-1970 timestamps are not
supported — enforced, not assumed); as-of ties on the right timestamp
break by largest right id. Both engines therefore compute bit-identical
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_id: str,
    tolerance_s: float | None = None,
) -> DataFrame:
    """For every left row, attach the single latest right row with
    ``right_ts <= left_ts`` on the same ``on`` keys — the classic as-of
    join. Ties on ``right_ts`` break by largest ``right_id`` so the
    result is a pure function of the data. With ``tolerance_s``, a match
    older than ``left_ts - tolerance_s`` yields NULLs instead.

    Returns all left columns plus ``right_cols`` (NULL when no match).
    ``right_cols`` must not collide with left column names.
    """
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    if right_id not in right_cols:
        carry = [right_id] + list(right_cols)
    else:
        carry = list(right_cols)
    if right_ts not in carry:
        carry = [right_ts] + carry

    lrows = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in carry
            )
            + ">"
        )
        .alias("_r"),
    )
    rrows = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id).cast("long").alias("_rid"),
        F.lit(None).cast(lrows.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in carry]).alias("_r"),
    )
    # right rows sort BEFORE the left row at an equal timestamp (inclusive
    # <=); among equal-ts right rows the largest _rid is nearest the left
    # row, so the running last() picks it — the documented tie rule
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lrows.unionByName(rrows).withColumn(
        "_best", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select("_l.*", "_best")
    ok = F.col("_best").isNotNull()
    if tolerance_s is not None:
        ok = ok & (
            F.col("_best")[right_ts]
            >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance_s} SECOND")
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(ok, F.col("_best")[c]).alias(c)
            for c in right_cols
        ],
    )


def asof_join_sql(
    left_table: str,
    right_table: str,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    left_id: str,
    right_id: str,
    tolerance_s: float | None = None,
) -> str:
    """DuckDB oracle twin of :func:`asof_join` — candidate window +
    row_number instead of DuckDB's native ASOF JOIN, because the native
    operator's tie rule on equal right timestamps is unspecified while
    ours (largest right id) must be deterministic. Requires unique
    ``left_id`` / ``right_id``."""
    keys = " AND ".join(f"l.{k} = r.{k}" for k in on)
    tol = (
        f" AND r.{right_ts} >= l.{left_ts} - INTERVAL '{tolerance_s} seconds'"
        if tolerance_s is not None
        else ""
    )
    rcols = ", ".join(f"r.{c} AS {c}" for c in right_cols)
    return f"""
        WITH af_cand AS (
            SELECT l.{left_id} AS _lid, r.{right_id} AS _rid,
                   row_number() OVER (
                       PARTITION BY l.{left_id}
                       ORDER BY r.{right_ts} DESC, r.{right_id} DESC
                   ) AS _rk
            FROM {left_table} l JOIN {right_table} r
              ON {keys} AND r.{right_ts} <= l.{left_ts}{tol}
        ),
        af_best AS (SELECT _lid, _rid FROM af_cand WHERE _rk = 1)
        SELECT l.*, {rcols}
        FROM {left_table} l
        LEFT JOIN af_best b ON l.{left_id} = b._lid
        LEFT JOIN {right_table} r ON b._rid = r.{right_id}
    """


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_ts: str,
    end_ts: str,
    *,
    granule_s: int = 3600,
    max_granules: int = 64,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Self-join pairs (id_l, id_r, overlap_us) of rows whose
    [start_ts, end_ts] intervals overlap, optionally restricted to rows
    agreeing on ``block_cols``. Rows with end < start, NULL endpoints,
    pre-1970 starts, or spanning ``max_granules`` or more granules are
    dropped (the span cap bounds the explode fan-out; the oracle twin
    mirrors every drop). Overlap is closed-interval (touching endpoints
    count, overlap_us 0).
    """
    if granule_s < 1 or max_granules < 1:
        raise ValueError("granule_s and max_granules must be >= 1")
    us = granule_s * 1_000_000
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            # cast-through-timestamp: a no-op for TIMESTAMP columns, and
            # for TIMESTAMP_NTZ (how plain parquet timestamps read) it
            # interprets the naive value in the session zone — this repo
            # pins spark.sql.session.timeZone=UTC (session.py), matching
            # DuckDB's naive epoch_us
            F.unix_micros(F.col(start_ts).cast("timestamp")).alias("_s"),
            F.unix_micros(F.col(end_ts).cast("timestamp")).alias("_e"),
            *[F.col(c).alias(f"_bk_{i}") for i, c in enumerate(block_cols)],
        )
        .filter(
            F.col("_s").isNotNull()
            & F.col("_e").isNotNull()
            & (F.col("_s") >= 0)
            & (F.col("_e") >= F.col("_s"))
        )
        .withColumn("_b0", F.expr(f"_s div {us}"))
        .withColumn("_b1", F.expr(f"_e div {us}"))
        .filter(F.col("_b1") - F.col("_b0") < max_granules)
    )
    bucketed = base.withColumn("_bkt", F.explode(F.sequence("_b0", "_b1")))
    bks = [f"_bk_{i}" for i in range(len(block_cols))]
    l = bucketed.select(
        F.col("_id").alias("id_l"),
        F.col("_s").alias("_s_l"),
        F.col("_e").alias("_e_l"),
        "_bkt",
        *bks,
    )
    r = bucketed.select(
        F.col("_id").alias("id_r"),
        F.col("_s").alias("_s_r"),
        F.col("_e").alias("_e_r"),
        F.col("_bkt").alias("_bkt2"),
        *[F.col(b).alias(f"{b}2") for b in bks],
    )
    cond = (F.col("_bkt") == F.col("_bkt2")) & (F.col("id_l") < F.col("id_r"))
    for b in bks:
        cond = cond & (F.col(b) == F.col(f"{b}2"))
    return (
        l.join(r, cond)
        .select("id_l", "id_r", "_s_l", "_e_l", "_s_r", "_e_r")
        .distinct()  # a pair can co-bucket in many granules
        .filter((F.col("_s_l") <= F.col("_e_r")) & (F.col("_s_r") <= F.col("_e_l")))
        .select(
            "id_l",
            "id_r",
            (
                F.least("_e_l", "_e_r") - F.greatest("_s_l", "_s_r")
            ).alias("overlap_us"),
        )
    )


def interval_overlap_pairs_sql(
    table: str,
    id_col: str,
    start_ts: str,
    end_ts: str,
    *,
    granule_s: int = 3600,
    max_granules: int = 64,
    block_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB oracle twin — a direct theta self-join (fine at oracle
    scale; the bucketing is complete, so only the mirrored row drops
    matter: NULL/invalid endpoints, pre-1970, span >= max_granules)."""
    us = granule_s * 1_000_000
    blocks = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    blocks = f"{blocks} AND " if blocks else ""
    cols = ", ".join([id_col, f"epoch_us({start_ts}) AS _s", f"epoch_us({end_ts}) AS _e", *block_cols])
    return f"""
        WITH iv_b AS (
            SELECT {cols} FROM {table}
            WHERE {start_ts} IS NOT NULL AND {end_ts} IS NOT NULL
              AND epoch_us({start_ts}) >= 0
              AND epoch_us({end_ts}) >= epoch_us({start_ts})
              AND (epoch_us({end_ts}) // {us}) - (epoch_us({start_ts}) // {us})
                  < {max_granules}
        )
        SELECT a.{id_col} AS id_l, b.{id_col} AS id_r,
               least(a._e, b._e) - greatest(a._s, b._s) AS overlap_us
        FROM iv_b a JOIN iv_b b
          ON {blocks}a.{id_col} < b.{id_col}
             AND a._s <= b._e AND b._s <= a._e
    """


def entity_history(
    records: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    fields: list[str],
    id_col: str,
) -> DataFrame:
    """Per-entity attribute timeline (an SCD-2 build): for every entity
    and tracked field, the sequence of DISTINCT consecutive values with
    their validity windows.

    Once clustering assigns records to entities, the longitudinal
    question is "what was this entity's address in March?" -- the
    slowly-changing-dimension view fusion flattens away (golden_record
    keeps ONE value; this keeps the history). The reference has no
    longitudinal vocabulary at all (snapshot passes only,
    /root/reference/app/BlockingPass.py).

    Semantics: melt ``fields`` to (entity, field, value, ts, id); order
    each (entity, field) partition by (ts, id); keep rows where the value
    CHANGED vs the previous record (nulls compare as the empty string, so
    null -> 'x' and 'x' -> null are both changes); ``valid_from`` is the
    change's timestamp, ``valid_to`` the next change's (null = current).
    Timestamps are emitted as integer epoch microseconds -- exact in both
    engines.

    Scale shape: ONE shuffle on (entity, field) -- the melt is map-side
    (explode of a literal struct array), both windows run on the same
    partitioning (Catalyst reuses the single sort), and a partition is
    one entity's one field's observations, never the whole table. Skew =
    an entity with millions of observations of one field; that is the
    same exposure as any per-entity window and bounds at the entity's
    row count, not a pair count.
    """
    melted = records.select(
        F.col(entity_col).alias("entity_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(id_col).alias("_eh_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("field"),
                        F.col(f).cast("string").alias("value"),
                    )
                    for f in fields
                ]
            )
        ).alias("_fv"),
    ).select(
        "entity_id", "ts_us", "_eh_id",
        F.col("_fv.field").alias("field"),
        F.col("_fv.value").alias("value"),
    )
    w = Window.partitionBy("entity_id", "field").orderBy("ts_us", "_eh_id")
    changed = melted.withColumn(
        "_prev", F.lag(F.coalesce(F.col("value"), F.lit(""))).over(w)
    ).filter(
        F.col("_prev").isNull()
        | (F.coalesce(F.col("value"), F.lit("")) != F.col("_prev"))
    )
    w2 = Window.partitionBy("entity_id", "field").orderBy("ts_us", "_eh_id")
    return changed.select(
        "entity_id",
        "field",
        "value",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
    )


def entity_history_sql(
    table: str,
    *,
    entity_expr: str,
    ts_expr: str,
    fields: list[str],
    id_expr: str,
) -> str:
    """DuckDB oracle twin of :func:`entity_history` (identical rows: the
    change-detection ordering, null-as-'' comparison, and epoch-us
    integers all mirror the Column chain)."""
    melt = " UNION ALL ".join(
        f"SELECT {entity_expr} AS entity_id, "
        f"epoch_us(CAST({ts_expr} AS TIMESTAMP)) AS ts_us, "
        f"{id_expr} AS _eh_id, '{f}' AS field, CAST({f} AS VARCHAR) AS value "
        f"FROM {table}"
        for f in fields
    )
    return f"""
        WITH eh_m AS ({melt}),
        eh_p AS (
            SELECT *, lag(coalesce(value, '')) OVER (
                PARTITION BY entity_id, field ORDER BY ts_us, _eh_id
            ) AS _prev
            FROM eh_m
        ),
        eh_c AS (
            SELECT * FROM eh_p
            WHERE _prev IS NULL OR coalesce(value, '') <> _prev
        )
        SELECT entity_id, field, value, ts_us AS valid_from_us,
               lead(ts_us) OVER (
                   PARTITION BY entity_id, field ORDER BY ts_us, _eh_id
               ) AS valid_to_us
        FROM eh_c
    """
