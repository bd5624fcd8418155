"""Stratified clerical-review sampling of the possible-match band.

BigMatch routes every pair between the accept cutoff and the print cutoff
to a human: MatchReview pages 30 rows at a time while the reviewer hunts
for the real cutoff (`/root/reference/app/MatchReview.py:26,69` — the
user "can scroll from page to page, looking for the cutoff"). That is
workable at thousands of pairs; at 10^12-row scale the clerical band has
billions of rows and the reviewable artifact is a *sample* — stratified
by weight so every part of the band (barely-above-floor through
barely-below-accept) is represented, and deterministic so two runs (or
the engine and its oracle) select the identical review set.

Scale design
------------
* Stratum assignment and the tiebreak key are pure Column arithmetic:
  ``stratum = least(n-1, floor((w - low)/(high - low) * n))`` and
  ``md5(concat_ws('|', ids))``.  md5-of-the-same-string is
  engine-portable (Spark and DuckDB both emit lowercase hex), so the
  "random" but reproducible order is bit-identical across engines —
  unlike ``xxhash64``/``rand(seed)``, which are engine-private.
* Top-k per stratum is computed in TWO phases so no stratum ever funnels
  through a single reducer: phase 1 partitions by (stratum, salt) —
  ``salt = pmod(xxhash64(ids), salt_buckets)``, Spark-internal only,
  invisible in the result — and keeps k per salt; phase 2 re-ranks the
  ≤ k·salt_buckets survivors per stratum.  With the default k=25,
  b=64 the phase-2 input is ≤ 1,600 rows per stratum no matter whether
  the band holds 10^4 or 10^11 pairs.
* Both windows order by (md5, ids): total and deterministic even in the
  astronomically-unlikely event of an md5 collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def review_sample(
    pairs: DataFrame,
    weight_col: str = "weight",
    low: float = -1.0,
    high: float = 2.0,
    n_strata: int = 4,
    per_stratum: int = 25,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
    salt_buckets: int = 64,
) -> DataFrame:
    """Deterministic stratified sample of pairs with low <= w < high.

    Returns the input id/weight columns plus ``stratum`` (0..n_strata-1)
    and ``rk`` (1..per_stratum rank within the stratum by md5 order).
    """
    w = F.col(weight_col)
    span = (high - low) / n_strata
    stratum = F.least(
        F.lit(n_strata - 1), F.floor((w - F.lit(low)) / F.lit(span))
    ).cast("int")
    tie = F.md5(F.concat_ws("|", *[F.col(c) for c in id_cols]))
    order = [F.col("_tie")] + [F.col(c) for c in id_cols]

    band = (
        pairs.filter((w >= low) & (w < high))
        .select(*id_cols, weight_col)
        .withColumn("stratum", stratum)
        .withColumn("_tie", tie)
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(salt_buckets))
    phase1 = (
        band.withColumn("_salt", salt)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("stratum", "_salt").orderBy(*order)
            ),
        )
        .filter(F.col("rk") <= per_stratum)
        .drop("rk", "_salt")
    )
    return (
        phase1.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("stratum").orderBy(*order)),
        )
        .filter(F.col("rk") <= per_stratum)
        .drop("_tie")
    )


def review_sample_sql(
    pairs_sql: str,
    weight_col: str = "weight",
    low: float = -1.0,
    high: float = 2.0,
    n_strata: int = 4,
    per_stratum: int = 25,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
) -> str:
    """DuckDB twin: single row_number per stratum (the salt phases are a
    Spark-side execution strategy; the selected set is salt-invariant)."""
    ids = ", ".join(id_cols)
    cat = ", ".join(id_cols)
    span = (high - low) / n_strata
    return f"""
        SELECT {ids}, {weight_col}, stratum, rk
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY stratum
                       ORDER BY md5(concat_ws('|', {cat})), {ids}
                   ) AS rk
            FROM (
                SELECT {ids}, {weight_col},
                       CAST(least({n_strata - 1},
                            floor(({weight_col} - ({low!r})) / ({span!r})))
                            AS INT) AS stratum
                FROM ({pairs_sql})
                WHERE {weight_col} >= {low!r} AND {weight_col} < {high!r}
            )
        )
        WHERE rk <= {per_stratum}
    """


def uncertainty_batch(
    pairs: DataFrame,
    weight_col: str = "weight",
    target: float = 0.0,
    k: int = 100,
    block_col: str | None = None,
    per_block: int = 5,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
    salt_buckets: int = 64,
) -> DataFrame:
    """Active-learning review batch: the k pairs NEAREST the decision
    boundary, optionally diversity-capped per block.

    :func:`review_sample` covers the whole clerical band evenly; when the
    reviewer's labels feed back into calibration (EM re-fit, cutoff
    re-pick), the information-optimal batch is instead the pairs the
    current model is least sure about — uncertainty sampling (Lewis-Gale
    1994), the selection rule interactive linkage tools built on this
    literature use for their labeling loops. ``target`` is the weight at
    the posterior-0.5 point (e.g. ``cutoffs.weight_cutoff_for(0.5, lam)``);
    distance is ``abs(round(w,6) - target)`` rounded to 6dp so the rank
    order is engine-exact. With ``block_col`` set, at most ``per_block``
    pairs survive per block first — one partitioned window — so a single
    pathological block cannot monopolize the batch (the diversity device
    of batch-mode active learning).

    Scale: the global top-k never funnels through one reducer — phase 1
    keeps k per (xxhash64 salt) partition, phase 2 re-ranks the
    <= k * salt_buckets survivors (same two-phase discipline as
    :func:`review_sample`; the salt is Spark-internal and invisible in
    the result). Output: id cols [, block_col], weight, dist,
    rk (1..k in (dist, md5, ids) order).
    """
    w6 = F.round(F.col(weight_col), 6)
    dist = F.round(F.abs(w6 - F.lit(target)), 6)
    tie = F.md5(F.concat_ws("|", *[F.col(c) for c in id_cols]))
    keep = [*id_cols] + ([block_col] if block_col else []) + [weight_col]
    d = (
        pairs.select(*keep)
        .withColumn("dist", dist)
        .withColumn("_tie", tie)
    )
    order = [F.col("dist").asc(), F.col("_tie")] + [F.col(c) for c in id_cols]
    if block_col:
        d = (
            d.withColumn(
                "_bq",
                F.row_number().over(Window.partitionBy(block_col).orderBy(*order)),
            )
            .filter(F.col("_bq") <= per_block)
            .drop("_bq")
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(salt_buckets))
    phase1 = (
        d.withColumn("_salt", salt)
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("_salt").orderBy(*order))
        )
        .filter(F.col("rk") <= k)
        .drop("rk", "_salt")
    )
    return (
        phase1.withColumn("rk", F.row_number().over(Window.orderBy(*order)))
        .filter(F.col("rk") <= k)
        .drop("_tie")
    )


def uncertainty_batch_sql(
    pairs_sql: str,
    weight_col: str = "weight",
    target: float = 0.0,
    k: int = 100,
    block_col: str | None = None,
    per_block: int = 5,
    id_cols: tuple[str, str] = ("id_l", "id_r"),
) -> str:
    """DuckDB twin of :func:`uncertainty_batch` (salt phases are
    Spark-internal; the selected set is salt-invariant)."""
    ids = ", ".join(id_cols)
    cat = ", ".join(id_cols)
    blk = f", {block_col}" if block_col else ""
    dist = (
        f"round(abs(round({weight_col}, 6) "
        f"- CAST({target!r} AS DOUBLE)), 6)"
    )
    base = f"""
        SELECT {ids}{blk}, {weight_col}, {dist} AS dist,
               md5(concat_ws('|', {cat})) AS _tie
        FROM ({pairs_sql})
    """
    if block_col:
        base = f"""
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {block_col}
                ORDER BY dist ASC, _tie, {ids}
            ) AS _bq
            FROM ({base})
        ) WHERE _bq <= {per_block}
        """
    return f"""
        SELECT {ids}{blk}, {weight_col}, dist, rk
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY dist ASC, _tie, {ids}
            ) AS rk
            FROM ({base})
        )
        WHERE rk <= {k}
    """
