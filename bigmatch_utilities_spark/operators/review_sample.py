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
