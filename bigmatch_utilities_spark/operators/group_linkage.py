"""Group-level linkage rollup: aggregate record-pair match evidence to the
GROUP pair — repositories in the north-star table, households in the census
setting BigMatch comes from.

The reference scores record pairs only; deciding "are these two REPOS the
same project / a fork" (or "did these two households match") is left to
the analyst's spreadsheet.  This operator rolls the scored pair file up:
for every cross-group pair of groups it reports how many record pairs
matched, how many DISTINCT members on each side participated, the total
match weight, and a containment score — the fraction of the more-covered
group's membership that found a partner — so a small repo vendored whole
into a large one scores ~1.0 (same asymmetric-containment rationale as
operators/winnow.group_containment_pairs, but over the FS-scored pair
evidence instead of raw fingerprints; the two views cross-check each
other).

Scale design: two joins attach group labels to the pair endpoints — at
10^12 rows the membership frame is a projection of the records table, so
these are plain shuffles on the pair ids (or map-only when the pair file
is written bucketed on id, plans/tables.write_bucketed).  The rollup is
one map-side-combined groupBy on the canonicalized group pair; group
sizes are one more groupBy of the membership frame, joined back onto the
(far smaller) group-pair frame.  No windows, no collect.

Cross-engine determinism: weights are quantized to integer micro-units
with floor() BEFORE the sum, so the shuffled aggregation is exact integer
arithmetic in both Spark and the DuckDB oracle (same discipline as
operators/tfidf_sim.py); ratios are single double divides on exact
integers, rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_match_profile(
    pairs: DataFrame,
    memberships: DataFrame,
    *,
    id_l: str = "id_l",
    id_r: str = "id_r",
    weight_col: str = "weight",
    id_col: str = "id",
    group_col: str = "grp",
    min_pairs: int = 1,
) -> DataFrame:
    """(group_l, group_r, n_pairs, matched_l, matched_r, sum_weight,
    containment) per cross-group pair of groups, group_l < group_r.

    * n_pairs — record pairs linking the two groups;
    * matched_l / matched_r — distinct participating members per side;
    * sum_weight — Σ pair weights (1e-6-quantized exact sum);
    * containment — max(matched_l / |group_l|, matched_r / |group_r|).

    Intra-group pairs are dropped (they are the group's internal dedupe,
    not cross-group evidence).  Pairs whose endpoint is missing from
    ``memberships`` are dropped by the inner joins — membership is the
    universe of interest by contract.
    """
    m = memberships.select(F.col(id_col).alias("_mid"), F.col(group_col).alias("_g"))
    sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    e = (
        pairs.select(
            F.col(id_l).alias("_a"),
            F.col(id_r).alias("_b"),
            F.expr(f"CAST(floor({weight_col} * 1000000) AS BIGINT)").alias("_qw"),
        )
        .join(m.select(F.col("_mid").alias("_a"), F.col("_g").alias("_ga")), "_a")
        .join(m.select(F.col("_mid").alias("_b"), F.col("_g").alias("_gb")), "_b")
        .filter(F.col("_ga") != F.col("_gb"))
    )
    flip = F.col("_ga") > F.col("_gb")
    canon = e.select(
        F.when(flip, F.col("_gb")).otherwise(F.col("_ga")).alias("group_l"),
        F.when(flip, F.col("_ga")).otherwise(F.col("_gb")).alias("group_r"),
        F.when(flip, F.col("_b")).otherwise(F.col("_a")).alias("_ml"),
        F.when(flip, F.col("_a")).otherwise(F.col("_b")).alias("_mr"),
        "_qw",
    )
    agg = (
        canon.groupBy("group_l", "group_r")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("_ml").alias("matched_l"),
            F.count_distinct("_mr").alias("matched_r"),
            F.sum("_qw").cast("long").alias("_qsum"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
    )
    return (
        agg.join(
            sizes.select(F.col("_g").alias("group_l"), F.col("_n").alias("_nl")),
            "group_l",
        )
        .join(
            sizes.select(F.col("_g").alias("group_r"), F.col("_n").alias("_nr")),
            "group_r",
        )
        .select(
            "group_l",
            "group_r",
            "n_pairs",
            "matched_l",
            "matched_r",
            F.round(F.col("_qsum").cast("double") / 1000000.0, 6).alias("sum_weight"),
            F.round(
                F.greatest(
                    F.col("matched_l").cast("double") / F.col("_nl").cast("double"),
                    F.col("matched_r").cast("double") / F.col("_nr").cast("double"),
                ),
                6,
            ).alias("containment"),
        )
    )


def group_match_profile_sql(
    pairs_sql: str,
    memberships_sql: str,
    *,
    id_l: str = "id_l",
    id_r: str = "id_r",
    weight_col: str = "weight",
    id_col: str = "id",
    group_col: str = "grp",
    min_pairs: int = 1,
) -> str:
    """DuckDB oracle twin of :func:`group_match_profile`."""
    return f"""
        WITH m AS (
            SELECT {id_col} AS _mid, {group_col} AS _g FROM ({memberships_sql})
        ),
        sizes AS (SELECT _g, count(*) AS _n FROM m GROUP BY _g),
        e AS (
            SELECT p.{id_l} AS _a, p.{id_r} AS _b,
                   CAST(floor(p.{weight_col} * 1000000) AS BIGINT) AS _qw,
                   ma._g AS _ga, mb._g AS _gb
            FROM ({pairs_sql}) p
            JOIN m ma ON ma._mid = p.{id_l}
            JOIN m mb ON mb._mid = p.{id_r}
            WHERE ma._g <> mb._g
        ),
        canon AS (
            SELECT CASE WHEN _ga > _gb THEN _gb ELSE _ga END AS group_l,
                   CASE WHEN _ga > _gb THEN _ga ELSE _gb END AS group_r,
                   CASE WHEN _ga > _gb THEN _b ELSE _a END AS _ml,
                   CASE WHEN _ga > _gb THEN _a ELSE _b END AS _mr,
                   _qw
            FROM e
        ),
        agg AS (
            SELECT group_l, group_r,
                   count(*) AS n_pairs,
                   count(DISTINCT _ml) AS matched_l,
                   count(DISTINCT _mr) AS matched_r,
                   CAST(sum(_qw) AS BIGINT) AS _qsum
            FROM canon GROUP BY group_l, group_r
            HAVING count(*) >= {min_pairs}
        )
        SELECT a.group_l, a.group_r, a.n_pairs, a.matched_l, a.matched_r,
               round(CAST(a._qsum AS DOUBLE) / 1000000.0, 6) AS sum_weight,
               round(greatest(
                   CAST(a.matched_l AS DOUBLE) / CAST(sl._n AS DOUBLE),
                   CAST(a.matched_r AS DOUBLE) / CAST(sr._n AS DOUBLE)), 6)
                   AS containment
        FROM agg a
        JOIN sizes sl ON sl._g = a.group_l
        JOIN sizes sr ON sr._g = a.group_r
    """
