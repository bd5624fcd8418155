"""One-to-one match assignment (mutual best match).

BigMatch emits many-to-many candidate matches and leaves 1:1 enforcement
to the human review pass (app/MatchReview.py accept loop — a reviewer
accepts at most one partner per record by hand).  At pipeline scale the
standard published device (record-linkage literature's "mutual best
match" / symmetric best agreement) is: keep pair (r, m) iff m is r's
best-weighted partner AND r is m's best-weighted partner.  It
under-assigns slightly versus the Hungarian algorithm's global optimum,
but is embarrassingly parallel — the global methods are inherently
sequential and do not exist at 10^12 rows.

Scale design: each side's argmax is ONE map-side-combined
``groupBy().agg(min(struct(-weight, partner)))`` — no window, no
partition sort, no skew pathology (a hot record's pairs partial-aggregate
to one row per map task before the shuffle).  Two aggs + two semi-joins;
ties break deterministically to the smallest partner id.

Weights are compared after rounding to 6dp so engine-level FP noise in
the last ulp cannot flip an argmax (the same discipline the driver's
oracle hashing uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _best_per_side(
    pairs: DataFrame, side: str, other: str, weight_col: str
) -> DataFrame:
    """For each `side` id: the (other id) of its max-weight pair, ties to
    the smallest other id.  min(struct(-w, other)) == argmax with that
    tie-break, computed map-side."""
    w6 = F.round(F.col(weight_col), 6)
    return pairs.groupBy(F.col(side)).agg(
        F.min(F.struct((-w6).alias("nw"), F.col(other).alias("p"))).alias("b")
    ).select(
        # distinct names so the semi-join back against `pairs` (a self
        # derivation) never resolves to the same attribute on both sides
        F.col(side).alias("_bk"),
        F.col("b.p").alias(f"best_{other}"),
    )


def one_to_one(
    pairs: DataFrame,
    rec_col: str = "id_rec",
    mem_col: str = "id_mem",
    weight_col: str = "weight",
    assume_distinct: bool = False,
) -> DataFrame:
    """Mutual-best-match filter: the pairs where each side is the other's
    best partner.  Output columns: (rec_col, mem_col, weight_col).

    Non-distinct input — the same (rec, mem) pair appearing twice, possibly
    at different weights — is collapsed to its max weight FIRST, so the
    result is one row per kept pair exactly like the row_number oracle
    (ADVICE r3: the semi-join formulation would otherwise emit the
    duplicates).  The collapse is one map-side-combined groupBy; callers
    whose pairs are distinct by construction (e.g. `first_pass_wins`
    output) can pass ``assume_distinct=True`` to skip that shuffle."""
    cols = [F.col(rec_col), F.col(mem_col), F.col(weight_col)]
    if assume_distinct:
        d = pairs.select(*cols)
    else:
        d = pairs.groupBy(rec_col, mem_col).agg(
            F.max(F.col(weight_col)).alias(weight_col)
        )
    best_r = _best_per_side(d, rec_col, mem_col, weight_col)
    best_m = _best_per_side(d, mem_col, rec_col, weight_col)
    return (
        d.join(
            best_r,
            (d[rec_col] == best_r["_bk"])
            & (d[mem_col] == best_r[f"best_{mem_col}"]),
            "left_semi",
        )
        .join(
            best_m,
            (d[mem_col] == best_m["_bk"])
            & (d[rec_col] == best_m[f"best_{rec_col}"]),
            "left_semi",
        )
    )


def one_to_one_sql(
    pairs_sql: str,
    rec_col: str = "id_rec",
    mem_col: str = "id_mem",
    weight_col: str = "weight",
) -> str:
    """DuckDB twin of :func:`one_to_one` (row_number argmax — same pair
    selection: weight desc after 6dp rounding, ties to smallest id; same
    duplicate-pair collapse to max weight first)."""
    return f"""
        SELECT {rec_col}, {mem_col}, {weight_col}
        FROM (
            SELECT d.*,
                   row_number() OVER (
                       PARTITION BY {rec_col}
                       ORDER BY round({weight_col}, 6) DESC, {mem_col} ASC
                   ) AS rk_r,
                   row_number() OVER (
                       PARTITION BY {mem_col}
                       ORDER BY round({weight_col}, 6) DESC, {rec_col} ASC
                   ) AS rk_m
            FROM (
                SELECT {rec_col}, {mem_col}, max({weight_col}) AS {weight_col}
                FROM ({pairs_sql}) p
                GROUP BY {rec_col}, {mem_col}
            ) d
        )
        WHERE rk_r = 1 AND rk_m = 1
    """
