"""Weight histogram + posterior match probability + cutoff suggestion.

Picking the accept / print cutoffs is the entire purpose of the
reference's MatchReview screen: the user pages through weight-sorted
pairs "looking for the cutoff between acceptable and non-acceptable
matches" (`/root/reference/app/MatchReview.py:26,69` — `accept_threshold`
is hand-set).  Given Fellegi-Sunter calibration (m/u/λ — e.g. from
:mod:`.em`), the cutoff has a closed form instead: the pair weight w is
a log2 likelihood ratio, so

    posterior odds = prior odds · 2^w,
    P(match | w)  = λ·2^w / (λ·2^w + (1-λ))

and the weight at which the posterior reaches a target p is

    w*(p) = log2(p/(1-p)) - log2(λ/(1-λ)).

``suggest_cutoffs`` turns (λ, p_accept, p_review) into the parmf cutoff
pair; ``weight_histogram`` is the one-pass distribution view the human
still wants for sanity — a map-side-combined groupBy on the binned
weight, never a sort of the pair table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_probability(weight, lam: float):
    """Column: posterior P(match | weight) under prevalence ``lam``."""
    w = F.col(weight) if isinstance(weight, str) else weight
    num = F.lit(lam) * F.pow(F.lit(2.0), w)
    return num / (num + F.lit(1.0 - lam))


def match_probability_sql(weight_expr: str, lam: float) -> str:
    """DuckDB twin of :func:`match_probability` (same double arithmetic)."""
    num = f"({lam!r} * power(2.0, {weight_expr}))"
    return f"({num} / ({num} + {1.0 - lam!r}))"


def weight_cutoff_for(p: float, lam: float) -> float:
    """The weight at which P(match | w) = p given prevalence lam."""
    return math.log2(p / (1.0 - p)) - math.log2(lam / (1.0 - lam))


def suggest_cutoffs(
    lam: float, p_accept: float = 0.99, p_review: float = 0.5
) -> tuple[float, float]:
    """(accept_cutoff, print_cutoff) — the parmf pair, from calibration.

    Pairs above accept are auto-matches (posterior ≥ p_accept); between
    print and accept is the clerical band (posterior ≥ p_review); below
    print is discarded — the exact semantics of the reference's cutoff /
    print-cutoff pair, now derived instead of eyeballed.
    """
    return weight_cutoff_for(p_accept, lam), weight_cutoff_for(p_review, lam)


def weight_histogram(
    pairs: DataFrame,
    weight_col: str = "weight",
    bin_width: float = 0.5,
    lam: float | None = None,
) -> DataFrame:
    """Binned weight distribution: (bin, n_pairs, w_min, w_max[, p_match]).

    bin = floor(weight / bin_width); p_match (when lam is given) is the
    posterior at the bin's lower edge.  One map-side-combined groupBy —
    at 10^12 pairs the shuffle moves num_partitions × n_bins tiny rows;
    no ordering of the pair table is ever required.
    """
    w = F.col(weight_col)
    binned = pairs.withColumn("bin", F.floor(w / F.lit(bin_width)).cast("long"))
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min(w), 6).alias("w_min"),
        F.round(F.max(w), 6).alias("w_max"),
    )
    if lam is None:
        return agg
    edge = F.col("bin").cast("double") * F.lit(bin_width)
    return agg.withColumn(
        "p_match", F.round(match_probability(edge, lam), 6)
    )


def weight_histogram_sql(
    pairs_sql: str,
    weight_col: str = "weight",
    bin_width: float = 0.5,
    lam: float | None = None,
) -> str:
    """DuckDB twin of :func:`weight_histogram`."""
    p = (
        f", round({match_probability_sql(f'(bin * {bin_width!r})', lam)}, 6)"
        f" AS p_match"
        if lam is not None
        else ""
    )
    return f"""
        SELECT bin, count(*) AS n_pairs,
               round(min({weight_col}), 6) AS w_min,
               round(max({weight_col}), 6) AS w_max{p}
        FROM (
            SELECT *, CAST(floor({weight_col} / {bin_width!r}) AS BIGINT) AS bin
            FROM ({pairs_sql})
        )
        GROUP BY bin
    """
