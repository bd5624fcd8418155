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


def otsu_cutoff(
    pairs: DataFrame,
    weight_col: str = "weight",
    bin_width: float = 0.5,
) -> DataFrame:
    """Unsupervised cutoff by Otsu's method over the weight histogram.

    The FS weight distribution of blocked candidate pairs is bimodal —
    a non-match mass near Σ disagreement weights and a match mass near
    Σ agreement weights (Fellegi-Sunter 1969 §5 is exactly this mixture).
    Otsu (1979) picks the threshold maximizing the between-class variance

        σ²_B(t) = W0·W1·(μ0 − μ1)²

    over the binned distribution — no labels, no EM, no prevalence guess:
    the empirical complement to the calibrated closed form
    (:func:`suggest_cutoffs`) and the labeled sweep
    (``evaluate.cutoff_sweep``). The reference leaves this judgment to a
    human paging through MatchReview (`/root/reference/app/MatchReview.py:26`).

    Scale + parity design: the pair table collapses to the O(#bins)
    histogram in one map-side-combined groupBy (same contract as
    :func:`weight_histogram`); the Otsu scan then runs as windows over
    that tiny frame (the deliberate O(bins) unpartitioned window, same
    pattern as SNM's offsets frame). All sums are EXACT integers (counts
    and count·bin-index products); the only floats are the final score —
    one identical expression tree over identical integers on both engines,
    so IEEE-754 makes it bit-equal — and the bin-edge arithmetic.

    Returns ONE row (or zero when the histogram has <2 bins — no split
    exists): (cutoff_bin, cutoff_weight, n_below, n_above, score) where
    cutoff_weight = (cutoff_bin+1)·bin_width is the smallest weight
    classified into the upper (match) class and score = σ²_B/N² in
    bin-index units, rounded to 6dp.
    """
    from pyspark.sql import Window

    w = F.col(weight_col)
    hist = (
        pairs.withColumn("bin", F.floor(w / F.lit(bin_width)).cast("long"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    all_w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        hist.withColumn("n_tot", F.sum("n").over(all_w))
        .withColumn("s_tot", F.sum(F.col("n") * F.col("bin")).over(all_w))
        .withColumn("w0", F.sum("n").over(cum_w))
        .withColumn("s0", F.sum(F.col("n") * F.col("bin")).over(cum_w))
        .filter(F.col("w0") < F.col("n_tot"))  # upper class non-empty
        .withColumn("w1", F.col("n_tot") - F.col("w0"))
        .withColumn("s1", F.col("s_tot") - F.col("s0"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = d("s0") * d("w1") - d("s1") * d("w0")
    score = (diff * diff) / (d("w0") * d("w1") * d("n_tot") * d("n_tot"))
    ranked = scored.withColumn("score", F.round(score, 6)).withColumn(
        "_best",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("bin").asc())
        ),
    )
    return ranked.filter(F.col("_best") == 1).select(
        F.col("bin").alias("cutoff_bin"),
        F.round((F.col("bin") + 1) * F.lit(bin_width), 6).alias("cutoff_weight"),
        F.col("w0").alias("n_below"),
        F.col("w1").alias("n_above"),
        "score",
    )


def otsu_cutoff_sql(
    pairs_sql: str,
    weight_col: str = "weight",
    bin_width: float = 0.5,
) -> str:
    """Oracle twin of :func:`otsu_cutoff`: identical binning, identical
    integer cumulative sums, the identical double expression tree for the
    score, identical (score DESC, bin ASC) argmax."""
    return f"""
WITH oh AS (
    SELECT CAST(floor({weight_col} / {bin_width!r}) AS BIGINT) AS bin,
           count(*) AS n
    FROM ({pairs_sql})
    GROUP BY 1
),
oc AS (
    SELECT bin,
           sum(n) OVER () AS n_tot,
           sum(n * bin) OVER () AS s_tot,
           sum(n) OVER (ORDER BY bin) AS w0,
           sum(n * bin) OVER (ORDER BY bin) AS s0
    FROM oh
),
os AS (
    SELECT bin, w0, n_tot - w0 AS w1, s0, s_tot - s0 AS s1, n_tot
    FROM oc WHERE w0 < n_tot
),
ox AS (
    SELECT bin, w0, w1,
           round(
             ((CAST(s0 AS DOUBLE) * CAST(w1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(w0 AS DOUBLE))
              * (CAST(s0 AS DOUBLE) * CAST(w1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(w0 AS DOUBLE)))
             / (CAST(w0 AS DOUBLE) * CAST(w1 AS DOUBLE)
                * CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)),
             6) AS score
    FROM os
)
SELECT bin AS cutoff_bin,
       round((bin + 1) * CAST({bin_width!r} AS DOUBLE), 6) AS cutoff_weight,
       CAST(w0 AS BIGINT) AS n_below, CAST(w1 AS BIGINT) AS n_above, score
FROM ox
ORDER BY score DESC, bin ASC
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Fellegi-Sunter optimal error-bounded decision rule
# ---------------------------------------------------------------------------


def fs_optimal_rule(
    pairs: DataFrame,
    match_fields,
    mu: float = 0.001,
    fnr_lambda: float = 0.05,
    rec_prefix: str = "rec_",
    mem_prefix: str = "mem_",
    n_iter: int = None,  # type: ignore[assignment]
) -> DataFrame:
    """The ORIGINAL Fellegi-Sunter theorem (FS 1969, Theorem 1): the
    optimal linkage rule at error bounds (mu, lambda) orders the gamma
    patterns by likelihood ratio P(gamma|M)/P(gamma|U) and designates the
    top patterns LINK until their cumulative U-mass reaches ``mu`` (the
    false-match rate among true non-matches), the bottom patterns
    NONLINK until their cumulative M-mass reaches ``fnr_lambda`` (the
    false-nonmatch rate), and everything between CLERICAL — the smallest
    possible clerical-review region at those error levels.

    The reference leaves this to the analyst's eyeball on the sorted
    weight file (`/root/reference/app/MatchReview.py:26,69`); with EM
    calibration (:mod:`.em`) the rule is computable. Output: one row per
    gamma pattern (the FULL 2^K space, observed or not) with the
    class-conditional masses, the log2 weight, both cumulative error
    rates, the observed pair count, and the designation.

    Scale design: one map-side-combined histogram pass over the pairs
    (the same sufficient statistic every EM estimator here uses); the
    rule itself is O(2^K) driver-side arithmetic and the result is a
    2^K-row literal frame. Nothing downstream of the single groupBy
    touches the pair table.
    """
    from bigmatch_utilities_spark.operators.em import (
        N_ITER,
        em_fit,
        pattern_histogram,
    )

    if n_iter is None:
        n_iter = N_ITER
    gcols = [f"g_{mf.name}" for mf in match_fields]
    rows = pattern_histogram(pairs, match_fields, rec_prefix, mem_prefix).collect()
    hist = {
        tuple(int(r[c]) for c in gcols): float(r["n"]) for r in rows
    }
    if not hist:
        raise ValueError("fs_optimal_rule: no candidate pairs")
    lam, m, u = em_fit(list(hist.items()), len(match_fields), n_iter)

    K = len(match_fields)
    pats = []
    for code in range(2 ** K):
        g = tuple((code >> (K - 1 - k)) & 1 for k in range(K))
        pm = 1.0
        pu = 1.0
        for k in range(K):
            pm *= m[k] if g[k] else 1.0 - m[k]
            pu *= u[k] if g[k] else 1.0 - u[k]
        pats.append((g, pm, pu))
    # likelihood-ratio order, desc; tiebreak on the pattern tuple asc —
    # the identical ORDER BY the SQL twin uses
    by_ratio = sorted(pats, key=lambda t: (-(t[1] / t[2]), t[0]))
    cum_u = {}
    acc = 0.0
    for g, pm, pu in by_ratio:
        acc += pu
        cum_u[g] = acc
    cum_m = {}
    acc = 0.0
    for g, pm, pu in reversed(by_ratio):
        acc += pm
        cum_m[g] = acc
    out = []
    for g, pm, pu in by_ratio:
        if cum_u[g] <= mu:
            desig = "link"
        elif cum_m[g] <= fnr_lambda:
            desig = "nonlink"
        else:
            desig = "clerical"
        out.append(
            (
                *[int(x) for x in g],
                round(math.log2(pm / pu), 6),
                round(pm, 6),
                round(pu, 6),
                round(cum_u[g], 6),
                round(cum_m[g], 6),
                int(hist.get(g, 0.0)),
                desig,
            )
        )
    schema = (
        ", ".join(f"{c} int" for c in gcols)
        + ", weight double, p_m double, p_u double, cum_fmr double, "
        "cum_fnr double, n_pairs long, designation string"
    )
    return pairs.sparkSession.createDataFrame(out, schema)


def fs_optimal_rule_sql(
    pairs_sql: str,
    match_fields,
    mu: float = 0.001,
    fnr_lambda: float = 0.05,
    rec_prefix: str = "rec_",
    mem_prefix: str = "mem_",
    n_iter: int = None,  # type: ignore[assignment]
) -> str:
    """DuckDB twin of :func:`fs_optimal_rule`: the shared unrolled-EM
    state CTEs, the full 2^K pattern lattice via chained CROSS JOINs,
    and ROWS-framed window cumsums over the identical (ratio DESC,
    pattern ASC) order — same fold order, same 6dp rounding."""
    from bigmatch_utilities_spark.operators.em import (
        INIT_LAMBDA,
        INIT_M,
        INIT_U,
        N_ITER,
        _em_state_ctes,
    )
    from bigmatch_utilities_spark.operators.scoring import PARTIAL_FLOOR

    if n_iter is None:
        n_iter = N_ITER
    K = len(match_fields)
    ctes = _em_state_ctes(
        pairs_sql, match_fields, rec_prefix, mem_prefix, PARTIAL_FLOOR,
        n_iter, INIT_LAMBDA, INIT_M, INIT_U,
    )
    lattice = " CROSS JOIN ".join(
        f"(SELECT * FROM (VALUES (0), (1)) t{k}(g{k}))" for k in range(K)
    )
    pm = " * ".join(
        f"(CASE WHEN g{k} = 1 THEN s.m{k} ELSE 1.0 - s.m{k} END)"
        for k in range(K)
    )
    pu = " * ".join(
        f"(CASE WHEN g{k} = 1 THEN s.u{k} ELSE 1.0 - s.u{k} END)"
        for k in range(K)
    )
    gl = ", ".join(f"g{k}" for k in range(K))
    order_asc = ", ".join(f"g{k} ASC" for k in range(K))
    ctes.append(f"lat AS (SELECT {gl} FROM {lattice})")
    ctes.append(
        f"pp AS (SELECT {gl}, {pm} AS pm, {pu} AS pu "
        f"FROM lat CROSS JOIN s{n_iter} s)"
    )
    ctes.append(
        f"""cw AS (
          SELECT {gl}, pm, pu,
                 SUM(pu) OVER (ORDER BY pm / pu DESC, {order_asc}
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_u,
                 SUM(pm) OVER (ORDER BY pm / pu ASC, {order_asc.replace(' ASC', ' DESC')}
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_m
          FROM pp)"""
    )
    gout = ", ".join(
        f"cw.g{k} AS g_{mf.name}" for k, mf in enumerate(match_fields)
    )
    hjoin = " AND ".join(f"cw.g{k} = h.g{k}" for k in range(K))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT {gout},
               round(log2(pm / pu), 6) AS weight,
               round(pm, 6) AS p_m,
               round(pu, 6) AS p_u,
               round(cum_u, 6) AS cum_fmr,
               round(cum_m, 6) AS cum_fnr,
               CAST(coalesce(h.n, 0) AS BIGINT) AS n_pairs,
               CASE WHEN cum_u <= {float(mu)!r} THEN 'link'
                    WHEN cum_m <= {float(fnr_lambda)!r} THEN 'nonlink'
                    ELSE 'clerical' END AS designation
        FROM cw LEFT JOIN h ON {hjoin}
    """
    )
