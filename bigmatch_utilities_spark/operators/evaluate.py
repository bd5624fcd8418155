"""Pairwise linkage evaluation: precision / recall / F1 vs labeled pairs.

The north rule grades the engine on pairwise F1 ≥ 0.99 against the
reference's labeled decisions at shared blocking keys; the reference
itself has no evaluation tooling (decisions are eyeballed in MatchReview,
`/root/reference/app/MatchReview.py:26`).  This operator makes the
metric a first-class, distributed computation: canonicalize both pair
sets (unordered pairs), count tp/fp/fn with two joins, emit one row.

Scale design: pairs are canonicalized map-side (least/greatest) and
deduplicated; tp is one equi-join on the composite pair key, fp/fn are
the two anti-join counts.  All shuffles are keyed on the pair id — no
windows, no collect; the output is a single row of counters, so the
final agg is map-side-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_pairs(df: DataFrame, id_l: str, id_r: str) -> DataFrame:
    return (
        df.select(
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def pairwise_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> DataFrame:
    """One row: n_pred, n_truth, tp, fp, fn, precision, recall, f1 (6dp).

    Both inputs are treated as UNORDERED pair sets (canonicalized and
    deduplicated before comparison).
    """
    p = _canon_pairs(predicted, id_l, id_r)
    t = _canon_pairs(truth, id_l, id_r)
    merged = (
        p.withColumn("_p", F.lit(1))
        .join(t.withColumn("_t", F.lit(1)), on=["a", "b"], how="full_outer")
        .agg(
            F.sum(F.coalesce("_p", F.lit(0))).cast("long").alias("n_pred"),
            F.sum(F.coalesce("_t", F.lit(0))).cast("long").alias("n_truth"),
            F.sum(
                F.coalesce("_p", F.lit(0)) * F.coalesce("_t", F.lit(0))
            ).cast("long").alias("tp"),
        )
    )
    tp = F.col("tp").cast("double")
    # f1 via the algebraic identity 2·tp/(n_pred+n_truth) — equal to the
    # harmonic mean when tp > 0 and a well-defined 0 when tp = 0; empty
    # sets yield NULL (try_divide), mirrored by NULLIF in the SQL twin
    return merged.select(
        "n_pred",
        "n_truth",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.round(F.try_divide(tp, F.col("n_pred")), 6).alias("precision"),
        F.round(F.try_divide(tp, F.col("n_truth")), 6).alias("recall"),
        F.round(
            F.try_divide(2.0 * tp, F.col("n_pred") + F.col("n_truth")), 6
        ).alias("f1"),
    )


def pass_completeness(
    cands: DataFrame,
    truth: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
    pass_col: str = "pass_id",
) -> DataFrame:
    """Per-blocking-pass recall audit: Christen's pair completeness (PC)
    and pair quality (PQ), plus the cumulative first-wins completeness
    the multi-pass union actually delivers.

    `cands` carries one row per (pass, pair) candidate; `truth` is the
    labeled true-pair set.  Output, one row per pass in pass order:

        pass_id, n_cands,    -- distinct canonical pairs this pass emits
        n_new,               -- pairs whose FIRST finding pass is this one
        n_hits,              -- this pass's pairs that are true pairs
        pc,                  -- n_hits / |truth|   (per-pass completeness)
        pq,                  -- n_hits / n_cands   (per-pass quality)
        cum_hits, cum_pc     -- truth recovered by passes <= this one

    This is the data-side answer to "is pass 3 worth its shuffle?": a
    pass with pq ~ 0 and cum_pc flat is pure cost.  The reference's parmf
    counts (`/root/reference/app/BlockingPass.py:588-647`) are spec-side
    only; BigMatch users learn a pass is dead weight from the run clock.

    Scale design: pairs are canonicalized map-side and deduplicated per
    pass (one shuffle keyed on the pair); the first-wins frame is a
    map-side-combined `min(pass)` over the same key; truth is a labeled
    SAMPLE in practice — small — so both hit-joins broadcast it; the
    per-pass aggregate is O(#passes) rows, on which the cumulative
    window is deliberate driver-scale metadata, not data.
    """
    c = (
        cands.select(
            F.col(pass_col).alias("p"),
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    t = _canon_pairs(truth, id_l, id_r)
    n_truth = t.agg(F.count(F.lit(1)).alias("_nt"))

    hit = F.broadcast(t.withColumn("_hit", F.lit(1)))
    per_pass = (
        c.join(hit, on=["a", "b"], how="left")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    first = (
        c.groupBy("a", "b")
        .agg(F.min("p").alias("p"))
        .join(hit, on=["a", "b"], how="left")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("_new_hits"),
        )
    )
    # O(#passes) rows from here on: the unpartitioned cumulative window is
    # the same deliberate driver-scale frame as sorted_neighborhood's
    # offsets (a handful of rows at any data scale)
    from pyspark.sql import Window

    cum = F.sum(F.coalesce("_new_hits", F.lit(0))).over(
        Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_pass.join(first, "p", "left")
        .withColumn("cum_hits", cum.cast("long"))
        .crossJoin(F.broadcast(n_truth))
        .select(
            F.col("p").alias(pass_col),
            "n_cands",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            "n_hits",
            F.round(F.try_divide(F.col("n_hits").cast("double"), "_nt"), 6).alias(
                "pc"
            ),
            F.round(
                F.try_divide(F.col("n_hits").cast("double"), "n_cands"), 6
            ).alias("pq"),
            "cum_hits",
            F.round(F.try_divide(F.col("cum_hits").cast("double"), "_nt"), 6).alias(
                "cum_pc"
            ),
        )
        .orderBy(pass_col)
    )


def cluster_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    label_col: str = "label",
) -> DataFrame:
    """Cluster-level linkage evaluation: B-cubed precision/recall/F1
    (Bagga & Baldwin 1998; the extrinsic-constraints winner in Amigó et
    al. 2009) plus the Adjusted Rand Index, one output row.

    Pairwise F1 (:func:`pairwise_metrics`) over-weights big clusters — a
    single over-merge of two n-record entities costs n² pair errors while
    n singleton misses cost n.  B-cubed averages per RECORD: for record i
    with predicted cluster C(i) and true entity L(i),

        P(i) = |C(i) ∩ L(i)| / |C(i)|,   R(i) = |C(i) ∩ L(i)| / |L(i)|

    and B³P / B³R are the means over records.  ARI is the chance-corrected
    pair-counting index over the same contingency table.  Records present
    in only one input are dropped (inner join) — evaluation is defined on
    the labeled subset.

    Cross-engine determinism: the contingency table and every combination
    count are exact integers.  The B-cubed sums quantize each cell's
    contribution at 1e-6 with INTEGER division before summing (same
    discipline as operators/tfidf_sim.py's weight quantization), so the
    shuffled sums are integer-exact in both engines; the final divides are
    single double ops on exact integers, rounded to 6dp like every float
    the driver compares.  ARI's expected-index term is one double
    multiply+divide on exact integers with the identical expression shape
    in the SQL twin.  The bigint-scaled cell sums overflow only past
    Σ_cells n_cl² > 9.2e12 — beyond that swap the 1e6 literal for a
    DECIMAL(38,0) cast; at that point the metric itself (a global judge
    over one labeled sample) should be run on a sample anyway.

    Scale design: one shuffle to join labels onto predictions (broadcast
    when truth is a labeled sample — the common case), one map-side
    combined groupBy for the cells, two more for the marginals, then
    everything is O(#clusters + #labels) rows collapsing into a 1-row
    aggregate.  No windows, no collect.
    """
    j = predicted.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    ).join(
        truth.select(F.col(id_col).alias("_id"), F.col(label_col).alias("_l")),
        "_id",
    )
    cells = j.groupBy("_c", "_l").agg(F.count(F.lit(1)).alias("n_cl"))
    c_sizes = cells.groupBy("_c").agg(F.sum("n_cl").alias("n_c"))
    l_sizes = cells.groupBy("_l").agg(F.sum("n_cl").alias("n_l"))
    enriched = cells.join(c_sizes, "_c").join(l_sizes, "_l")
    agg = enriched.agg(
        F.sum("n_cl").cast("long").alias("n_items"),
        F.count_distinct("_c").alias("n_clusters"),
        F.count_distinct("_l").alias("n_labels"),
        # 1e-6-quantized per-cell B³ contributions, summed in exact integers
        F.sum(F.expr("(1000000 * n_cl * n_cl) div n_c")).cast("long").alias("_ps"),
        F.sum(F.expr("(1000000 * n_cl * n_cl) div n_l")).cast("long").alias("_rs"),
        # pair counts for ARI — n*(n-1) is always even, so `div 2` is exact
        F.sum(F.expr("(n_cl * (n_cl - 1)) div 2")).cast("long").alias("_cell2"),
    )
    marg = (
        c_sizes.agg(
            F.sum(F.expr("(n_c * (n_c - 1)) div 2")).cast("long").alias("_c2")
        )
        .crossJoin(
            l_sizes.agg(
                F.sum(F.expr("(n_l * (n_l - 1)) div 2")).cast("long").alias("_l2")
            )
        )
    )
    out = agg.crossJoin(F.broadcast(marg))
    n = F.col("n_items").cast("double")
    p = F.col("_ps").cast("double") / (F.lit(1000000.0) * n)
    r = F.col("_rs").cast("double") / (F.lit(1000000.0) * n)
    npairs = F.expr("(n_items * (n_items - 1)) div 2").cast("double")
    expected = F.col("_c2").cast("double") * F.col("_l2").cast("double") / npairs
    max_idx = (F.col("_c2").cast("double") + F.col("_l2").cast("double")) / 2.0
    return out.select(
        "n_items",
        "n_clusters",
        "n_labels",
        F.round(p, 6).alias("b3_precision"),
        F.round(r, 6).alias("b3_recall"),
        F.round(F.try_divide(2.0 * p * r, p + r), 6).alias("b3_f1"),
        F.round(
            F.try_divide(F.col("_cell2").cast("double") - expected, max_idx - expected),
            6,
        ).alias("ari"),
    )


def cluster_metrics_sql(
    predicted_sql: str,
    truth_sql: str,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`cluster_metrics` — identical integer
    quantization and double-expression shapes."""
    return f"""
        WITH j AS (
            SELECT p.{id_col} AS _id, p.{cluster_col} AS _c, t.{label_col} AS _l
            FROM ({predicted_sql}) p JOIN ({truth_sql}) t
              ON p.{id_col} = t.{id_col}
        ), cells AS (
            SELECT _c, _l, count(*) AS n_cl FROM j GROUP BY _c, _l
        ), cs AS (SELECT _c, sum(n_cl) AS n_c FROM cells GROUP BY _c),
        ls AS (SELECT _l, sum(n_cl) AS n_l FROM cells GROUP BY _l),
        en AS (
            SELECT cells.*, cs.n_c, ls.n_l
            FROM cells JOIN cs USING (_c) JOIN ls USING (_l)
        ), agg AS (
            SELECT CAST(sum(n_cl) AS BIGINT) AS n_items,
                   count(DISTINCT _c) AS n_clusters,
                   count(DISTINCT _l) AS n_labels,
                   CAST(sum((1000000 * n_cl * n_cl) // n_c) AS BIGINT) AS _ps,
                   CAST(sum((1000000 * n_cl * n_cl) // n_l) AS BIGINT) AS _rs,
                   CAST(sum((n_cl * (n_cl - 1)) // 2) AS BIGINT) AS _cell2
            FROM en
        ), marg AS (
            SELECT CAST((SELECT sum((n_c * (n_c - 1)) // 2) FROM cs) AS BIGINT) AS _c2,
                   CAST((SELECT sum((n_l * (n_l - 1)) // 2) FROM ls) AS BIGINT) AS _l2
        )
        SELECT n_items, n_clusters, n_labels,
               round(CAST(_ps AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE)), 6)
                   AS b3_precision,
               round(CAST(_rs AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE)), 6)
                   AS b3_recall,
               round(
                 (2.0 * (CAST(_ps AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE)))
                      * (CAST(_rs AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE))))
                 / NULLIF((CAST(_ps AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE)))
                        + (CAST(_rs AS DOUBLE) / (1000000.0 * CAST(n_items AS DOUBLE))), 0),
                 6) AS b3_f1,
               round(
                 (CAST(_cell2 AS DOUBLE)
                    - CAST(_c2 AS DOUBLE) * CAST(_l2 AS DOUBLE)
                      / CAST((n_items * (n_items - 1)) // 2 AS DOUBLE))
                 / NULLIF(
                     (CAST(_c2 AS DOUBLE) + CAST(_l2 AS DOUBLE)) / 2.0
                       - CAST(_c2 AS DOUBLE) * CAST(_l2 AS DOUBLE)
                         / CAST((n_items * (n_items - 1)) // 2 AS DOUBLE), 0),
                 6) AS ari
        FROM agg CROSS JOIN marg
    """


def pass_completeness_sql(
    cands_sql: str,
    truth_sql: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
    pass_col: str = "pass_id",
) -> str:
    """DuckDB twin of :func:`pass_completeness`."""
    return f"""
        WITH c AS (
            SELECT DISTINCT {pass_col} AS p,
                            least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({cands_sql}) WHERE {id_l} <> {id_r}
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), nt AS (SELECT count(*) AS _nt FROM t),
        per_pass AS (
            SELECT c.p, count(*) AS n_cands,
                   count(t.a) AS n_hits
            FROM c LEFT JOIN t ON c.a = t.a AND c.b = t.b
            GROUP BY c.p
        ), first AS (
            SELECT f.p, count(*) AS n_new, count(t.a) AS _new_hits
            FROM (SELECT a, b, min(p) AS p FROM c GROUP BY a, b) f
            LEFT JOIN t ON f.a = t.a AND f.b = t.b
            GROUP BY f.p
        )
        SELECT per_pass.p AS {pass_col},
               n_cands,
               coalesce(n_new, 0) AS n_new,
               n_hits,
               round(CAST(n_hits AS DOUBLE) / NULLIF(_nt, 0), 6) AS pc,
               round(CAST(n_hits AS DOUBLE) / NULLIF(n_cands, 0), 6) AS pq,
               CAST(sum(coalesce(_new_hits, 0))
                        OVER (ORDER BY per_pass.p ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_hits,
               round(CAST(sum(coalesce(_new_hits, 0))
                              OVER (ORDER BY per_pass.p
                                    ROWS UNBOUNDED PRECEDING)
                          AS DOUBLE) / NULLIF(_nt, 0), 6) AS cum_pc
        FROM per_pass LEFT JOIN first ON per_pass.p = first.p
        CROSS JOIN nt
        ORDER BY per_pass.p
    """


def pairwise_metrics_sql(
    predicted_sql: str,
    truth_sql: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> str:
    """DuckDB twin of :func:`pairwise_metrics`."""
    return f"""
        WITH p AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({predicted_sql}) WHERE {id_l} <> {id_r}
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), m AS (
            SELECT count(*) FILTER (WHERE p.a IS NOT NULL) AS n_pred,
                   count(*) FILTER (WHERE t.a IS NOT NULL) AS n_truth,
                   count(*) FILTER (WHERE p.a IS NOT NULL AND t.a IS NOT NULL) AS tp
            FROM p FULL OUTER JOIN t ON p.a = t.a AND p.b = t.b
        )
        SELECT n_pred, n_truth, tp,
               n_pred - tp AS fp,
               n_truth - tp AS fn,
               round(CAST(tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision,
               round(CAST(tp AS DOUBLE) / NULLIF(n_truth, 0), 6) AS recall,
               round(2.0 * CAST(tp AS DOUBLE) / NULLIF(n_pred + n_truth, 0),
                     6) AS f1
        FROM m
    """


def cutoff_sweep(
    scored: DataFrame,
    truth: DataFrame,
    thresholds: list[float],
    id_l: str = "id_l",
    id_r: str = "id_r",
    weight_col: str = "weight",
) -> DataFrame:
    """Precision/recall/F1 at every candidate cutoff, from ONE pass.

    The reference leaves cutoff choice to the analyst staring at the
    sorted weight file (`/root/reference/app/BigMatchParmFile.py`
    cutoff rows; `app/MatchReview.py` review pane); `cutoffs.py` gives
    the model-based suggestion.  This is the empirical complement: given
    scored pairs and a labeled truth sample, emit the full operating
    curve — one row per threshold with (n_pred, tp, fp, fn, precision,
    recall, f1) as if the accept cutoff were set there.

    Scale design: the scored and truth pair sets are canonicalized and
    full-outer-joined ONCE (the only shuffle, keyed on the pair id);
    every threshold is then a conditional map-side-combined aggregate
    over that merged frame — sweeping 5 or 500 cutoffs costs the same
    single pass, no per-threshold scan, no window over the sorted
    weights.  The per-threshold explode happens on a 1-row frame.
    """
    s = (
        scored.select(
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
            F.col(weight_col).alias("_w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.max("_w").alias("_w"))
    )
    t = _canon_pairs(truth, id_l, id_r)
    merged = s.join(t.withColumn("_t", F.lit(1)), on=["a", "b"], how="full_outer")

    aggs = [F.sum(F.coalesce("_t", F.lit(0))).cast("long").alias("n_truth")]
    for i, th in enumerate(thresholds):
        hit = F.col("_w").isNotNull() & (F.col("_w") >= F.lit(float(th)))
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias(f"_np{i}"))
        aggs.append(
            F.sum(F.when(hit & F.col("_t").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_tp{i}")
        )
    one = merged.agg(*aggs)

    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(th)).alias("threshold"),
                        F.col(f"_np{i}").alias("n_pred"),
                        F.col("n_truth").alias("n_truth"),
                        F.col(f"_tp{i}").alias("tp"),
                    )
                    for i, th in enumerate(thresholds)
                ]
            )
        ).alias("r")
    ).select("r.*")
    tp = F.col("tp").cast("double")
    return rows.select(
        "threshold",
        "n_pred",
        "n_truth",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.round(F.try_divide(tp, F.col("n_pred")), 6).alias("precision"),
        F.round(F.try_divide(tp, F.col("n_truth")), 6).alias("recall"),
        F.round(
            F.try_divide(2.0 * tp, F.col("n_pred") + F.col("n_truth")), 6
        ).alias("f1"),
    )


def cutoff_sweep_sql(
    scored_sql: str,
    truth_sql: str,
    thresholds: list[float],
    id_l: str = "id_l",
    id_r: str = "id_r",
    weight_col: str = "weight",
) -> str:
    """DuckDB twin of :func:`cutoff_sweep` (same single-pass shape)."""
    np_cols = ", ".join(
        f"count(*) FILTER (WHERE _w >= {float(th)}) AS _np{i}, "
        f"count(*) FILTER (WHERE _w >= {float(th)} AND _t IS NOT NULL) AS _tp{i}"
        for i, th in enumerate(thresholds)
    )
    per_thresh = "\n            UNION ALL ".join(
        f"SELECT {float(th)} AS threshold, _np{i} AS n_pred, n_truth, _tp{i} AS tp FROM agg"
        for i, th in enumerate(thresholds)
    )
    return f"""
        WITH s AS (
            SELECT least({id_l}, {id_r}) AS a, greatest({id_l}, {id_r}) AS b,
                   max({weight_col}) AS _w
            FROM ({scored_sql}) WHERE {id_l} <> {id_r}
            GROUP BY 1, 2
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b, 1 AS _t
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), m AS (
            SELECT s._w, t._t FROM s FULL OUTER JOIN t
                ON s.a = t.a AND s.b = t.b
        ), agg AS (
            SELECT count(*) FILTER (WHERE _t IS NOT NULL) AS n_truth, {np_cols}
            FROM m
        ), sweep AS (
            {per_thresh}
        )
        SELECT threshold, n_pred, n_truth, tp,
               n_pred - tp AS fp,
               n_truth - tp AS fn,
               round(CAST(tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision,
               round(CAST(tp AS DOUBLE) / NULLIF(n_truth, 0), 6) AS recall,
               round(2.0 * CAST(tp AS DOUBLE) / NULLIF(n_pred + n_truth, 0),
                     6) AS f1
        FROM sweep
    """


def posterior_calibration(
    posteriors: DataFrame,
    truth: DataFrame,
    n_bins: int = 10,
    id_l: str = "id_l",
    id_r: str = "id_r",
    posterior_col: str = "posterior",
) -> DataFrame:
    """Reliability diagram + per-bin Brier score for EM-calibrated
    posteriors: is P(M | gamma) = 0.8 actually right 80% of the time?

    The reference never surfaces probabilities at all — the analyst
    stares at sorted log2 weights (`/root/reference/app/MatchReview.py`
    review pane) — so once :func:`em.match_posterior` exists, the natural
    audit is calibration: bucket the scored pairs by predicted posterior
    into ``n_bins`` equal-width bins and compare each bin's mean
    prediction against its empirical match rate from a labeled truth
    sample. Output: one row per non-empty bin with
    (bin, n_pairs, n_match, mean_posterior, match_rate, brier), ordered
    by bin. A calibrated model has match_rate tracking mean_posterior and
    a small Brier score (mean squared error of the probability).

    Scale design: the posteriors are canonicalized with one pair-key
    groupBy, labeled with one join against the (distinct) truth pairs,
    then reduced by a groupBy on <= n_bins integer keys with full
    map-side partial aggregation — three shuffles total, the last one
    carrying n_bins rows per task. No window, no collect.

    Cross-engine exactness: the posterior is quantized to an integer
    p6 = round(posterior * 1e6) BEFORE any arithmetic, so binning
    (integer multiply + truncating DIV), the mean (exact BIGINT sum, one
    double division), the match rate (int/int), and the Brier numerator
    (sum of exact int squares at 3dp quantization) are all order-free and
    bit-identical between Spark and the DuckDB twin.
    """
    s = (
        posteriors.select(
            F.least(F.col(id_l), F.col(id_r)).alias("a"),
            F.greatest(F.col(id_l), F.col(id_r)).alias("b"),
            F.col(posterior_col).alias("_p"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.max("_p").alias("_p"))
    )
    t = _canon_pairs(truth, id_l, id_r).withColumn("_t", F.lit(1))
    labeled = s.join(t, on=["a", "b"], how="left").select(
        F.expr("CAST(round(_p * 1000000) AS BIGINT)").alias("_p6"),
        F.coalesce(F.col("_t"), F.lit(0)).cast("long").alias("_y"),
    )
    nb = int(n_bins)
    binned = labeled.select(
        F.expr(f"least((_p6 * {nb}) DIV 1000000, {nb - 1})")
        .cast("int")
        .alias("bin"),
        "_p6",
        "_y",
        # 3dp-quantized squared error: d in [-1000, 1000], d*d exact
        F.expr("(_p6 DIV 1000 - _y * 1000) * (_p6 DIV 1000 - _y * 1000)")
        .alias("_d2"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_y").alias("n_match"),
        F.sum("_p6").alias("_sp6"),
        F.sum("_d2").alias("_sd2"),
    )
    return agg.select(
        "bin",
        "n_pairs",
        "n_match",
        F.round(
            F.col("_sp6").cast("double") / (F.col("n_pairs") * F.lit(1e6)), 6
        ).alias("mean_posterior"),
        F.round(
            F.col("n_match").cast("double") / F.col("n_pairs"), 6
        ).alias("match_rate"),
        F.round(
            F.col("_sd2").cast("double") / (F.col("n_pairs") * F.lit(1e6)), 6
        ).alias("brier"),
    ).orderBy("bin")


def posterior_calibration_sql(
    posteriors_sql: str,
    truth_sql: str,
    n_bins: int = 10,
    id_l: str = "id_l",
    id_r: str = "id_r",
    posterior_col: str = "posterior",
) -> str:
    """DuckDB twin of :func:`posterior_calibration` — identical integer
    quantization (p6, truncating // division on positives) so every
    emitted double is the result of the same single float division."""
    nb = int(n_bins)
    return f"""
        WITH s AS (
            SELECT least({id_l}, {id_r}) AS a, greatest({id_l}, {id_r}) AS b,
                   max({posterior_col}) AS _p
            FROM ({posteriors_sql}) WHERE {id_l} <> {id_r}
            GROUP BY 1, 2
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b, 1 AS _t
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), lab AS (
            SELECT CAST(round(s._p * 1000000) AS BIGINT) AS _p6,
                   CAST(coalesce(t._t, 0) AS BIGINT) AS _y
            FROM s LEFT JOIN t ON s.a = t.a AND s.b = t.b
        ), binned AS (
            SELECT CAST(least((_p6 * {nb}) // 1000000, {nb - 1}) AS INTEGER)
                       AS bin,
                   _p6, _y,
                   (_p6 // 1000 - _y * 1000) * (_p6 // 1000 - _y * 1000)
                       AS _d2
            FROM lab
        )
        SELECT bin,
               count(*) AS n_pairs,
               CAST(sum(_y) AS BIGINT) AS n_match,
               round(CAST(sum(_p6) AS DOUBLE) / (count(*) * 1e6), 6)
                   AS mean_posterior,
               round(CAST(sum(_y) AS DOUBLE) / count(*), 6) AS match_rate,
               round(CAST(sum(_d2) AS DOUBLE) / (count(*) * 1e6), 6) AS brier
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """


def dual_system_estimate(
    rec: DataFrame,
    mem: DataFrame,
    matches: DataFrame,
    rec_id: str = "id_l",
    mem_id: str = "id_r",
) -> DataFrame:
    """Chapman-corrected dual-system (capture-recapture) population
    estimate from a two-file linkage — the Census use the reference's
    BigMatch lineage exists to serve: match an enumeration file against a
    coverage-survey file and estimate the total population
    N = (n1+1)(n2+1)/(m+1) - 1 from the two list sizes and the matched
    count (Lincoln-Petersen with Chapman's small-m correction), with the
    standard error sqrt((n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)^2 (m+2))).

    ``matches`` carries one row per accepted (rec_id, mem_id) link —
    duplicates and many-to-many edges are collapsed to distinct matched
    REC records (m counts matched entities, bounded by both lists; a 1:1
    assignment upstream, operators/assignment.py, makes rec- and
    mem-side counts agree).

    Scale design: three count aggregates (two map-only, one over a
    distinct on the match file's rec key) joined as 1-row frames — no
    pair-table shuffle beyond the distinct. Output: one row
    (n1, n2, m, n_hat, se). Exactness: n1/n2/m are exact BIGINTs; n_hat
    and se are a fixed expression tree over those ints, identical in
    both engines, rounded to 6dp.
    """
    n1 = rec.agg(F.count(F.lit(1)).alias("n1"))
    n2 = mem.agg(F.count(F.lit(1)).alias("n2"))
    m = (
        matches.select(F.col(rec_id).alias("_r"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("m"))
    )
    one = n1.crossJoin(n2).crossJoin(m)
    n1c = F.col("n1").cast("double")
    n2c = F.col("n2").cast("double")
    mc = F.col("m").cast("double")
    n_hat = (n1c + 1.0) * (n2c + 1.0) / (mc + 1.0) - 1.0
    var = (
        (n1c + 1.0)
        * (n2c + 1.0)
        * (n1c - mc)
        * (n2c - mc)
        / ((mc + 1.0) * (mc + 1.0) * (mc + 2.0))
    )
    return one.select(
        "n1",
        "n2",
        "m",
        F.round(n_hat, 6).alias("n_hat"),
        F.round(F.sqrt(var), 6).alias("se"),
    )


def dual_system_estimate_sql(
    rec_sql: str,
    mem_sql: str,
    matches_sql: str,
    rec_id: str = "id_l",
) -> str:
    """DuckDB twin of :func:`dual_system_estimate` — the same expression
    tree over the three exact counts."""
    return f"""
        WITH c1 AS (SELECT count(*) AS n1 FROM ({rec_sql})),
        c2 AS (SELECT count(*) AS n2 FROM ({mem_sql})),
        cm AS (
            SELECT count(*) AS m
            FROM (SELECT DISTINCT {rec_id} FROM ({matches_sql}))
        )
        SELECT n1, n2, m,
               round((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
                     / (CAST(m AS DOUBLE) + 1.0) - 1.0, 6) AS n_hat,
               round(sqrt((CAST(n1 AS DOUBLE) + 1.0)
                          * (CAST(n2 AS DOUBLE) + 1.0)
                          * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
                          * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
                          / ((CAST(m AS DOUBLE) + 1.0)
                             * (CAST(m AS DOUBLE) + 1.0)
                             * (CAST(m AS DOUBLE) + 2.0))), 6) AS se
        FROM c1 CROSS JOIN c2 CROSS JOIN cm
    """


def stratified_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    strata: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
    id_col: str = "id",
    stratum_col: str = "stratum",
) -> DataFrame:
    """Per-subgroup pairwise metrics: :func:`pairwise_metrics` sliced by a
    record-level stratum (language, region, data source, ...) — the
    linkage-equity audit. Aggregate F1 can hide a subgroup whose records
    systematically fail to link (shorter names, different scripts,
    sparser fields); stratifying the SAME tp/fp/fn counters exposes it.
    The reference has no evaluation tooling at all (decisions are
    eyeballed in MatchReview, /root/reference/app/MatchReview.py:26).

    A pair belongs to a stratum when BOTH endpoints carry it; mixed pairs
    report under '(cross)', records missing from ``strata`` under
    '(unknown)' — every pair is counted exactly once, so the stratum rows
    sum to the global :func:`pairwise_metrics` counters.

    Scale design: one full-outer join on the canonical pair key (the
    same single shuffle as pairwise_metrics), two joins against the
    (id -> stratum) map — broadcast-sized in practice, it carries one row
    per RECORD, not per pair — then a map-side-combined groupBy on the
    stratum. Output: one row per stratum, ordered.
    """
    p = _canon_pairs(predicted, id_l, id_r)
    t = _canon_pairs(truth, id_l, id_r)
    merged = p.withColumn("_p", F.lit(1)).join(
        t.withColumn("_t", F.lit(1)), on=["a", "b"], how="full_outer"
    )
    sa = strata.select(
        F.col(id_col).alias("_ida"), F.col(stratum_col).alias("_sa")
    )
    sb = strata.select(
        F.col(id_col).alias("_idb"), F.col(stratum_col).alias("_sb")
    )
    labeled = (
        merged.join(sa, F.col("a") == F.col("_ida"), "left")
        .drop("_ida")
        .join(sb, F.col("b") == F.col("_idb"), "left")
        .drop("_idb")
        .select(
            F.when(F.col("_sa").isNull() | F.col("_sb").isNull(),
                   F.lit("(unknown)"))
            .when(F.col("_sa") == F.col("_sb"), F.col("_sa"))
            .otherwise(F.lit("(cross)"))
            .alias(stratum_col),
            "_p",
            "_t",
        )
    )
    agg = labeled.groupBy(stratum_col).agg(
        F.sum(F.coalesce("_p", F.lit(0))).cast("long").alias("n_pred"),
        F.sum(F.coalesce("_t", F.lit(0))).cast("long").alias("n_truth"),
        F.sum(F.coalesce("_p", F.lit(0)) * F.coalesce("_t", F.lit(0)))
        .cast("long")
        .alias("tp"),
    )
    tp = F.col("tp").cast("double")
    return agg.select(
        stratum_col,
        "n_pred",
        "n_truth",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.round(F.try_divide(tp, F.col("n_pred")), 6).alias("precision"),
        F.round(F.try_divide(tp, F.col("n_truth")), 6).alias("recall"),
        F.round(
            F.try_divide(2.0 * tp, F.col("n_pred") + F.col("n_truth")), 6
        ).alias("f1"),
    ).orderBy(stratum_col)


def stratified_metrics_sql(
    predicted_sql: str,
    truth_sql: str,
    strata_sql: str,
    id_l: str = "id_l",
    id_r: str = "id_r",
    id_col: str = "id",
    stratum_col: str = "stratum",
) -> str:
    """DuckDB twin of :func:`stratified_metrics`."""
    return f"""
        WITH p AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b, 1 AS _p
            FROM ({predicted_sql}) WHERE {id_l} <> {id_r}
        ), t AS (
            SELECT DISTINCT least({id_l}, {id_r}) AS a,
                            greatest({id_l}, {id_r}) AS b, 1 AS _t
            FROM ({truth_sql}) WHERE {id_l} <> {id_r}
        ), m AS (
            SELECT coalesce(p.a, t.a) AS a, coalesce(p.b, t.b) AS b,
                   p._p, t._t
            FROM p FULL OUTER JOIN t ON p.a = t.a AND p.b = t.b
        ), s AS (
            SELECT {id_col} AS _sid, {stratum_col} AS _s FROM ({strata_sql})
        ), lab AS (
            SELECT CASE WHEN sa._s IS NULL OR sb._s IS NULL THEN '(unknown)'
                        WHEN sa._s = sb._s THEN sa._s
                        ELSE '(cross)' END AS {stratum_col},
                   m._p, m._t
            FROM m LEFT JOIN s sa ON m.a = sa._sid
                   LEFT JOIN s sb ON m.b = sb._sid
        ), agg AS (
            SELECT {stratum_col},
                   CAST(sum(coalesce(_p, 0)) AS BIGINT) AS n_pred,
                   CAST(sum(coalesce(_t, 0)) AS BIGINT) AS n_truth,
                   CAST(sum(coalesce(_p, 0) * coalesce(_t, 0)) AS BIGINT)
                       AS tp
            FROM lab GROUP BY {stratum_col}
        )
        SELECT {stratum_col}, n_pred, n_truth, tp,
               n_pred - tp AS fp,
               n_truth - tp AS fn,
               round(CAST(tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision,
               round(CAST(tp AS DOUBLE) / NULLIF(n_truth, 0), 6) AS recall,
               round(2.0 * CAST(tp AS DOUBLE) / NULLIF(n_pred + n_truth, 0),
                     6) AS f1
        FROM agg ORDER BY {stratum_col}
    """


def isotonic_calibration(
    pairs: DataFrame,
    truth: DataFrame,
    *,
    weight_col: str = "weight",
    lo: float,
    hi: float,
    n_bins: int = 10,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> DataFrame:
    """Isotonic (monotone) calibration of match scores — the PAV fit over
    the binned weight histogram, computed IN-PLAN with the minimax
    identity instead of the sequential pool-adjacent-violators loop:

        iso(i) = max_{l <= i} min_{u >= i} mean(true, bins l..u)

    (Barlow et al. 1972 — identical to PAV's solution.) The reliability
    diagram (posterior_calibration) shows raw per-bin precision, which
    need not be monotone in weight; downstream consumers that binary-
    search a cutoff for a target precision need the MONOTONE version —
    that is exactly the isotonic fit.

    Returns one row per non-empty bin: (bin, w_lo, w_hi, n, n_true,
    raw_rate, iso_rate) with iso_rate nondecreasing in bin, 6dp.

    Determinism: per-(l,u) means are single divisions of exact integer
    prefix sums; min/max over them are order-free comparisons — both
    engines agree bit-for-bit (no accumulated float sums anywhere).

    Scale: the pair table is touched ONCE (bin + label + groupBy, the
    same single-pass discipline as cutoff_sweep); everything after is
    O(n_bins^2) arithmetic on a <= n_bins-row frame — the deliberate
    single-partition windows and the triangular self-joins cost nothing
    at any corpus size because their input is the histogram, not data.
    Weights outside [lo, hi) clamp into the edge bins.
    """
    from pyspark.sql import Window

    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (hi - lo) / n_bins
    # canonicalize with the weight carried (max per unordered pair — the
    # same rule cluster_quality uses for duplicate orientations)
    p = pairs.select(
        F.least(F.col(id_l), F.col(id_r)).alias("_l"),
        F.greatest(F.col(id_l), F.col(id_r)).alias("_r"),
        F.col(weight_col).alias("_w"),
    ).groupBy("_l", "_r").agg(F.max("_w").alias("_w"))
    tt = truth.select(
        F.least(F.col(id_l), F.col(id_r)).alias("_l"),
        F.greatest(F.col(id_l), F.col(id_r)).alias("_r"),
    ).distinct().withColumn("_y", F.lit(1))
    binc = F.least(
        F.greatest(
            F.floor((F.col("_w") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    bins = (
        p.join(tt, on=["_l", "_r"], how="left")
        .select(binc.alias("bin"), F.coalesce("_y", F.lit(0)).alias("_y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_true"))
    )
    # O(n_bins) frame from here on — single-partition windows deliberate
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin",
        "n",
        "n_true",
        F.sum("n").over(wcum).alias("_N"),
        F.sum("n_true").over(wcum).alias("_T"),
    )
    left = pref.select(
        F.col("bin").alias("_lb"),
        (F.col("_N") - F.col("n")).alias("_Nl"),
        (F.col("_T") - F.col("n_true")).alias("_Tl"),
    )
    right = pref.select(
        F.col("bin").alias("_ub"),
        F.col("_N").alias("_Nu"),
        F.col("_T").alias("_Tu"),
    )
    spans = (
        left.join(right, F.col("_lb") <= F.col("_ub"))
        .select(
            "_lb",
            "_ub",
            (
                (F.col("_Tu") - F.col("_Tl")).cast("double")
                / (F.col("_Nu") - F.col("_Nl")).cast("double")
            ).alias("_mean"),
        )
    )
    idx = bins.select(F.col("bin"))
    m_li = (
        idx.join(spans, (F.col("_lb") <= F.col("bin")) & (F.col("_ub") >= F.col("bin")))
        .groupBy("bin", "_lb")
        .agg(F.min("_mean").alias("_m"))
    )
    iso = m_li.groupBy("bin").agg(F.max("_m").alias("_iso"))
    return (
        bins.join(iso, "bin")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("w_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("w_hi"),
            "n",
            "n_true",
            F.round(F.col("n_true") / F.col("n"), 6).alias("raw_rate"),
            F.round("_iso", 6).alias("iso_rate"),
        )
    )


def isotonic_calibration_sql(
    pairs_sql: str,
    truth_sql: str,
    *,
    weight_col: str = "weight",
    lo: float,
    hi: float,
    n_bins: int = 10,
    id_l: str = "id_l",
    id_r: str = "id_r",
) -> str:
    """DuckDB twin of isotonic_calibration — identical binning, prefix
    sums, minimax spans, and rounding."""
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (hi - lo) / n_bins
    return f"""
WITH ic_p AS (
  SELECT least({id_l}, {id_r}) AS _l, greatest({id_l}, {id_r}) AS _r,
         MAX({weight_col}) AS _w
  FROM ({pairs_sql}) GROUP BY 1, 2
),
ic_t AS (
  SELECT DISTINCT least({id_l}, {id_r}) AS _l, greatest({id_l}, {id_r}) AS _r
  FROM ({truth_sql})
),
ic_bins AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((p._w - {lo!r}) / {width!r}) AS INT), 0),
               {n_bins - 1}) AS bin,
         count(*) AS n,
         SUM(CASE WHEN t._l IS NOT NULL THEN 1 ELSE 0 END) AS n_true
  FROM ic_p p LEFT JOIN ic_t t USING (_l, _r)
  GROUP BY 1
),
ic_pref AS (
  SELECT bin, n, n_true,
         SUM(n) OVER (ORDER BY bin) AS _N,
         SUM(n_true) OVER (ORDER BY bin) AS _T
  FROM ic_bins
),
ic_spans AS (
  SELECT l.bin AS _lb, u.bin AS _ub,
         CAST(u._T - (l._T - l.n_true) AS DOUBLE)
           / CAST(u._N - (l._N - l.n) AS DOUBLE) AS _mean
  FROM ic_pref l JOIN ic_pref u ON l.bin <= u.bin
),
ic_mli AS (
  SELECT b.bin, s._lb, MIN(s._mean) AS _m
  FROM ic_bins b JOIN ic_spans s ON s._lb <= b.bin AND s._ub >= b.bin
  GROUP BY b.bin, s._lb
),
ic_iso AS (
  SELECT bin, MAX(_m) AS _iso FROM ic_mli GROUP BY bin
)
SELECT b.bin,
       round({lo!r} + b.bin * {width!r}, 6) AS w_lo,
       round({lo!r} + (b.bin + 1) * {width!r}, 6) AS w_hi,
       CAST(b.n AS BIGINT) AS n,
       CAST(b.n_true AS BIGINT) AS n_true,
       round(CAST(b.n_true AS DOUBLE) / b.n, 6) AS raw_rate,
       round(i._iso, 6) AS iso_rate
FROM ic_bins b JOIN ic_iso i USING (bin)
"""
