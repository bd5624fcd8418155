"""Cross-document duplicated-SPAN profile (ExactSubstr-style dedup
diagnostics).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) deduplicate at the *substring* level: any span ≥ 50 tokens that
appears verbatim in another document is training-set noise, and whole-doc
or set-similarity dedup (MinHash) misses it when the containing documents
are otherwise different. Their suffix-array construction is inherently
sequential; the distributed equivalent used here is POSITIONAL winnowing
(Schleimer/Wilkerson/Aiken): hash every k-gram, keep the min of each
window of `w` consecutive k-gram hashes *with its window position*. The
winnowing guarantee — any verbatim match of length ≥ w+k-1 characters
shares at least one selected fingerprint — makes the shared-fingerprint
windows a sound detector for duplicated spans of that length, regardless
of alignment.

Pipeline shape (all linear in corpus size — no pairs are materialized):

1. per document: k-gram hash array staged as a real column (same
   O(n²)-inlining defence as operators/winnow.py), then one window-min per
   position — `(doc, window_pos, fp)` rows via posexplode.
2. corpus-duplicated fingerprints: groupBy(fp) keeping min(doc) ≠
   max(doc) — the "appears in ≥ 2 distinct documents" test in ONE
   map-side-combinable shuffle (no countDistinct expand). Within-document
   repeats are deliberately NOT counted: consecutive windows re-selecting
   the same minimum is a winnowing artifact, not evidence of repetition
   (intra-doc repetition is `corpus_ops.repetition_profile`'s job).
3. per document: duplicated windows → merged character coverage. Every
   window covers exactly L = w+k-1 chars starting at its position, so the
   union length of sorted starts j₁<j₂<… is Σ min(jᵢ₊₁−jᵢ, L) + L — a
   lead() window over (doc ORDER BY position), integer-exact.

Output: one row per document —
    (doc id, n_chars_norm, n_windows, n_dup_windows, dup_chars, dup_frac)
with dup_frac = dup_chars / n_chars_norm rounded to 6dp; documents shorter
than k+w-1 normalized chars have no windows and report zeros.

100 TB notes: stage 1 is map-only; stage 2/3 are two hash shuffles keyed
on fp and doc id. A boilerplate fingerprint shared by millions of docs is
a single GROUPED row in stage 2 (min/max agg — no blowup) and rejoins by
fp semi-join; nothing here is quadratic. Hashes are the md5-prefix→BIGINT
discipline shared with operators/dedup.py so the DuckDB oracle computes
identical values.

Reference parity: the reference engine has no substring-level dedup; this
extends the training-data-pipeline set (SURVEY.md's dedup family) beside
winnow.py (whole-doc fingerprint sets) and dedup.py (MinHash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigmatch_utilities_spark.operators.winnow import _norm, _norm_sql


def _positional_windows(
    df: DataFrame, text_col: str, id_col: str, *, k: int, w: int
) -> DataFrame:
    """(id, j, fp): winnow window minima WITH their 1-based window
    positions. Documents with fewer than w k-grams emit no rows (no
    single-window fallback here — the span math needs full windows; short
    documents simply report zero duplicated chars)."""
    # byte-small scans read as ONE split, serializing the O(chars) md5
    # chain onto one core — spread first (no-op at real scale where
    # partitions >> cores; same discipline as winnow.with_winnow_fingerprints)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    staged = df.select(F.col(id_col).alias("id"), _norm(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    n_kgrams = F.length(t) - F.lit(k) + 1
    kh = F.when(
        n_kgrams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_kgrams),
            lambda i: F.conv(
                F.substring(F.md5(t.substr(i, F.lit(k))), 1, 12), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    staged = staged.withColumn("_kh", kh).drop("_t")
    khc = F.col("_kh")
    n_windows = F.size(khc) - F.lit(w) + 1
    wins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(khc, j, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # posexplode_OUTER + null drop: a plain posexplode lets
    # InferFiltersFromGenerate synthesize `size(_wins) > 0`, pushed below
    # the staged projections — re-inlining the whole k-gram chain into a
    # per-row filter (measured ~2x per consumer; see operators/winnow.py)
    return (
        staged.withColumn("_wins", wins)
        .select("id", F.posexplode_outer("_wins").alias("pos0", "fp"))
        .filter(F.col("fp").isNotNull())
        .select("id", (F.col("pos0") + 1).alias("j"), "fp")
    )


def duplicated_span_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 12,
    w: int = 10,
    cache_handle: list | None = None,
) -> DataFrame:
    """Per-document duplicated-span profile (see module docstring).

    Columns: (id_col, n_chars_norm, n_windows, n_dup_windows, dup_chars,
    dup_frac). Every document in `df` appears exactly once.

    The positional-window frame feeds BOTH the duplicated-fp groupBy and
    the semi-join side (two evaluations of the md5 chain when lazy); pass
    `cache_handle` (dedup.lsh_cache convention) to persist it once — at
    warehouse scale you would materialize it as a table instead.
    """
    span = w + k - 1  # chars covered by one window
    winpos = _positional_windows(df, text_col, id_col, k=k, w=w)
    if cache_handle is not None:
        winpos = winpos.persist()
        cache_handle.append(winpos)

    # fingerprints seen in >= 2 distinct documents: min(id) != max(id)
    # is exact for the >=2-distinct test and needs one plain shuffle
    dup_fps = (
        winpos.groupBy("fp")
        .agg(F.min("id").alias("_lo"), F.max("id").alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("fp")
    )
    dup_win = winpos.join(dup_fps, "fp", "left_semi")

    lead_w = Window.partitionBy("id").orderBy("j")
    contrib = F.least(
        F.coalesce(F.lead("j").over(lead_w) - F.col("j"), F.lit(span)),
        F.lit(span),
    )
    per_doc_dup = (
        dup_win.withColumn("_c", contrib)
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_dup_windows"),
            F.sum("_c").cast("long").alias("dup_chars"),
        )
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.length(_norm(F.col(text_col))).cast("long").alias("n_chars_norm"),
    ).withColumn(
        "n_windows",
        F.greatest(
            F.col("n_chars_norm") - F.lit(k + w - 2), F.lit(0)
        ).cast("long"),
    )
    return (
        base.join(per_doc_dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_chars_norm",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.when(F.col("n_chars_norm") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("dup_chars", F.lit(0)).cast("double")
                    / F.col("n_chars_norm"),
                    6,
                )
            )
            .alias("dup_frac"),
        )
    )


def duplicated_span_profile_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    id_name: str = "doc_id",
    *,
    k: int = 12,
    w: int = 10,
) -> str:
    """DuckDB twin of :func:`duplicated_span_profile` — identical hashes,
    window positions, >=2-distinct-docs test, and merged-span arithmetic."""
    t = _norm_sql(text_expr)
    span = w + k - 1
    return f"""
        WITH sd_kg AS MATERIALIZED (
            SELECT {id_expr} AS id,
                   list_transform(range(1, greatest(length({t}) - {k} + 2, 1)),
                     i -> CAST(('0x' || substring(md5(substring({t}, CAST(i AS INT), {k})), 1, 12)) AS BIGINT)
                   ) AS kh
            FROM {table}
        ),
        sd_win AS MATERIALIZED (
            SELECT id, CAST(j AS BIGINT) AS j,
                   list_min(list_slice(kh, CAST(j AS INT), CAST(j AS INT) + {w - 1})) AS fp
            FROM sd_kg, UNNEST(range(1, greatest(len(kh) - {w} + 2, 1))) AS u(j)
        ),
        sd_dupfp AS (
            SELECT fp FROM sd_win GROUP BY fp HAVING min(id) <> max(id)
        ),
        sd_dupwin AS (
            SELECT id, j FROM sd_win WHERE fp IN (SELECT fp FROM sd_dupfp)
        ),
        sd_contrib AS (
            SELECT id,
                   least(coalesce(lead(j) OVER (PARTITION BY id ORDER BY j) - j,
                                  {span}), {span}) AS c
            FROM sd_dupwin
        ),
        sd_perdoc AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
                   CAST(SUM(c) AS BIGINT) AS dup_chars
            FROM sd_contrib GROUP BY id
        ),
        sd_base AS (
            SELECT {id_expr} AS id,
                   CAST(length({t}) AS BIGINT) AS n_chars_norm,
                   CAST(greatest(length({t}) - {k + w - 2}, 0) AS BIGINT) AS n_windows
            FROM {table}
        )
        SELECT b.id AS {id_name}, b.n_chars_norm, b.n_windows,
               CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
               CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
               CASE WHEN b.n_chars_norm = 0 THEN 0.0
                    ELSE round(coalesce(p.dup_chars, 0)::DOUBLE / b.n_chars_norm, 6)
               END AS dup_frac
        FROM sd_base b LEFT JOIN sd_perdoc p ON b.id = p.id
    """
