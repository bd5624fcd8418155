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

:func:`excise_duplicated_spans` goes one step further — the actual Lee
et al. remediation: the merged duplicated intervals are CUT OUT of the
normalized text (window-function interval merge, per-document ordered
segment concat), emitting (id, clean_text, n_cut_spans, cut_chars).

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


def excise_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 12,
    w: int = 10,
    cache_handle: list | None = None,
) -> DataFrame:
    """Lee et al.'s actual remediation: emit NORMALIZED text with every
    cross-document duplicated span cut out.

    Where :func:`duplicated_span_profile` reports how much of a document
    is duplicated, this returns the surgery: (id_col, clean_text,
    n_cut_spans, cut_chars), where clean_text is the normalized text with
    the merged duplicated intervals removed (segments concatenated in
    order, no separator — token boundaries at the cut points are already
    whitespace-normalized). Documents with nothing duplicated pass
    through with their normalized text intact.

    Distributed shape — intervals are merged with WINDOW functions over
    the per-document duplicated-window rows, never a per-row UDF:

    1. duplicated windows (id, j) as in the profile;
    2. interval merge: a window starts a NEW interval when the gap to the
       previous window start exceeds the span length L = w+k-1; a running
       sum of the new-interval flags labels each row with its interval
       id; groupBy gives merged [start, end] intervals (end = last start
       + L - 1);
    3. kept segments BETWEEN intervals via lead(): head [1, first-1],
       gaps [end+1, next_start-1], tail [last_end+1, len] — each becomes
       one substring row, then one ordered concat per document
       (array_join over the position-sorted collected segments).

    All window partitions are per-document (bounded by that document's
    window count); the concat is a groupBy, not a global sort. The
    positional-window frame is evaluated twice (dup-fp groupBy + semi
    join) — `cache_handle` persists it once, as in the profile.
    """
    span = w + k - 1
    winpos = _positional_windows(df, text_col, id_col, k=k, w=w)
    if cache_handle is not None:
        winpos = winpos.persist()
        cache_handle.append(winpos)
    dup_fps = (
        winpos.groupBy("fp")
        .agg(F.min("id").alias("_lo"), F.max("id").alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("fp")
    )
    dup_win = winpos.join(dup_fps, "fp", "left_semi").select("id", "j")

    by_j = Window.partitionBy("id").orderBy("j")
    new_flag = F.when(
        F.lag("j").over(by_j).isNull()
        | (F.col("j") - F.lag("j").over(by_j) > span),
        F.lit(1),
    ).otherwise(F.lit(0))
    grouped = dup_win.withColumn("_new", new_flag).withColumn(
        "_grp", F.sum("_new").over(by_j.rowsBetween(Window.unboundedPreceding, 0))
    )
    intervals = grouped.groupBy("id", "_grp").agg(
        F.min("j").alias("s"),
        (F.max("j") + F.lit(span - 1)).alias("e"),
    )

    base = df.select(
        F.col(id_col).alias("id"), _norm(F.col(text_col)).alias("_t")
    ).withColumn("_len", F.length("_t"))

    by_s = Window.partitionBy("id").orderBy("s")
    iv = intervals.join(base.select("id", "_len"), "id").withColumn(
        "_next_s", F.lead("s").over(by_s)
    )
    # kept segment AFTER each interval: [e+1, next_s-1] (or to end-of-doc)
    after = iv.select(
        "id",
        (F.col("e") + 1).alias("pos"),
        (F.coalesce(F.col("_next_s"), F.col("_len") + 1) - F.col("e") - 1).alias(
            "_seglen"
        ),
    ).filter(F.col("_seglen") > 0)
    # head segment BEFORE the first interval: [1, first_s - 1]
    head = iv.groupBy("id").agg(F.min("s").alias("_first_s")).select(
        "id", F.lit(1).alias("pos"), (F.col("_first_s") - 1).alias("_seglen")
    ).filter(F.col("_seglen") > 0)
    segs = after.unionByName(head).join(base, "id").select(
        "id", "pos", F.expr("substring(_t, pos, _seglen)").alias("seg")
    )
    cut = segs.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            "",
        ).alias("clean_text")
    )
    stats = intervals.groupBy("id").agg(
        F.count("*").cast("long").alias("n_cut_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("cut_chars"),
    )
    return (
        base.join(cut, "id", "left")
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            # a doc whose EVERY char is duplicated has no kept segments:
            # coalesce order matters — stats row present => cut happened
            F.when(F.col("n_cut_spans").isNotNull(), F.coalesce("clean_text", F.lit("")))
            .otherwise(F.col("_t"))
            .alias("clean_text"),
            F.coalesce("n_cut_spans", F.lit(0)).cast("long").alias("n_cut_spans"),
            F.coalesce("cut_chars", F.lit(0)).cast("long").alias("cut_chars"),
        )
    )


def excise_duplicated_spans_sql(
    table: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    id_name: str = "doc_id",
    *,
    k: int = 12,
    w: int = 10,
) -> str:
    """DuckDB twin of :func:`excise_duplicated_spans` — identical interval
    merge, segment arithmetic, and ordered concat."""
    t = _norm_sql(text_expr)
    span = w + k - 1
    return f"""
        WITH ex_kg AS MATERIALIZED (
            SELECT {id_expr} AS id,
                   list_transform(range(1, greatest(length({t}) - {k} + 2, 1)),
                     i -> CAST(('0x' || substring(md5(substring({t}, CAST(i AS INT), {k})), 1, 12)) AS BIGINT)
                   ) AS kh
            FROM {table}
        ),
        ex_win AS MATERIALIZED (
            SELECT id, CAST(j AS BIGINT) AS j,
                   list_min(list_slice(kh, CAST(j AS INT), CAST(j AS INT) + {w - 1})) AS fp
            FROM ex_kg, UNNEST(range(1, greatest(len(kh) - {w} + 2, 1))) AS u(j)
        ),
        ex_dupfp AS (
            SELECT fp FROM ex_win GROUP BY fp HAVING min(id) <> max(id)
        ),
        ex_dupwin AS (
            SELECT id, j FROM ex_win WHERE fp IN (SELECT fp FROM ex_dupfp)
        ),
        ex_flag AS (
            SELECT id, j,
                   CASE WHEN lag(j) OVER (PARTITION BY id ORDER BY j) IS NULL
                             OR j - lag(j) OVER (PARTITION BY id ORDER BY j) > {span}
                        THEN 1 ELSE 0 END AS _new
            FROM ex_dupwin
        ),
        ex_grp AS (
            SELECT id, j,
                   SUM(_new) OVER (PARTITION BY id ORDER BY j
                                   ROWS UNBOUNDED PRECEDING) AS _grp
            FROM ex_flag
        ),
        ex_iv AS MATERIALIZED (
            SELECT id, _grp, MIN(j) AS s, MAX(j) + {span - 1} AS e
            FROM ex_grp GROUP BY id, _grp
        ),
        ex_base AS MATERIALIZED (
            SELECT {id_expr} AS id, {t} AS _t, length({t}) AS _len
            FROM {table}
        ),
        ex_iv2 AS (
            SELECT v.id, v.s, v.e, b._len,
                   lead(v.s) OVER (PARTITION BY v.id ORDER BY v.s) AS _next_s
            FROM ex_iv v JOIN ex_base b ON v.id = b.id
        ),
        ex_segs AS (
            SELECT id, e + 1 AS pos,
                   coalesce(_next_s, _len + 1) - e - 1 AS _seglen
            FROM ex_iv2
            WHERE coalesce(_next_s, _len + 1) - e - 1 > 0
            UNION ALL
            SELECT id, 1 AS pos, MIN(s) - 1 AS _seglen
            FROM ex_iv2 GROUP BY id HAVING MIN(s) - 1 > 0
        ),
        ex_cut AS (
            SELECT g.id,
                   string_agg(substring(b._t, CAST(g.pos AS INT), CAST(g._seglen AS INT)),
                              '' ORDER BY g.pos) AS clean_text
            FROM ex_segs g JOIN ex_base b ON g.id = b.id
            GROUP BY g.id
        ),
        ex_stats AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS n_cut_spans,
                   CAST(SUM(e - s + 1) AS BIGINT) AS cut_chars
            FROM ex_iv GROUP BY id
        )
        SELECT b.id AS {id_name},
               CASE WHEN st.n_cut_spans IS NOT NULL
                    THEN coalesce(c.clean_text, '') ELSE b._t END AS clean_text,
               CAST(coalesce(st.n_cut_spans, 0) AS BIGINT) AS n_cut_spans,
               CAST(coalesce(st.cut_chars, 0) AS BIGINT) AS cut_chars
        FROM ex_base b
        LEFT JOIN ex_cut c ON b.id = c.id
        LEFT JOIN ex_stats st ON b.id = st.id
    """
