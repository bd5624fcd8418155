"""Text-analysis operators for training-data pipelines over a documents
table (doc_id, text, lang, ...): language-ID heuristic, quality scoring,
token counting, document fingerprinting.

Everything is built-in Column expressions (JVM, codegen) with exact DuckDB
SQL twins for the correctness oracle. At 100 TB these are embarrassingly
parallel map-only projections — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword lexicons for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "que", "de", "los", "es"),
}


def _tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(c)), "[^a-zA-Z0-9']+"), lambda x: x != F.lit(""))


def token_count(c: Column) -> Column:
    """Whitespace/punct token count (BPE-ish regex tokenizer baseline)."""
    return F.size(_tokens(c))


def token_count_sql(expr: str) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex(lower(trim({expr})), "
        f"'[^a-zA-Z0-9'']+'), x -> x <> '')) AS INT)"
    )


def lang_score(c: Column, lang: str) -> Column:
    """# of marker stopwords of `lang` present (as distinct tokens)."""
    toks = F.array_distinct(_tokens(c))
    hits = [
        F.when(F.array_contains(toks, w), F.lit(1)).otherwise(F.lit(0))
        for w in _LANG_MARKERS[lang]
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def detected_lang(c: Column) -> Column:
    """argmax over the marker-hit scores; 'und' when nothing hits."""
    scores = [(lang, lang_score(c, lang)) for lang in _LANG_MARKERS]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier languages win ties (en first)
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def detected_lang_sql(expr: str) -> str:
    def score(lang: str) -> str:
        toks = (
            f"list_distinct(list_filter(string_split_regex(lower(trim({expr})), "
            f"'[^a-zA-Z0-9'']+'), x -> x <> ''))"
        )
        hits = " + ".join(
            f"(CASE WHEN list_contains({toks}, '{w}') THEN 1 ELSE 0 END)"
            for w in _LANG_MARKERS[lang]
        )
        return f"({hits})"

    s = {lang: score(lang) for lang in _LANG_MARKERS}
    best = "greatest(" + ", ".join(s.values()) + ")"
    out = "'und'"
    for lang in reversed(list(_LANG_MARKERS)):
        out = (
            f"(CASE WHEN {s[lang]} = {best} AND {best} > 0 THEN '{lang}' ELSE {out} END)"
        )
    return out


def quality_score(c: Column) -> Column:
    """Cheap quality heuristic in [0,1]: mix of length signal, alpha ratio,
    and mean word length sanity. Deterministic, SQL-twinned."""
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    toks = token_count(c).cast("double")
    len_sig = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    mean_wl = F.when(toks > 0, alpha / toks).otherwise(F.lit(0.0))
    wl_sig = F.when((mean_wl >= 3.0) & (mean_wl <= 9.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * len_sig + F.lit(0.4) * alpha_ratio + F.lit(0.2) * wl_sig, 6
    )


def quality_score_sql(expr: str) -> str:
    n = f"CAST(length({expr}) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
    toks = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    len_sig = f"least({n} / 500.0, 1.0)"
    alpha_ratio = f"(CASE WHEN {n} > 0 THEN {alpha} / {n} ELSE 0.0 END)"
    mean_wl = f"(CASE WHEN {toks} > 0 THEN {alpha} / {toks} ELSE 0.0 END)"
    wl_sig = f"(CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 9.0 THEN 1.0 ELSE 0.5 END)"
    return f"round(0.4 * {len_sig} + 0.4 * {alpha_ratio} + 0.2 * {wl_sig}, 6)"


def fingerprint(c: Column) -> Column:
    """Document fingerprint: 64-bit-ish hash of the whitespace-normalized
    lowercase text (rolling-hash analog; md5-prefix keeps SQL parity)."""
    norm = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 12), 16, 10).cast("long")


def fingerprint_sql(expr: str) -> str:
    norm = f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"
    return f"CAST(('0x' || substring(md5({norm}), 1, 12)) AS BIGINT)"


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        detected_lang(c).alias("lang_detected"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )


def token_zipf(df: DataFrame, text_col: str = "text", *, top: int = 50) -> DataFrame:
    """Corpus vocabulary profile: the `top` most frequent tokens with
    occurrence count, corpus share, and cumulative share — the Zipf head
    a data-mixing/QA review reads to spot template contamination (a
    boilerplate token owning 5% of the corpus is the smoking gun the
    per-document repetition profile can't see).

    Tokenization matches :func:`token_count` (lowercase, alnum+apostrophe
    runs), so the shares are consistent with the per-document profiles.

    Output (rank 1..top by count desc, token asc):
        (rank, token, cnt, share, cum_share)   -- shares rounded to 6dp

    Scale: one explode + map-side-combined groupBy over tokens, a 1-row
    total broadcast, TakeOrderedAndProject for the head, and rank/cum
    windows over the ≤ `top` collected rows only — never a global sort.
    """
    toks = df.select(
        F.explode_outer(_tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token").isNotNull())
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("_tot"))
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        head.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_tot"), 6).alias("share"),
            F.round(
                F.sum("cnt").over(wc).cast("double") / F.col("_tot"), 6
            ).alias("cum_share"),
        )
    )


def token_zipf_sql(table: str, text_expr: str = "text", *, top: int = 50) -> str:
    """DuckDB twin of :func:`token_zipf` — identical tokenizer, tie-break,
    and share rounding."""
    toks = (
        f"list_filter(string_split_regex(lower(trim({text_expr})), "
        f"'[^a-zA-Z0-9'']+'), x -> x <> '')"
    )
    return f"""
        WITH tz_tok AS (
            SELECT tzu.token
            FROM {table}, UNNEST({toks}) AS tzu(token)
            WHERE tzu.token IS NOT NULL AND tzu.token <> ''
        ),
        tz_cnt AS (
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM tz_tok GROUP BY token
        ),
        tz_tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS _tot FROM tz_cnt),
        tz_head AS (
            SELECT * FROM tz_cnt ORDER BY cnt DESC, token LIMIT {top}
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
               token, cnt,
               round(cnt::DOUBLE / _tot, 6) AS share,
               round(SUM(cnt) OVER (ORDER BY cnt DESC, token
                     ROWS UNBOUNDED PRECEDING)::DOUBLE / _tot, 6) AS cum_share
        FROM tz_head CROSS JOIN tz_tot
    """
