"""Winnowing document fingerprints (MOSS-style) and shared-fingerprint
candidate pairs.

Schleimer/Wilkerson/Aiken winnowing: hash every k-gram of the normalized
text, slide a window of `w` consecutive k-gram hashes, keep the minimum of
each window, dedupe. The selected set is position-independent (any match
at least w+k-1 chars long is guaranteed to share a fingerprint), so two
documents sharing enough fingerprints are near-duplicate / containment
candidates — the classic plagiarism-detection primitive, and the missing
middle ground between whole-doc hashing (textanalysis.fingerprint) and
MinHash (dedup.minhash_candidates): winnowing detects *local* overlap
(a copied paragraph), not just global set similarity.

Spark-first shape: the per-document fingerprint set is built from
higher-order array functions (sequence → transform → slice/array_min →
array_distinct) — pure JVM expressions, no UDF, no shuffle. The k-gram
hash array is staged as a REAL COLUMN between the two transform steps:
referencing it as one inline expression would make every window's
array_min(slice(...)) re-evaluate the whole O(n) md5 chain (O(n²·k) work
per row — measured as a hang, not a slowdown); a column reference is
evaluated once per row, and CollapseProject will not inline a non-cheap
expression used more than once. Pair generation shuffles once on the
fingerprint value with the same guardrails as the LSH families (singleton
drop + hot-bucket cap), then once on the (id_l, id_r) pair for the shared
count. At 100 TB the fingerprint density is ~2/(w+1) per character, so
`w` directly dials the shuffle volume.

Hashes are md5-prefix based (dedup._hash64 discipline) so DuckDB computes
identical values for the correctness oracle; the oracle SQL stages the
k-gram array in a CTE for the same reason the Spark side stages a column.

Reference parity: the reference engine has no winnowing; this is part of
the training-data-pipeline extension set (document fingerprinting /
near-dup detection over the documents table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(c: Column) -> Column:
    """Whitespace-collapsed lowercase text (same normalization as
    textanalysis.fingerprint so the two fingerprint families agree on
    what "the document" is)."""
    return F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")


def _norm_sql(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    out_col: str = "fps",
    *,
    k: int = 12,
    w: int = 10,
    spread: bool | None = None,
) -> DataFrame:
    """Adds `out_col` array<long>: the winnowed fingerprint set of
    `text_col`. Two staged projections, no shuffle.

    Documents with fewer than w k-grams yield the min of whatever k-grams
    exist; documents shorter than k chars yield an empty array. The
    guards are load-bearing: Spark's sequence(1, n) DESCENDS when n < 1.

    Parallelism: byte-based file splitting underestimates this stage — the
    k-gram hash chain is O(chars) md5 work per row, so a byte-small scan
    (one split) serializes a CPU-bound projection onto one core. When the
    input has fewer partitions than the cluster's default parallelism, the
    rows are spread first; at real scale (partitions >> cores) the check
    is a no-op and adds no shuffle.

    spread: True forces the spread repartition, False skips it, None
    (default) auto-detects by comparing the input's partition count to
    defaultParallelism. The auto path reads the partition count off the
    DataFrame's RDD lineage (driver-side metadata only — no job); callers
    on a query path that must stay pure-DataFrame can pass an explicit
    bool to avoid the RDD conversion entirely.
    """
    if spread is None:
        spread = df.rdd.getNumPartitions() < df.sparkSession.sparkContext.defaultParallelism
    if spread:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # the normalized text is staged as a column BEFORE the k-gram
    # transform: inlined, the regexp_replace would re-evaluate once per
    # k-gram inside the lambda (O(n²) character work per row — measured
    # 24 s vs 2 s on the sf0.1 bench corpus)
    staged = df.withColumn("_wn_t", _norm(F.col(text_col)))
    t = F.col("_wn_t")
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
    staged = staged.withColumn("_wn_kh", kh).drop("_wn_t")
    khc = F.col("_wn_kh")
    n_windows = F.size(khc) - F.lit(w) + 1
    wins = (
        F.when(
            n_windows >= 1,
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda j: F.array_min(F.slice(khc, j, w)),
            ),
        )
        .when(F.size(khc) >= 1, F.array(F.array_min(khc)))
        .otherwise(F.array().cast("array<long>"))
    )
    return staged.withColumn(out_col, F.array_sort(F.array_distinct(wins))).drop(
        "_wn_kh"
    )


def winnow_cte_sql(
    table: str, text_expr: str, id_expr: str, *, k: int = 12, w: int = 10
) -> str:
    """DuckDB CTE chain ending in `wn_fps(id, fps)` — the oracle twin of
    with_winnow_fingerprints (value-identical; staged so the k-gram list
    is computed once per row, mirroring the Spark column staging)."""
    t = _norm_sql(text_expr)
    return f"""
wn_kg AS (
  SELECT {id_expr} AS id,
         list_transform(range(1, greatest(length({t}) - {k} + 2, 1)),
           i -> CAST(('0x' || substring(md5(substring({t}, CAST(i AS INT), {k})), 1, 12)) AS BIGINT)
         ) AS kh
  FROM {table}
),
wn_fps AS (
  SELECT id,
         list_sort(list_distinct(
           CASE WHEN len(kh) >= {w} THEN
             list_transform(range(1, len(kh) - {w} + 2),
               j -> list_min(list_slice(kh, CAST(j AS INT), CAST(j AS INT) + {w - 1})))
           WHEN len(kh) >= 1 THEN [list_min(kh)]
           ELSE CAST([] AS BIGINT[]) END
         )) AS fps
  FROM wn_kg
)"""


def winnow_profile(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 12, w: int = 10
) -> DataFrame:
    """Per-document fingerprint summary: (id, n_fps, fp_checksum).

    The checksum is the exact integer sum of the (distinct) selected
    fingerprints — one row per document that still pins every selected
    hash value, so the oracle catches any divergence in the k-gram
    hashing, window selection, or dedup without materializing the full
    exploded set.
    """
    fp = with_winnow_fingerprints(
        df.select(F.col(id_col).alias("id"), text_col), text_col, "fps", k=k, w=w
    )
    return fp.select(
        "id",
        F.size("fps").alias("n_fps"),
        F.aggregate("fps", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fp_checksum"
        ),
    )


def winnow_shared_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 12,
    w: int = 10,
    min_shared: int = 3,
    max_bucket: int | None = 64,
    cache_handle: list | None = None,
) -> DataFrame:
    """Candidate pairs sharing >= min_shared winnowed fingerprints:
    (id_l, id_r, shared) with id_l < id_r.

    Plan: explode the per-doc fingerprint arrays (map-side), drop
    singleton fingerprints and cap degenerate ones (a fingerprint present
    in b docs yields b*(b-1)/2 pairs — boilerplate headers/licenses at
    100 TB scale are exactly such hot values), self-join on the
    fingerprint value, then count shared fingerprints per pair. Two
    shuffles total: one on fp, one on the pair key.

    The exploded fingerprint frame feeds the kept-bucket count AND both
    join sides — pass `cache_handle` (see dedup.lsh_cache) to persist it
    once instead of recomputing the md5 chain three times.
    """
    fp = with_winnow_fingerprints(
        df.select(F.col(id_col).alias("id"), text_col), text_col, "fps", k=k, w=w
    )
    # explode_OUTER, then drop the null rows: a plain explode makes
    # InferFiltersFromGenerate synthesize a `size(fps) > 0` filter that is
    # pushed below the staged projections, re-inlining the whole k-gram
    # expression into the window transform — the O(n²)-per-row recompute
    # the column staging exists to prevent.
    fps = fp.select("id", F.explode_outer("fps").alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    if cache_handle is not None:
        fps = fps.persist()
        cache_handle.append(fps)
    kept = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") > 1)
    if max_bucket:
        kept = kept.filter(F.col("_n") <= max_bucket)
    fps = fps.join(kept.select("fp"), "fp")
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_l"), F.col("b.id").alias("id_r"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    return pairs.filter(F.col("shared") >= min_shared)


def group_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    *,
    k: int = 12,
    w: int = 10,
    min_shared: int = 3,
    max_df: int | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Corpus-level (repo-level) containment: which GROUPS of documents —
    repositories, in the north star's source-code table — share winnowed
    content: (group_l, group_r, shared, containment) where containment =
    shared / min(n_fps of either group).

    This is fork / vendored-copy detection: a repo that vendors another's
    tree shares most of the smaller repo's fingerprints even when no file
    is byte-identical (so sha-equality joins find nothing), and the
    asymmetric containment scores the vendored-into case near 1.0
    regardless of the host repo's size — the repo-granular analogue of
    :func:`winnow_containment_pairs`.

    Plan: winnow per document (the same staged map-side chain), explode,
    then collapse to DISTINCT (group, fp) — the frame the rest of the
    operator touches is bounded by Σ_g |fingerprint set of g|, typically
    orders of magnitude below the document-level explode.  ``max_df``
    drops fingerprints present in more than that many groups before the
    self-join (ecosystem boilerplate — license headers, generated
    scaffolding — is exactly a high-document-frequency fingerprint, the
    same prune tfidf_sim applies to stopword tokens); it also bounds the
    join fan-out at max_df² per fingerprint.  Two shuffles after the
    distinct: one on fp for the self-join, one on the group pair.

    The distinct (group, fp) frame feeds the group sizes AND both join
    sides — pass ``cache_handle`` to persist it once.
    """
    fp = with_winnow_fingerprints(
        df.select(F.col(group_col).alias("grp"), text_col), text_col, "fps", k=k, w=w
    )
    # see winnow_shared_pairs for the explode_outer rationale
    gfp = (
        fp.select("grp", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .distinct()
    )
    if cache_handle is not None:
        gfp = gfp.persist()
        cache_handle.append(gfp)
    sizes = gfp.groupBy("grp").agg(F.count(F.lit(1)).alias("n_fps"))
    if max_df is not None:
        rare = (
            gfp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("fp")
        )
        gfp = gfp.join(rare, "fp")
    pairs = (
        gfp.alias("a")
        .join(gfp.alias("b"), "fp")
        .filter(F.col("a.grp") < F.col("b.grp"))
        .groupBy(F.col("a.grp").alias("group_l"), F.col("b.grp").alias("group_r"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    # denominators are the FULL per-group fingerprint set sizes (pre-max_df),
    # so containment stays a fraction of real content, not of the pruned set
    return (
        pairs.join(
            sizes.select(F.col("grp").alias("group_l"), F.col("n_fps").alias("_n_l")),
            "group_l",
        )
        .join(
            sizes.select(F.col("grp").alias("group_r"), F.col("n_fps").alias("_n_r")),
            "group_r",
        )
        .select(
            "group_l",
            "group_r",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.least("_n_l", "_n_r").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def group_containment_sql(
    table: str,
    text_expr: str,
    group_expr: str,
    *,
    k: int = 12,
    w: int = 10,
    min_shared: int = 3,
    max_df: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`group_containment_pairs`."""
    df_filter = (
        f""", rare AS (
            SELECT fp FROM gfp GROUP BY fp HAVING count(*) <= {max_df}
        ), gkept AS (SELECT g.* FROM gfp g JOIN rare USING (fp))"""
        if max_df is not None
        else ", gkept AS (SELECT * FROM gfp)"
    )
    return f"""
        WITH {winnow_cte_sql(table, text_expr, group_expr, k=k, w=w)},
        gfp AS (
            SELECT DISTINCT id AS grp, unnest(fps) AS fp FROM wn_fps
        ),
        sizes AS (SELECT grp, count(*) AS n_fps FROM gfp GROUP BY grp)
        {df_filter},
        pairs AS (
            SELECT a.grp AS group_l, b.grp AS group_r,
                   CAST(count(*) AS BIGINT) AS shared
            FROM gkept a JOIN gkept b ON a.fp = b.fp AND a.grp < b.grp
            GROUP BY a.grp, b.grp
            HAVING count(*) >= {min_shared}
        )
        SELECT p.group_l, p.group_r, p.shared,
               round(CAST(p.shared AS DOUBLE)
                     / CAST(least(sl.n_fps, sr.n_fps) AS DOUBLE), 6)
                   AS containment
        FROM pairs p
        JOIN sizes sl ON sl.grp = p.group_l
        JOIN sizes sr ON sr.grp = p.group_r
    """


def winnow_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 12,
    w: int = 10,
    min_shared: int = 3,
    max_bucket: int | None = 64,
    cache_handle: list | None = None,
) -> DataFrame:
    """winnow_shared_pairs + CONTAINMENT normalization:
    (id_l, id_r, shared, containment) where containment =
    shared / min(n_fps_l, n_fps_r).

    A paragraph copied into a much larger file shares only a small
    fraction of the big file's fingerprints, so symmetric Jaccard-style
    scores bury it; dividing by the SMALLER document's fingerprint count
    (the asymmetric containment MOSS ranks by) scores the copied-into
    case near 1.0 regardless of the host file's size.

    Denominators are the full per-document winnowed set sizes; the
    numerator inherits winnow_shared_pairs' scale guards (singleton drop,
    hot-bucket cap), which can undercount `shared` for boilerplate
    fingerprints — the identical guards run in the oracle SQL, so the
    value is deterministic cross-engine. Containment is rounded to 6dp
    (one float divide on exact integers, same 6dp discipline as every
    float column the driver compares).

    Plan: the per-doc fingerprint count rides the exploded frame as a
    map-side column (no extra join against a profile table); otherwise
    identical shape to winnow_shared_pairs — two shuffles total.
    """
    fp = with_winnow_fingerprints(
        df.select(F.col(id_col).alias("id"), text_col), text_col, "fps", k=k, w=w
    )
    # see winnow_shared_pairs for the explode_outer rationale
    fps = (
        fp.select("id", F.size("fps").alias("n_fps"), F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    if cache_handle is not None:
        fps = fps.persist()
        cache_handle.append(fps)
    kept = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") > 1)
    if max_bucket:
        kept = kept.filter(F.col("_n") <= max_bucket)
    fps = fps.join(kept.select("fp"), "fp")
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_l"), F.col("b.id").alias("id_r"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared"),
            F.max(F.col("a.n_fps")).alias("_n_l"),
            F.max(F.col("b.n_fps")).alias("_n_r"),
        )
    )
    return (
        pairs.filter(F.col("shared") >= min_shared)
        .select(
            "id_l",
            "id_r",
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.least("_n_l", "_n_r").cast("double"),
                6,
            ).alias("containment"),
        )
    )
