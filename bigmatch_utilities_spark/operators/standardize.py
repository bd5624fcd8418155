"""Pre-linkage field standardization: case/punctuation/whitespace
normalization plus token-level synonym mapping (nicknames, address
abbreviations, vocabulary canonicalization).

Record-linkage quality is decided before the first comparator runs: BILL
vs WILLIAM never agree however good the Jaro-Winkler kernel is. The
reference pipelines consume pre-standardized fixed-width files (the
standardization happened upstream of BigMatch); this module brings that
step into the engine as two interchangeable plans:

* ``standardize_expr`` — the synonym map is compiled into a CASE chain
  inside one JVM codegen projection. Zero shuffle, zero extra scans;
  right whenever the dictionary fits in the plan (≲ a few thousand
  entries). This is also the oracle-checkable path (exact SQL twin).

* ``standardize_join`` — the dictionary is a DataFrame: posexplode the
  tokens, broadcast-left-join the mapping, reassemble in token order.
  One shuffle (the reassembly groupBy); the dictionary can be millions
  of rows. Use when the mapping is data, not code.

Both paths produce identical output (pinned by test) so the choice is
purely a scale decision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default demonstration map: classic English nickname → canonical pairs
#: plus USPS-style address abbreviations. Real deployments pass their own.
DEFAULT_SYNONYMS = {
    "bill": "william",
    "will": "william",
    "bob": "robert",
    "rob": "robert",
    "dick": "richard",
    "rick": "richard",
    "jim": "james",
    "peggy": "margaret",
    "liz": "elizabeth",
    "beth": "elizabeth",
    "st": "street",
    "ave": "avenue",
    "rd": "road",
    "blvd": "boulevard",
    "apt": "apartment",
}


def _norm_tokens(c: Column) -> Column:
    """lowercase, strip non-alphanumerics to token boundaries, drop empty
    tokens — the shared normalization of both standardization paths."""
    return F.filter(
        F.split(F.lower(F.trim(c)), "[^a-z0-9']+"), lambda x: x != F.lit("")
    )


def _norm_tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower(trim({expr})), '[^a-z0-9'']+'), "
        f"x -> x <> '')"
    )


def standardize_expr(c: Column, synonyms: dict[str, str] | None = None) -> Column:
    """Standardized text as one codegen expression: normalized tokens,
    each mapped through the synonym CASE chain, re-joined with single
    spaces."""
    synonyms = DEFAULT_SYNONYMS if synonyms is None else synonyms

    def map_tok(t: Column) -> Column:
        out = t
        for k, v in synonyms.items():
            out = F.when(t == F.lit(k), F.lit(v)).otherwise(out)
        return out

    return F.array_join(F.transform(_norm_tokens(c), map_tok), " ")


def standardize_expr_sql(expr: str, synonyms: dict[str, str] | None = None) -> str:
    """DuckDB twin of standardize_expr (value-identical)."""
    synonyms = DEFAULT_SYNONYMS if synonyms is None else synonyms
    mapped = "t"
    # reversed so the rendered CASE chain evaluates in the same priority
    # order as the Column when/otherwise nesting above
    for k, v in reversed(list(synonyms.items())):
        mapped = f"CASE WHEN t = '{k}' THEN '{v}' ELSE {mapped} END"
    # coalesce: DuckDB's array_to_string of an empty list is NULL where
    # Spark's array_join is ''
    return (
        f"coalesce(array_to_string(list_transform({_norm_tokens_sql(expr)}, "
        f"t -> {mapped}), ' '), '')"
    )


def standardize_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mapping: DataFrame,
    *,
    out_col: str = "std_text",
) -> DataFrame:
    """Dictionary-as-data standardization: (id, ..., out_col) with every
    normalized token of `text_col` replaced by `mapping.canonical` where
    `mapping.token` matches.

    Plan: posexplode_outer the token array (map-side), broadcast-left-join
    the mapping (map-side — standardization dictionaries are small relative
    to a 100 TB corpus; drop the broadcast() hint if yours is not),
    reassemble with sort_array over (pos, token) structs — ONE shuffle, on
    the row id. Rows with no tokens standardize to ''.
    """
    toks = df.select(
        F.col(id_col).alias("_sx_id"),
        F.posexplode_outer(_norm_tokens(F.col(text_col))).alias("_sx_pos", "_sx_tok"),
    )
    mapped = toks.join(
        F.broadcast(mapping.select(F.col("token").alias("_sx_tok"), "canonical")),
        "_sx_tok",
        "left",
    ).select(
        "_sx_id",
        "_sx_pos",
        F.coalesce("canonical", "_sx_tok").alias("_sx_out"),
    )
    rebuilt = mapped.groupBy("_sx_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_sx_pos").isNotNull(),
                            F.struct(F.col("_sx_pos"), F.col("_sx_out")),
                        )
                    )
                ),
                lambda s: s["_sx_out"],
            ),
            " ",
        ).alias(out_col)
    )
    return df.join(
        rebuilt.withColumnRenamed("_sx_id", id_col), id_col, "left"
    ).fillna({out_col: ""})


def induce_canonical_map(
    df: DataFrame,
    field: str,
    *,
    qgram_n: int = 3,
    ratio: float = 1.0,
    purge_above: int = 1_000,
    min_sim: float = 0.8,
    comparator: str = "e",
) -> DataFrame:
    """Auto-induce a standardization dictionary from the data itself:
    (value, canonical, freq) for every distinct non-blank value of
    ``field``, where ``canonical`` is the most frequent value (ties:
    lexicographically smallest) in the value's similarity cluster.

    The hand-curated nickname/abbreviation maps standardize_expr applies
    have to come from somewhere; at 100 TB nobody eyeballs the long tail
    of spelling variants. This composes the engine's own primitives into
    dictionary INDUCTION: distinct values with frequencies (one groupBy —
    the only frame any later stage touches is ~|distinct values|, not
    |rows|) → q-gram blocking over the VALUES THEMSELVES (each value is
    its own node id; qgram_block_pairs' purge + per-record filter bounds
    the candidate budget) → a similarity gate (``min_sim`` on
    ``comparator``) → connected components (cluster id = min member
    string) → frequency-weighted survivorship. Values whose cluster
    merges nothing map to themselves, so the output is a TOTAL map over
    observed values, directly joinable as standardize_join's dictionary.

    Scale: every stage is bounded by the distinct-value count and the
    blocking caps; closure runs on the similarity edges only. Skewed raw
    frequencies never matter because the first groupBy collapses them.
    """
    from bigmatch_utilities_spark.functions.comparators import similarity
    from bigmatch_utilities_spark.operators.closure import connected_components
    from bigmatch_utilities_spark.operators.meta_blocking import qgram_block_pairs

    vals = (
        df.select(F.col(field).alias("value"))
        .filter(F.col("value").isNotNull() & (F.trim(F.col("value")) != ""))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cands = qgram_block_pairs(
        vals, "value", "value", n=qgram_n, ratio=ratio, purge_above=purge_above
    )
    edges = cands.filter(
        similarity(comparator, F.col("id_l"), F.col("id_r")) >= min_sim
    ).select("id_l", "id_r")
    comp = connected_components(edges, "id_l", "id_r")
    clustered = vals.join(
        comp.select(F.col("id").alias("value"), "cluster_id"), "value", "left"
    ).withColumn("_cl", F.coalesce(F.col("cluster_id"), F.col("value")))
    # survivorship: min(struct(-freq, value)) == (max freq, then smallest
    # value) — one groupBy, no window over the value universe
    winners = clustered.groupBy("_cl").agg(
        F.min(F.struct((-F.col("freq")).alias("nf"), F.col("value").alias("v")))
        .getField("v")
        .alias("canonical")
    )
    return clustered.join(winners, "_cl").select("value", "canonical", "freq")


def induce_canonical_map_sql(
    table: str,
    field: str,
    *,
    qgram_n: int = 3,
    ratio: float = 1.0,
    purge_above: int = 1_000,
    min_sim: float = 0.8,
    comparator: str = "e",
) -> str:
    """DuckDB oracle twin of :func:`induce_canonical_map` — the same
    qgram/similarity/closure/survivorship chain with the closure as a
    recursive CTE (exact at oracle scale). Outer CTE names are im_-
    prefixed so the nested generator WITHs cannot collide."""
    from bigmatch_utilities_spark.functions.comparators import similarity_sql
    from bigmatch_utilities_spark.operators.meta_blocking import (
        qgram_block_pairs_sql,
    )

    qg = qgram_block_pairs_sql(
        "im_vals", "value", "value", n=qgram_n, ratio=ratio,
        purge_above=purge_above,
    )
    sim = similarity_sql(comparator, "id_l", "id_r")
    return f"""
        WITH RECURSIVE im_vals AS (
            SELECT {field} AS value, count(*) AS freq
            FROM {table}
            WHERE {field} IS NOT NULL AND trim({field}) <> ''
            GROUP BY {field}
        ),
        im_cand AS ({qg}),
        im_edge AS (
            SELECT id_l, id_r FROM im_cand WHERE {sim} >= {min_sim}
        ),
        im_und AS (
            SELECT id_l AS s, id_r AS d FROM im_edge
            UNION SELECT id_r AS s, id_l AS d FROM im_edge
        ),
        im_nodes AS (SELECT DISTINCT s AS n FROM im_und),
        im_reach(n, m) AS (
            SELECT n, n FROM im_nodes
            UNION
            SELECT u.d, r.m FROM im_reach r JOIN im_und u ON u.s = r.n
        ),
        im_comp AS (SELECT n AS value, min(m) AS cluster_id FROM im_reach GROUP BY n),
        im_cl AS (
            SELECT v.value, v.freq,
                   coalesce(c.cluster_id, v.value) AS _cl
            FROM im_vals v LEFT JOIN im_comp c ON v.value = c.value
        ),
        im_win AS (
            SELECT _cl, value AS canonical,
                   row_number() OVER (PARTITION BY _cl
                                      ORDER BY freq DESC, value ASC) AS _rk
            FROM im_cl
        )
        SELECT a.value, w.canonical, a.freq
        FROM im_cl a JOIN (SELECT _cl, canonical FROM im_win WHERE _rk = 1) w
          ON a._cl = w._cl
    """
