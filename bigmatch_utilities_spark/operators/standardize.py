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
