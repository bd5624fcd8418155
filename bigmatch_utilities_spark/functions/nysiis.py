"""NYSIIS-style phonetic encoding (position-indexed variant), dual-dialect.

The second classic census-linkage phonetic key besides Soundex
(functions/phonetic.py): NYSIIS (Taft 1970, the New York State
Identification and Intelligence System code) keeps more vowel/consonant
structure than Soundex and is the name-blocking key BigMatch-lineage
pipelines pair with it. Like the portable Soundex, the encoder is a pure
expression pipeline rendered in two value-identical dialects ('spark' —
JVM codegen via F.expr, no UDF — and 'duckdb' for the correctness
oracle).

Taft's original formulation is a sequential left-to-right scan where
each replacement can consult the partially built key. That is
inherently order-dependent, so this module implements a PRECISELY
SPECIFIED position-indexed variant in which every rule is a function of
the character's neighborhood in the (prefix/suffix-normalized) input
string, followed by a run-collapse — the same indexed-transform
formulation the portable Soundex uses, fully data-parallel and
bit-identical across engines:

  1. uppercase, strip non-letters; empty -> ''.
  2. prefix (first match wins): MAC->MCC, KN->NN, K->C, PH->FF, PF->FF,
     SCH->SSS.
  3. suffix: EE|IE -> Y;  DT|RT|RD|NT|ND -> D.
  4. first key char = first char, kept verbatim.
  5. per position i >= 2 with (prev, cur, next, and 2-away neighbors)
     taken from the NORMALIZED INPUT (not the partial key — the variant
     point):
       EV -> AF (V consumed) | vowel -> A | Q -> G | Z -> S | M -> N |
       KN -> N (K consumed) | SCH -> S (run) | PH -> FF |
       H -> prev when prev or next is not a vowel | W -> prev when prev
       is a vowel | else the character itself.
  6. run-collapse adjacent equal characters of (first || replacements).
  7. trim: trailing S dropped (length permitting), AY -> Y, trailing A
     dropped (length permitting).

Where the variant differs from the sequential original: H/W copy the
*input* predecessor rather than the last key character, and multi-char
replacements collapse with their neighbors. For blocking, what matters
is that misspelling families map to one deterministic key — pinned by
tests — not registry conformance; the variant is stated so the key is
reproducible from this docstring alone.

At 100 TB: map-only derived column, whole-stage codegen, no shuffle —
exactly like the Soundex key feeding the blocking passes
(`/root/reference` blocks on precomputed phonetic name keys; see
repo_linkage.py's config notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VOWELS = "('A','E','I','O','U')"


def _stages(expr: str, dialect: str) -> list[tuple[str, str]]:
    """[(stage_name, stage_sql)] — each stage references the previous by
    name, keeping every expression small (no multiplicative inlining)."""
    d = dialect == "duckdb"
    u = (
        f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
        if d
        else f"regexp_replace(upper({expr}), '[^A-Z]', '')"
    )
    p = (
        "CASE WHEN _ny_u LIKE 'MAC%' THEN 'MCC' || substring(_ny_u, 4) "
        "WHEN _ny_u LIKE 'KN%' THEN 'NN' || substring(_ny_u, 3) "
        "WHEN _ny_u LIKE 'K%' THEN 'C' || substring(_ny_u, 2) "
        "WHEN _ny_u LIKE 'PH%' OR _ny_u LIKE 'PF%' THEN 'FF' || substring(_ny_u, 3) "
        "WHEN _ny_u LIKE 'SCH%' THEN 'SSS' || substring(_ny_u, 4) "
        "ELSE _ny_u END"
    )
    x = (
        "CASE WHEN _ny_p LIKE '%EE' OR _ny_p LIKE '%IE' "
        "THEN substring(_ny_p, 1, length(_ny_p) - 2) || 'Y' "
        "WHEN _ny_p LIKE '%DT' OR _ny_p LIKE '%RT' OR _ny_p LIKE '%RD' "
        "OR _ny_p LIKE '%NT' OR _ny_p LIKE '%ND' "
        "THEN substring(_ny_p, 1, length(_ny_p) - 2) || 'D' "
        "ELSE _ny_p END"
    )
    i = "CAST(i AS INT)" if d else "i"
    cur = f"substring(_ny_x, {i}, 1)"
    prev = f"substring(_ny_x, {i} - 1, 1)"
    nxt = f"substring(_ny_x, {i} + 1, 1)"
    # 2-away lookbehind: position 0 substring semantics differ between
    # engines — guard explicitly
    p2 = f"(CASE WHEN {i} >= 3 THEN substring(_ny_x, {i} - 2, 1) ELSE '' END)"
    n2 = f"substring(_ny_x, {i} + 2, 1)"
    rep = (
        f"CASE "
        f"WHEN {cur} = 'E' AND {nxt} = 'V' THEN 'AF' "
        f"WHEN {cur} = 'V' AND {prev} = 'E' THEN '' "
        f"WHEN {cur} IN {_VOWELS} THEN 'A' "
        f"WHEN {cur} = 'Q' THEN 'G' "
        f"WHEN {cur} = 'Z' THEN 'S' "
        f"WHEN {cur} = 'M' THEN 'N' "
        f"WHEN {cur} = 'K' THEN (CASE WHEN {nxt} = 'N' THEN '' ELSE 'C' END) "
        f"WHEN {cur} = 'S' AND {nxt} = 'C' AND {n2} = 'H' THEN 'S' "
        f"WHEN {cur} = 'C' AND {prev} = 'S' AND {nxt} = 'H' THEN 'S' "
        f"WHEN {cur} = 'H' AND {prev} = 'C' AND {p2} = 'S' THEN 'S' "
        f"WHEN {cur} = 'P' AND {nxt} = 'H' THEN 'F' "
        f"WHEN {cur} = 'H' AND {prev} = 'P' THEN 'F' "
        f"WHEN {cur} = 'H' AND ({prev} NOT IN {_VOWELS} "
        f"OR {nxt} NOT IN {_VOWELS}) THEN {prev} "
        f"WHEN {cur} = 'W' AND {prev} IN {_VOWELS} THEN {prev} "
        f"ELSE {cur} END"
    )
    if d:
        # array_to_string of an EMPTY list is NULL in DuckDB — coalesce
        body = (
            "substring(_ny_x, 1, 1) || COALESCE(array_to_string("
            f"list_transform(range(2, length(_ny_x) + 1), i -> {rep}), ''), '')"
        )
    else:
        body = (
            "substring(_ny_x, 1, 1) || (CASE WHEN length(_ny_x) < 2 THEN '' "
            f"ELSE array_join(transform(sequence(2, length(_ny_x)), i -> {rep}), '') END)"
        )
    keep = (
        f"CASE WHEN {i} = 1 OR substring(_ny_b, {i}, 1) <> "
        f"substring(_ny_b, {i} - 1, 1) THEN substring(_ny_b, {i}, 1) "
        f"ELSE '' END"
    )
    if d:
        coll = (
            "COALESCE(array_to_string(list_transform("
            f"range(1, length(_ny_b) + 1), i -> {keep}), ''), '')"
        )
    else:
        coll = (
            "CASE WHEN length(_ny_b) = 0 THEN '' ELSE "
            f"array_join(transform(sequence(1, length(_ny_b)), i -> {keep}), '') END"
        )
    t = (
        "CASE WHEN length(_ny_c) > 1 AND _ny_c LIKE '%S' "
        "THEN substring(_ny_c, 1, length(_ny_c) - 1) ELSE _ny_c END"
    )
    t2 = (
        "CASE WHEN _ny_t LIKE '%AY' "
        "THEN substring(_ny_t, 1, length(_ny_t) - 2) || 'Y' ELSE _ny_t END"
    )
    out = (
        "CASE WHEN length(_ny_u) = 0 THEN '' "
        "WHEN length(_ny_t2) > 1 AND _ny_t2 LIKE '%A' "
        "THEN substring(_ny_t2, 1, length(_ny_t2) - 1) ELSE _ny_t2 END"
    )
    return [
        ("_ny_u", u),
        ("_ny_p", p),
        ("_ny_x", x),
        ("_ny_b", body),
        ("_ny_c", coll),
        ("_ny_t", t),
        ("_ny_t2", t2),
        ("_ny_out", out),
    ]


def with_nysiis(
    df: DataFrame, col: str, out_col: str = "nysiis", max_len: int | None = None
) -> DataFrame:
    """Attach the NYSIIS key of ``col`` as ``out_col``. Pure codegen
    expression chain (stage columns, dropped before return) — map-only.

    The returned key sits behind an ``explode_outer(array(...))``
    Generate node (the winnow.py defense): without it, a downstream
    filter or join predicate on the key is pushed down THROUGH the eight
    stage projections, and each substitution multiplies the condition by
    that stage's reference count — the optimizer itself hangs on the
    exponential expression tree (measured as a hang in candidate_pairs'
    blank-key filter, not a slowdown). The Generate is one no-op row
    expansion per row; filters on the key stay above it."""
    stage_names = [n for n, _ in _stages(col, "spark")]
    for name, sql in _stages(col, "spark"):
        df = df.withColumn(name, F.expr(sql))
    key = F.col("_ny_out")
    if max_len is not None:
        key = F.substring(key, 1, max_len)
    keep = [c for c in df.columns if c not in stage_names]
    return df.select(
        *keep, F.explode_outer(F.array(key)).alias(out_col)
    )


def nysiis_sql(
    table: str,
    expr: str,
    *,
    out_col: str = "nysiis",
    carry: str = "*",
    max_len: int | None = None,
) -> str:
    """DuckDB twin: nested subqueries materializing the same stages, so
    the expression text stays linear in stage count. ``carry`` is the
    projection carried through (default all input columns)."""
    stages = _stages(expr, "duckdb")
    inner = f"SELECT {carry}, {stages[0][1]} AS _ny_u FROM {table}"
    for name, sql in stages[1:]:
        inner = f"SELECT *, {sql} AS {name} FROM ({inner})"
    key = "_ny_out" if max_len is None else f"substring(_ny_out, 1, {max_len})"
    outer_carry = (
        f"* EXCLUDE ({', '.join(n for n, _ in stages)})"
        if carry == "*"
        else carry
    )
    return f"SELECT {outer_carry}, {key} AS {out_col} FROM ({inner})"
