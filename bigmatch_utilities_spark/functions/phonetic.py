"""Phonetic encodings for blocking keys: a portable Soundex.

BigMatch-lineage record linkage blocks heavily on phonetic name keys (the
reference's pipelines feed precomputed soundex keys into the blocking
passes — see repo_linkage.py's config notes). Spark ships F.soundex, but
the correctness oracle runs in DuckDB, which has no soundex — so this
module renders the standard US-census Soundex as ONE expression template
with two dialects ('spark' / 'duckdb') that produce value-identical
results. The Spark side stays a JVM codegen expression (no UDF).

Algorithm (classic T-SQL-compatible Soundex):
  1. strip non-letters, uppercase; empty input → empty code
  2. keep the first letter verbatim
  3. drop H and W from position 2 on (they are "transparent": same-coded
     letters separated by H/W collapse, separated by a vowel they don't)
  4. map letters to digit codes (BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5,
     R→6, vowels→0), INCLUDING the first letter
  5. collapse adjacent equal codes (this is why the first letter's code is
     kept until now: PFISTER → P236, not P123)
  6. drop the first code slot, remove zeros, pad with zeros to 3 digits

The run-collapse in step 5 needs a backreference-free formulation (DuckDB
regexp is RE2): it is expressed as an indexed transform over character
positions — keep position i iff i == 1 or char(i) != char(i-1) — which
both engines run as vectorized array expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CODES = "01230120022455012623010202"  # A..Z
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def soundex_sql(expr: str, dialect: str = "duckdb") -> str:
    """Render Soundex of `expr` for the given dialect. The two renderings
    are value-identical (pinned by tests against Spark's own F.soundex on
    a generated vocabulary)."""
    if dialect == "duckdb":
        u = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    else:
        u = f"regexp_replace(upper({expr}), '[^A-Z]', '')"
    first = f"substring({u}, 1, 1)"
    # H/W transparent from position 2 on; first letter always survives
    if dialect == "duckdb":
        body = f"({first} || regexp_replace(substring({u}, 2), '[HW]', '', 'g'))"
    else:
        body = f"({first} || regexp_replace(substring({u}, 2), '[HW]', ''))"
    codes = f"translate({body}, '{_ALPHA}', '{_CODES}')"
    pos_i = "CAST(i AS INT)" if dialect == "duckdb" else "i"
    keep = (
        f"CASE WHEN {pos_i} = 1 OR substring({codes}, {pos_i}, 1) <> "
        f"substring({codes}, {pos_i} - 1, 1) THEN substring({codes}, {pos_i}, 1) "
        f"ELSE '' END"
    )
    if dialect == "duckdb":
        collapsed = (
            f"array_to_string(list_transform(range(1, length({codes}) + 1), "
            f"i -> {keep}), '')"
        )
    else:
        # sequence(1, 0) DESCENDS in Spark — guard the empty string
        collapsed = (
            f"CASE WHEN length({codes}) = 0 THEN '' ELSE "
            f"array_join(transform(sequence(1, length({codes})), i -> {keep}), '') END"
        )
    tail = f"replace(substring({collapsed}, 2), '0', '')"
    return (
        f"CASE WHEN length({u}) = 0 THEN '' "
        f"ELSE ({first} || substring({tail} || '000', 1, 3)) END"
    )


def soundex(col_name: str) -> Column:
    """Soundex as a Spark Column (codegen expression, oracle-portable).

    Prefer this over F.soundex when the result must be oracle-checkable;
    tests pin equality with F.soundex on alphabetic inputs.
    """
    return F.expr(soundex_sql(col_name, dialect="spark"))
