"""Deterministic HyperLogLog cardinality sketch with an exact cross-engine
oracle.

Profiling a 100 TB table starts with "how many distinct values does each
column hold" — exact countDistinct shuffles every value; the standard
answer is HyperLogLog (Flajolet et al. 2007). Spark's built-in
`approx_count_distinct` and DuckDB's `approx_count_distinct` use
different hash functions and register layouts, so they can never agree
bit-for-bit — useless under this repo's oracle contract. This module
implements HLL from scratch on the md5-prefix hash discipline shared
with operators/dedup.py, so Spark and DuckDB compute IDENTICAL registers
and IDENTICAL estimates:

* h        = first 60 bits of md5(value)  (BIGINT, same literal SQL)
* bucket   = h & (m-1),   m = 2^p buckets
* w        = h >> p  over R = 60-p usable bits
* rho      = R - bit_length(w) + 1  (bit_length via length(bin(w)) —
             integer string ops, no log2 float)
* register = max(rho) per bucket — a map-side-combined groupBy
* Σ 2^-M_j is summed as INTEGERS: Σ 2^(R+1-M_j) via shiftleft, in
  DECIMAL(38,0) / HUGEINT (exact up to 2^66), so the float division
  happens ONCE on identical operands.

The raw estimator E = alpha_m · m² / Σ2^-M is used WITHOUT the
small-range ln() correction — ln is only ~1-ulp reproducible across
JVM/libm and would re-open the float-parity hole (see the tfidf ADVICE
note); the documented cost is the raw estimator's known positive bias
below ~2.5·m distinct values. Choose p so the expected cardinality is
well above 2.5·2^p, or read `zero_buckets` (reported) to see when the
correction would have applied.

Scale: one map-only projection (hash/bucket/rho), one groupBy(bucket)
over ≤ 2^p groups (map-side combined — the shuffle moves at most
m rows per map task, not the data), one ≤ 2^p-row aggregate. This is
the textbook mergeable-sketch shape: per-partition register vectors
combine by element-wise max.

Reference parity: the reference has no profiling sketches at all; this
extends the training-data/profiling set (MinHash, SimHash, Bloom/CLK
already in-tree; HLL completes the classic trio).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: alpha_m for m >= 128 (Flajolet et al. 2007, Fig. 3)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    col: str,
    *,
    p: int = 12,
) -> DataFrame:
    """One-row estimate of the number of distinct non-null values of
    `col`: (column, m, zero_buckets, est).

    est is rounded to 4dp (it is a float ratio of exact integers — both
    engines divide identical operands, so the rounding is midpoint-safe).
    """
    if not (4 <= p <= 16):
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    R = 60 - p
    alpha = _alpha(m)
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    vals = df.filter(F.col(col).isNotNull()).select(
        (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright(h, p).alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(R + 1))
        .otherwise(F.lit(R) - F.length(F.bin(F.col("w"))) + 1)
        .cast("int")
    )
    regs = vals.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("M")
    )
    # Σ 2^-M over ALL m buckets = (Σ_present 2^(R+1-M) + absent·2^(R+1))
    # / 2^(R+1); the integer numerator is ≤ m·2^(R+1) = 2^61 — exact in
    # BIGINT on both engines, ONE float division on identical operands
    # SQL form: the Python F.shiftleft only takes a literal bit count
    term = F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {R + 1} - M) AS BIGINT)")
    agg = regs.agg(
        F.sum(term).cast("long").alias("_s"),
        F.count("*").cast("long").alias("_nb"),
    )
    denom_scale = float(1 << (R + 1))
    return agg.select(
        F.lit(col).alias("column"),
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_nb")).cast("long").alias("zero_buckets"),
        F.round(
            F.lit(alpha * m * m)
            / (
                (
                    F.col("_s")
                    + (F.lit(m).cast("long") - F.col("_nb"))
                    * F.lit(1 << (R + 1)).cast("long")
                ).cast("double")
                / F.lit(denom_scale)
            ),
            4,
        ).alias("est"),
    )


def hll_distinct_sql(table: str, col_expr: str, col_name: str, *, p: int = 12) -> str:
    """DuckDB twin of :func:`hll_distinct` — identical hash, registers,
    integer sum, and single float division."""
    if not (4 <= p <= 16):
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    R = 60 - p
    alpha = _alpha(m)
    h = f"CAST(('0x' || substring(md5(CAST({col_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
        WITH hll_v AS (
            SELECT {h} & {m - 1} AS bucket,
                   {h} >> {p} AS w
            FROM {table} WHERE {col_expr} IS NOT NULL
        ),
        hll_r AS (
            SELECT bucket,
                   MAX(CASE WHEN w = 0 THEN {R + 1}
                            ELSE {R} - length(bin(w)) + 1 END) AS M
            FROM hll_v GROUP BY bucket
        ),
        hll_a AS (
            SELECT CAST(SUM(CAST(1 AS BIGINT) << ({R + 1} - M)) AS HUGEINT) AS _s,
                   CAST(COUNT(*) AS BIGINT) AS _nb
            FROM hll_r
        )
        SELECT '{col_name}' AS "column",
               CAST({m} AS BIGINT) AS m,
               CAST({m} - _nb AS BIGINT) AS zero_buckets,
               round({alpha * m * m!r}
                     / ((_s + ({m}::HUGEINT - _nb) * ({1 << (R + 1)}::HUGEINT))::DOUBLE
                        / {float(1 << (R + 1))!r}), 4) AS est
        FROM hll_a
    """
