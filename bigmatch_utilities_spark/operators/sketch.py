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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — deterministic, mergeable,
# exact cross-engine twin
# ---------------------------------------------------------------------------
#
# The frequency companion to HLL above: d x w counters answer "how often
# does value v occur" with one-sided error (estimate >= truth, over by at
# most eps*N with probability 1-delta at w = e/eps, d = ln(1/delta)).
# At 100 TB the sketch build is ONE map-side-combined groupBy over
# <= d*w groups (the d-fold row expansion happens map-side and combines
# to at most d*w rows per task before the shuffle), and per-partition
# sketches merge by cell-wise SUM — the mergeability that makes it a
# streaming/accumulator structure.
#
# Hash discipline: h_j(v) = first 60 bits of md5(j || ':' || v), cell =
# h_j mod w — the md5-prefix convention shared with hll_distinct and
# operators/dedup.py, so the DuckDB twin computes IDENTICAL cells and
# IDENTICAL counters; estimates match bit-for-bit (pure integers,
# no float anywhere).


def _cms_cell(col, j: int, w: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("int")


def _cms_cell_sql(expr: str, j: int, w: int) -> str:
    h = (
        f"CAST(('0x' || substring(md5('{j}:' || CAST({expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT)"
    )
    return f"CAST({h} % {w} AS INT)"


def countmin_estimates(
    df: DataFrame,
    col: str,
    *,
    d: int = 4,
    w: int = 256,
    top: int = 20,
) -> DataFrame:
    """Heavy-hitter report: (value, n_exact, n_cms, overestimate) for the
    `top` most frequent non-null values of `col` (ties broken by value
    ASC), where n_cms = min_j sketch[j][h_j(value)] is the Count-Min
    estimate. n_cms >= n_exact always (one-sided error); overestimate
    shows the collision cost at the chosen (d, w).

    The exact counts are computed here to *report* sketch error; the
    sketch itself never needs them (at 100 TB you'd keep only the d*w
    counters and query point estimates)."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1, w >= 2")
    vals = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("_v"))
    # d-fold map-side expansion -> groupBy combines to <= d*w rows/task
    cells = vals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_j"), _cms_cell(F.col("_v"), j, w).alias("_c")
                    )
                    for j in range(d)
                ]
            )
        ).alias("_jc")
    ).select("_jc._j", "_jc._c")
    sketch = cells.groupBy("_j", "_c").agg(F.count(F.lit(1)).alias("_n"))

    exact = (
        vals.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("_v").asc())
        .limit(top)
    )
    probes = exact.select(
        "_v",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_j"), _cms_cell(F.col("_v"), j, w).alias("_c")
                    )
                    for j in range(d)
                ]
            )
        ).alias("_jc"),
    ).select("_v", "n_exact", "_jc._j", "_jc._c")
    return (
        probes.join(F.broadcast(sketch), on=["_j", "_c"])
        .groupBy(F.col("_v").alias("value"), "n_exact")
        .agg(F.min("_n").alias("n_cms"))
        .select(
            "value",
            "n_exact",
            "n_cms",
            (F.col("n_cms") - F.col("n_exact")).alias("overestimate"),
        )
    )


def countmin_estimates_sql(
    table: str,
    col_expr: str,
    *,
    d: int = 4,
    w: int = 256,
    top: int = 20,
) -> str:
    """DuckDB twin of countmin_estimates — identical hashes, counters,
    top-N tie-break, and integer estimates."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {j} AS _j, {_cms_cell_sql('_v', j, w)} AS _c, _v FROM cms_vals"
        for j in range(d)
    )
    return f"""
WITH cms_vals AS MATERIALIZED (
  SELECT {col_expr} AS _v FROM {table} WHERE {col_expr} IS NOT NULL
),
cms_cells AS ({cell_rows}),
cms_sketch AS (
  SELECT _j, _c, count(*) AS _n FROM cms_cells GROUP BY _j, _c
),
cms_exact AS (
  SELECT _v, count(*) AS n_exact FROM cms_vals
  GROUP BY _v ORDER BY n_exact DESC, _v ASC LIMIT {top}
),
cms_probe AS (
  SELECT e._v, e.n_exact, s._j, s._n
  FROM cms_exact e, cms_sketch s
  WHERE s._j < {d}
    AND s._c = CASE s._j {" ".join(f"WHEN {j} THEN {_cms_cell_sql('e._v', j, w)}" for j in range(d))} END
)
SELECT _v AS value, n_exact,
       CAST(MIN(_n) AS BIGINT) AS n_cms,
       CAST(MIN(_n) - n_exact AS BIGINT) AS overestimate
FROM cms_probe GROUP BY _v, n_exact
"""
